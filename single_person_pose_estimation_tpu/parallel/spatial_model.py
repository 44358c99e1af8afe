"""High-resolution hourglass forward with spatial (H-axis) parallelism.

The round-1 spatial primitives (parallel/spatial.py: halo-exchange convs,
local pool/upsample) are wired here into a runnable end-to-end model
forward (VERDICT.md Next #8): activations keep their HEIGHT dimension
sharded over a mesh axis while the resolution is high, and re-gather to
replicated below `gather_h` — after 4 pooling levels a sharded map would
hold only a few rows per chip, where halo traffic dominates and chips
under-fill; duplicating the cheap low-res compute on every chip is the
standard SP-CNN design. On the way back up, the decoder re-shards as the
upsampled resolution crosses `gather_h` again.

Consumes the SAME flax variables as models.hourglass.StackedHourglass
(inference mode: running BN statistics folded to affines), so a model
trained at 256x256 can run spatially-sharded at 1024x1024+ where one
chip's HBM could not hold the activations. Equivalence-tested against
the unsharded model at 512^2 on the spoofed 8-device CPU mesh
(tests/test_spatial_model.py).

Reference: no counterpart (the reference is fixed 256x256 single-GPU —
SURVEY.md §2 parallelism table lists SP as the documented extension).
"""

from __future__ import annotations

from functools import partial
from typing import Any, List

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
    bn_affine,
)
from single_person_pose_estimation_tpu.parallel.spatial import (
    conv_spatial,
    maxpool2x2_spatial,
    shard_spatial,
    upsample2x_spatial,
)

_BN_EPS = 1e-3


class _Ops:
    """Op set switching between H-sharded (halo-exchange) and replicated
    execution based on the current global height."""

    def __init__(self, mesh: Mesh, spatial_axis: str, gather_h: int):
        self.mesh = mesh
        self.axis = spatial_axis
        self.gather_h = gather_h

    def sharded(self, x) -> bool:
        return x.shape[1] > self.gather_h

    def constrain(self, x):
        """Keep activations explicitly H-sharded above the threshold,
        replicated below it (the re-gather / re-shard points)."""
        spec = P(None, self.axis, None, None) if self.sharded(x) else P()
        return lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, spec))

    def conv(self, params, x, name, stride=1):
        k = params[name]["kernel"].astype(x.dtype)
        b = params[name]["bias"].astype(x.dtype)
        if k.shape[0] > 1 and self.sharded(x):
            return self.constrain(
                conv_spatial(x, k, b, self.mesh, self.axis, stride=stride))
        y = lax.conv_general_dilated(
            x, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return self.constrain(y)

    def pool(self, x):
        if self.sharded(x):
            out = maxpool2x2_spatial(x, self.mesh, self.axis)
        else:
            out = lax.reduce_window(x, -jnp.inf, lax.max,
                                    (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return self.constrain(out)

    def upsample(self, x):
        if self.sharded(x) and x.shape[1] * 2 > self.gather_h:
            out = upsample2x_spatial(x, self.mesh, self.axis)
        else:
            B, H, W, C = x.shape
            out = jnp.broadcast_to(x[:, :, None, :, None, :],
                                   (B, H, 2, W, 2, C)).reshape(
                                       B, H * 2, W * 2, C)
        return self.constrain(out)


def _bn(params, stats, x, name):
    a, c = bn_affine(params[name]["scale"], params[name]["bias"],
                     stats[name]["mean"], stats[name]["var"], _BN_EPS)
    return x * a.astype(x.dtype) + c.astype(x.dtype)


def _bottleneck(ops, params, stats, x, name, channels):
    if x.shape[-1] == channels:
        skip = x
    else:
        skip = jnp.maximum(ops.conv(params, x, name + "_skip"), 0)
    y = jnp.maximum(ops.conv(params, x, name + "_conv_1x1_1"), 0)
    y = _bn(params, stats, y, name + "_conv_1x1_1_bn")
    y = jnp.maximum(ops.conv(params, y, name + "_conv_3x3_2"), 0)
    y = _bn(params, stats, y, name + "_conv_3x3_2_bn")
    y = jnp.maximum(ops.conv(params, y, name + "_conv_1x1_3"), 0)
    y = _bn(params, stats, y, name + "_conv_1x1_3_bn")
    return skip + y


def spatial_apply(variables: Any, images: jnp.ndarray, mesh: Mesh,
                  spatial_axis: str = "spatial", num_stacks: int = 4,
                  gather_h: int = 64,
                  compute_dtype=jnp.float32) -> List[jnp.ndarray]:
    """Inference forward of the stacked hourglass with H-sharded
    activations. Drop-in for model.apply(variables, images, train=False)
    at resolutions where a single chip cannot hold the maps.

    images: (B, H, W, 3) with H == W, H divisible by 64 and by
    (mesh spatial size * stride alignment). gather_h: global height at or
    below which activations run replicated.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    ops = _Ops(mesh, spatial_axis, gather_h)

    x = images.astype(compute_dtype)
    x = shard_spatial(x, mesh, spatial_axis) if x.shape[1] > gather_h else x

    y = jnp.maximum(ops.conv(params, x, "front_conv_1x1_1", stride=2), 0)
    y = _bn(params, stats, y, "front_conv_1x1_1_bn")
    c = params["front_bottleneck_3_conv_1x1_3"]["kernel"].shape[-1]
    bneck = partial(_bottleneck, ops, params, stats)
    y = bneck(y, "front_bottleneck_1", c // 2)
    y = ops.pool(y)
    y = bneck(y, "front_bottleneck_2", c // 2)
    y = bneck(y, "front_bottleneck_3", c)

    outputs = []
    for i in range(num_stacks):
        name = f"hg{i}"
        f1 = bneck(y, name + "_downsample_f1", c)
        f2 = bneck(ops.pool(f1), name + "_downsample_f2", c)
        f4 = bneck(ops.pool(f2), name + "_downsample_f4", c)
        f8 = bneck(ops.pool(f4), name + "_downsample_f8", c)
        b = ops.pool(f8)
        b = bneck(b, name + "_downsample_f8_1", c)
        b = bneck(b, name + "_downsample_f8_2", c)
        b = bneck(b, name + "_downsample_f8_3", c)
        u = b
        for feat, lvl in ((f8, "f8"), (f4, "f4"), (f2, "f2"), (f1, "f1")):
            d = bneck(feat, f"{name}_upsample_{lvl}_short", c)
            u = d + ops.upsample(u)
            u = bneck(u, f"{name}_upsample_{lvl}_merged", c)

        head = jnp.maximum(ops.conv(params, u, name + "_conv_1x1_1"), 0)
        head = _bn(params, stats, head, name + "_conv_1x1_1_bn")
        zp = ops.conv(params, head, name + "_conv_1x1_predict")
        head_predict = jax.nn.sigmoid(zp.astype(jnp.float32))
        outputs.append(head_predict)
        if i < num_stacks - 1:
            h2 = ops.conv(params, head, name + "_conv_1x1_2")
            hm = ops.conv(params, head_predict.astype(compute_dtype),
                          name + "_conv_1x1_3")
            y = h2 + hm + y
    return outputs
