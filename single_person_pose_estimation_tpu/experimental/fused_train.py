"""Train-mode forward with hand-fused bottleneck backward passes.

Drop-in for `model.apply(variables, images, train=True,
mutable=["batch_stats"])` on the non-mobile hourglass: same flax variables,
same per-stack heatmaps, same updated running statistics — but every
identity-skip hourglass bottleneck (15 per stack: the bulk of the FLOPs and
the saved-activation traffic) routes through
experimental.bottleneck_grad.make_bottleneck_train, whose custom backward is
the phase-fused form (BN/ReLU chain recomputed from saved activations
instead of materialized; per-channel BN reductions folded into the same
passes as the conv grads). The front module (conv skips), pooling,
upsampling and heads stay on XLA autodiff.

MEASURED RESULT (v5e, S4/256, B=64, bf16; scripts/bench_fused_mixed.py):
this path does NOT beat flax + XLA autodiff and is kept as a documented,
equality-tested experiment:
    flax/XLA autodiff     131 ms   (the default train path)
    fused, jnp backend    136 ms   (115.9 GB vs 113 GB cost-analysis —
                                    XLA re-materializes the recomputed
                                    BN chains, erasing the residual
                                    savings)
    fused, pallas fwd     158 ms
    fused, mixed 8-16     162 ms   (pallas only at the levels where it
                                    wins in ISOLATION — embedded in the
                                    full program the custom-call
                                    boundaries still break XLA's fusion
                                    and pipelining)
Per-level isolation numbers are in scripts/bench_bottleneck_levels.py
(pallas wins H=8/16 fwd+bwd by ~12%, loses H=64 where XLA's native
conv-grad emitters beat shifted-matmul grads). The infrastructure stays:
it is the only place the stacked-hourglass train step has a hand-derived,
bit-verified backward, and the per-level backend dial makes future
kernel improvements a one-line flip.

Numerics: the forward is op-identical to the flax model (convs in
compute_dtype with in-dtype bias add, flax BN fast-variance f32 stats);
equality-tested against model.apply in tests/test_fused_train.py, along
with gradient equality against XLA autodiff at f32.

Used by training.steps.make_train_step(..., model_backend="fused").
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from single_person_pose_estimation_tpu.experimental.bottleneck_grad import (
    _bn_apply,
    _bn_stats,
    make_bottleneck_train,
)

_BN_MOMENTUM = 0.99


def _conv(params, x, name, stride=1):
    k = params[name]["kernel"].astype(x.dtype)
    b = params[name]["bias"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _bn_train(params, x, name, new_stats):
    """Plain-ops train-mode BatchNorm (flax semantics); records the batch
    statistics into new_stats for the running-average update."""
    mu, var = _bn_stats(x)
    new_stats[name] = (mu, var)
    return _bn_apply(x, mu, var,
                     params[name]["scale"].astype(jnp.float32),
                     params[name]["bias"].astype(jnp.float32), x.dtype)


def _bottleneck_xla_train(params, x, name, channels, new_stats):
    """Plain XLA train-mode bottleneck (front module: skips are convs)."""
    if x.shape[-1] == channels:
        skip = x
    else:
        skip = jnp.maximum(_conv(params, x, name + "_skip"), 0)
    y = jnp.maximum(_conv(params, x, name + "_conv_1x1_1"), 0)
    y = _bn_train(params, y, name + "_conv_1x1_1_bn", new_stats)
    y = jnp.maximum(_conv(params, y, name + "_conv_3x3_2"), 0)
    y = _bn_train(params, y, name + "_conv_3x3_2_bn", new_stats)
    y = jnp.maximum(_conv(params, y, name + "_conv_1x1_3"), 0)
    y = _bn_train(params, y, name + "_conv_1x1_3_bn", new_stats)
    return skip + y


def _bottleneck_fused_train(params, x, name, new_stats, select_fn):
    bneck_fn = select_fn(x.shape[1])
    p1 = params[name + "_conv_1x1_1"]
    p2 = params[name + "_conv_3x3_2"]
    p3 = params[name + "_conv_1x1_3"]
    bn1 = params[name + "_conv_1x1_1_bn"]
    bn2 = params[name + "_conv_3x3_2_bn"]
    bn3 = params[name + "_conv_1x1_3_bn"]
    f32 = jnp.float32
    out, stats = bneck_fn(
        x,
        p1["kernel"][0, 0], p1["bias"],
        p2["kernel"], p2["bias"],
        p3["kernel"][0, 0], p3["bias"],
        bn1["scale"].astype(f32), bn1["bias"].astype(f32),
        bn2["scale"].astype(f32), bn2["bias"].astype(f32),
        bn3["scale"].astype(f32), bn3["bias"].astype(f32))
    (new_stats[name + "_conv_1x1_1_bn"],
     new_stats[name + "_conv_3x3_2_bn"],
     new_stats[name + "_conv_1x1_3_bn"]) = (
        (stats[0], stats[1]), (stats[2], stats[3]), (stats[4], stats[5]))
    return out


def _maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _upsample2x(x):
    B, H, W, C = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return y.reshape(B, H * 2, W * 2, C)


@partial(jax.jit, static_argnames=("num_stacks", "compute_dtype",
                                   "bn_momentum", "kernel_backend"))
def fused_train_apply(
    variables: Any,
    images: jnp.ndarray,
    num_stacks: int = 4,
    compute_dtype=jnp.bfloat16,
    bn_momentum: float = _BN_MOMENTUM,
    kernel_backend: str = "auto",
) -> Tuple[List[jnp.ndarray], Dict[str, Any]]:
    """Returns (per-stack heatmaps, new_batch_stats) — the same pair
    `model.apply(..., train=True, mutable=["batch_stats"])` yields (with
    the mutated collection reassembled into the standard tree).

    kernel_backend selects the bottleneck implementation
    (ops/pallas/bottleneck_grad.make_bottleneck_train):
      "jnp" / "pallas" / "pallas_fwd" / "pallas_bwd" — uniform;
      "mixed:<LO>-<HI>" — pallas for levels with LO <= spatial size <= HI,
                     jnp outside the band. Measured per level (v5e, B=64,
                     scripts/bench_bottleneck_levels.py): pallas wins at
                     H=8/16 (~12%, fwd+bwd), ties at H=4/32, and loses at
                     H=64 where XLA's native conv-grad emitters beat the
                     shifted-matmul 3x3 backward;
      "auto"       — "jnp" everywhere: the measured-best fused config
                     (see module docstring; the pallas mixes lose inside
                     the full program)."""
    if kernel_backend == "auto":
        kernel_backend = "jnp"
    if kernel_backend.startswith("mixed:"):
        lo, hi = (int(v) for v in
                  kernel_backend.split(":", 1)[1].split("-"))

        def select_fn(h):
            return make_bottleneck_train(
                "pallas" if lo <= h <= hi else "jnp")
    else:
        def select_fn(h):
            return make_bottleneck_train(kernel_backend)
    params = variables["params"]
    old_stats = variables["batch_stats"]
    new_stats: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    x = images.astype(compute_dtype)

    y = jnp.maximum(_conv(params, x, "front_conv_1x1_1", stride=2), 0)
    y = _bn_train(params, y, "front_conv_1x1_1_bn", new_stats)
    c = params["front_bottleneck_3_conv_1x1_3"]["kernel"].shape[-1]
    y = _bottleneck_xla_train(params, y, "front_bottleneck_1", c // 2,
                              new_stats)
    y = _maxpool(y)
    y = _bottleneck_xla_train(params, y, "front_bottleneck_2", c // 2,
                              new_stats)
    y = _bottleneck_xla_train(params, y, "front_bottleneck_3", c, new_stats)

    bneck = partial(_bottleneck_fused_train, params, new_stats=new_stats,
                    select_fn=select_fn)

    outputs = []
    for i in range(num_stacks):
        name = f"hg{i}"
        f1 = bneck(x=y, name=name + "_downsample_f1")
        f2 = bneck(x=_maxpool(f1), name=name + "_downsample_f2")
        f4 = bneck(x=_maxpool(f2), name=name + "_downsample_f4")
        f8 = bneck(x=_maxpool(f4), name=name + "_downsample_f8")
        b = bneck(x=_maxpool(f8), name=name + "_downsample_f8_1")
        b = bneck(x=b, name=name + "_downsample_f8_2")
        b = bneck(x=b, name=name + "_downsample_f8_3")
        u = b
        for feat, lvl in ((f8, "f8"), (f4, "f4"), (f2, "f2"), (f1, "f1")):
            d = bneck(x=feat, name=f"{name}_upsample_{lvl}_short")
            u = d + _upsample2x(u)
            u = bneck(x=u, name=f"{name}_upsample_{lvl}_merged")

        head = jnp.maximum(_conv(params, u, name + "_conv_1x1_1"), 0)
        head = _bn_train(params, head, name + "_conv_1x1_1_bn", new_stats)
        zp = _conv(params, head, name + "_conv_1x1_predict")
        head_predict = jax.nn.sigmoid(zp.astype(jnp.float32))
        outputs.append(head_predict)
        if i != num_stacks - 1:
            h2 = _conv(params, head, name + "_conv_1x1_2")
            hm = _conv(params, head_predict.astype(compute_dtype),
                       name + "_conv_1x1_3")
            y = h2 + hm + y

    # Running-stat update: ra = m*ra + (1-m)*batch (flax BatchNorm).
    m = bn_momentum
    updated = {}
    for bn_name, old in old_stats.items():
        mu, var = new_stats[bn_name]
        updated[bn_name] = {
            "mean": m * old["mean"] + (1 - m) * mu,
            "var": m * old["var"] + (1 - m) * var,
        }
    return outputs, updated
