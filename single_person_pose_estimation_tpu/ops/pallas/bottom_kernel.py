"""Pallas TPU kernel: the hourglass's entire <=8px subtree in ONE launch.

Per stack, the fused inference path (models/fused_inference.py) spends six
kernel launches plus two XLA ops on tensors of at most (B, 8, 8, 256):
    f8 = bneck(x8); b = maxpool(f8)              # 8x8 -> 4x4
    b = bneck(b); b = bneck(b); b = bneck(b)     # bottom block, 4x4
    d = bneck(f8); u = d + upsample2x(b)         # decoder level f8
    u = bneck(u)                                 # merged, 8x8
At this size the work per launch is tiny (a whole (64, 8, 8, 256) block
is 2 MB) and the sequence is launch-latency-bound, not bandwidth-bound —
scripts/bench_bottleneck_levels.py measured a ~0.6 ms floor per
bottleneck in chained execution regardless of backend. This kernel runs
the whole subtree per grid step: six bottlenecks' weights stay resident
in VMEM (~2.5 MB bf16), every intermediate lives and dies in VMEM, and
the only HBM traffic is x8 in / u out.

Inference-only (folded BN affines), identity-skip bottlenecks only —
exactly the six hg{i}_{downsample_f8, downsample_f8_1..3,
upsample_f8_short, upsample_f8_merged} bottlenecks (reference
hourglass.py:127-157). Equality-tested in tests/test_fused_inference.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Bottleneck order inside the packed weight tables.
BNECK_ORDER = ("downsample_f8", "downsample_f8_1", "downsample_f8_2",
               "downsample_f8_3", "upsample_f8_short", "upsample_f8_merged")


def _make_kernel(N, H, Cin, Cmid):
    """H is the top spatial size (8); the bottom runs at H//2. ab rows
    per bneck i: [b1|b2|b3|a1|c1|a2|c2|a3|c3] as (6, 9, max(Cin, Cmid))."""

    def bneck(v, i, w1_ref, w2_ref, w3_ref, ab_ref, h):
        """v: (N, h, h, Cin) -> same; folded-BN identity-skip bottleneck."""
        dt = v.dtype
        r = N * h * h
        vf = v.reshape(r, Cin)
        z1 = jnp.dot(vf, w1_ref[i],
                     preferred_element_type=jnp.float32) + ab_ref[i, 0:1, :Cmid]
        t1 = (jnp.maximum(z1, 0.0) * ab_ref[i, 3:4, :Cmid]
              + ab_ref[i, 4:5, :Cmid]).astype(dt).reshape(N, h, h, Cmid)
        t1p = jnp.pad(t1, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((r, Cmid), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = t1p[:, dy:dy + h, dx:dx + h, :].reshape(r, Cmid)
                acc = acc + jnp.dot(sl, w2_ref[i, dy, dx],
                                    preferred_element_type=jnp.float32)
        t2 = (jnp.maximum(acc + ab_ref[i, 1:2, :Cmid], 0.0)
              * ab_ref[i, 5:6, :Cmid] + ab_ref[i, 6:7, :Cmid]).astype(dt)
        z3 = jnp.dot(t2, w3_ref[i],
                     preferred_element_type=jnp.float32) + ab_ref[i, 2:3, :Cin]
        t3 = (jnp.maximum(z3, 0.0) * ab_ref[i, 7:8, :Cin]
              + ab_ref[i, 8:9, :Cin])
        out = vf.astype(jnp.float32) + t3
        return out.astype(dt).reshape(N, h, h, Cin)

    def kernel(x_ref, w1_ref, w2_ref, w3_ref, ab_ref, out_ref):
        x = x_ref[...]                                   # (N, H, H, Cin)
        args = (w1_ref, w2_ref, w3_ref, ab_ref)
        f8 = bneck(x, 0, *args, H)
        # 2x2/s2 maxpool via reshape-splits (minor dim untouched).
        p = jnp.max(f8.reshape(N, H // 2, 2, H, Cin), axis=2)
        b = jnp.max(p.reshape(N, H // 2, H // 2, 2, Cin), axis=3)
        b = bneck(b, 1, *args, H // 2)
        b = bneck(b, 2, *args, H // 2)
        b = bneck(b, 3, *args, H // 2)
        d = bneck(f8, 4, *args, H)
        # Nearest-neighbor 2x upsample + add, all in VMEM.
        up = jnp.broadcast_to(
            b[:, :, None, :, None, :],
            (N, H // 2, 2, H // 2, 2, Cin)).reshape(N, H, H, Cin)
        u = d + up
        out_ref[...] = bneck(u, 5, *args, H)

    return kernel


@partial(jax.jit, static_argnames=("interpret", "nimg"))
def fused_bottom(x, w1s, w2s, w3s, ab, interpret: bool = False,
                 nimg: int = 0):
    """x: (B, 8, 8, C). w1s (6, C, Cm), w2s (6, 3, 3, Cm, Cm),
    w3s (6, Cm, C), ab (6, 9, max(C, Cm)) f32 packed
    [b1|b2|b3|a1|c1|a2|c2|a3|c3]. Returns the decoder's 8x8 output u."""
    B, H, _, Cin = x.shape
    Cmid = w1s.shape[-1]
    dt = x.dtype
    N = nimg or min(B, max(1, 4096 // (H * H)))
    while B % N:
        N -= 1
    kernel = _make_kernel(N, H, Cin, Cmid)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // N,),
        in_specs=[
            pl.BlockSpec((N, H, H, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec((N, H, H, Cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, H, Cin), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, w1s.astype(dt), w2s.astype(dt), w3s.astype(dt),
      ab.astype(jnp.float32))


def pack_bottom_params(params, stats, stack_name, bn_affine, eps=1e-3):
    """Pack the six <=8px bottlenecks' weights/affine tables for
    fused_bottom. Returns (w1s, w2s, w3s, ab)."""
    w1s, w2s, w3s, abs_ = [], [], [], []
    for suffix in BNECK_ORDER:
        name = f"{stack_name}_{suffix}"
        p1 = params[name + "_conv_1x1_1"]
        p2 = params[name + "_conv_3x3_2"]
        p3 = params[name + "_conv_1x1_3"]
        w1s.append(p1["kernel"][0, 0])
        w2s.append(p2["kernel"])
        w3s.append(p3["kernel"][0, 0])
        cin = p3["kernel"].shape[-1]
        cmid = p1["kernel"].shape[-1]
        cmax = max(cin, cmid)
        rows = jnp.zeros((9, cmax), jnp.float32)
        rows = rows.at[0, :cmid].set(p1["bias"].astype(jnp.float32))
        rows = rows.at[1, :cmid].set(p2["bias"].astype(jnp.float32))
        rows = rows.at[2, :cin].set(p3["bias"].astype(jnp.float32))
        for j, bn in ((3, "_conv_1x1_1_bn"), (5, "_conv_3x3_2_bn"),
                      (7, "_conv_1x1_3_bn")):
            a, c = bn_affine(params[name + bn]["scale"],
                             params[name + bn]["bias"],
                             stats[name + bn]["mean"],
                             stats[name + bn]["var"], eps)
            cdim = cmid if j != 7 else cin
            rows = rows.at[j, :cdim].set(a.astype(jnp.float32))
            rows = rows.at[j + 1, :cdim].set(c.astype(jnp.float32))
        abs_.append(rows)
    return (jnp.stack(w1s), jnp.stack(w2s), jnp.stack(w3s),
            jnp.stack(abs_))
