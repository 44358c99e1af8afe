"""Pallas TPU kernel: an hourglass SUBTREE (innermost levels) in ONE launch.

Hypothesis this kernel tested: per stack, the fused inference path
(models/fused_inference.py) spends a kernel launch per bottleneck on
tensors where a whole batch-block is a couple of MB, so the innermost
levels might be launch-latency-bound. This kernel runs the whole
innermost subtree per grid step:

    depth=1: f8 level (8x8) + bottom block  = 6 bottlenecks, 1 pool, 1 up
    depth=2: + f4 level (16x16)             = 9 bottlenecks, 2 pools/ups
    depth=3: + f2 level (32x32)             = 12 bottlenecks, 3 pools/ups

All weight sets stay resident in VMEM (bf16, ~0.42 MB per bottleneck at
C=256) and every intermediate lives and dies in VMEM; the only HBM
traffic is the subtree input in / decoder output out.

Inference-only (folded BN affines), identity-skip bottlenecks only —
the hg{i} downsample/bottom/upsample bottlenecks of reference
hourglass.py:127-157. Equality-tested in tests/test_fused_inference.py.

MEASURED RESULT (v5e, S4/256, B=128, on top of the default fused path):
a NON-win, kept as a documented experiment. Interleaved A/B medians:
depth 0 (off) 3079 img/s; depth 1 3059 (-0.7%); depth 2 2981; depth 3
2898. The hypothesis (launch-latency-bound region) was wrong for the
REAL fused path: Mosaic pipelines consecutive small kernels' DMAs and
compute across launches, while one megakernel serializes the whole
subtree per grid step. The ~0.6 ms/bottleneck floor seen in
scripts/bench_bottleneck_levels.py chains comes from the loop-carried
data dependency there, not from launch overhead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Innermost-first level names (relative to the hourglass, not absolute
# resolution): depth d covers _LEVELS[:d].
_LEVELS = ("f8", "f4", "f2", "f1")


def bneck_order(depth: int):
    """Flat bottleneck order for a depth-d subtree — the SAME recursive
    walk the kernel performs, so packed index == execution index."""
    def walk(d):
        if d == 0:
            return ["downsample_f8_1", "downsample_f8_2",
                    "downsample_f8_3"]
        lvl = _LEVELS[d - 1]
        return ([f"downsample_{lvl}"] + walk(d - 1)
                + [f"upsample_{lvl}_short", f"upsample_{lvl}_merged"])
    return walk(depth)


def _make_kernel(N, H_top, Cin, Cmid, depth):
    def bneck(v, i, w1_ref, w2_ref, w3_ref, ab_ref, h):
        """Folded-BN identity-skip bottleneck, (N, h, h, Cin) -> same.
        ab rows per bneck i: [b1|b2|b3|a1|c1|a2|c2|a3|c3]."""
        dt = v.dtype
        r = N * h * h
        vf = v.reshape(r, Cin)
        z1 = jnp.dot(vf, w1_ref[i],
                     preferred_element_type=jnp.float32) + ab_ref[i, 0:1,
                                                                  :Cmid]
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
                     preferred_element_type=jnp.float32) + ab_ref[i, 2:3,
                                                                  :Cin]
        t3 = (jnp.maximum(z3, 0.0) * ab_ref[i, 7:8, :Cin]
              + ab_ref[i, 8:9, :Cin])
        out = vf.astype(jnp.float32) + t3
        return out.astype(dt).reshape(N, h, h, Cin)

    def kernel(x_ref, w1_ref, w2_ref, w3_ref, ab_ref, out_ref):
        args = (w1_ref, w2_ref, w3_ref, ab_ref)
        counter = [0]

        def nxt():
            i = counter[0]
            counter[0] += 1
            return i

        def walk(x, d, h):
            if d == 0:
                for _ in range(3):
                    x = bneck(x, nxt(), *args, h)
                return x
            f = bneck(x, nxt(), *args, h)
            # 2x2/s2 maxpool via reshape-splits (minor dim untouched).
            p = jnp.max(f.reshape(N, h // 2, 2, h, Cin), axis=2)
            p = jnp.max(p.reshape(N, h // 2, h // 2, 2, Cin), axis=3)
            inner = walk(p, d - 1, h // 2)
            dshort = bneck(f, nxt(), *args, h)
            up = jnp.broadcast_to(
                inner[:, :, None, :, None, :],
                (N, h // 2, 2, h // 2, 2, Cin)).reshape(N, h, h, Cin)
            return bneck(dshort + up, nxt(), *args, h)

        out_ref[...] = walk(x_ref[...], depth, H_top)

    return kernel


@partial(jax.jit, static_argnames=("depth", "interpret", "nimg"))
def fused_subtree(x, w1s, w2s, w3s, ab, depth: int = 1,
                  interpret: bool = False, nimg: int = 0):
    """x: (B, H, H, C) — the depth-d subtree's input level. Packed
    weights from pack_subtree_params (nb = 3*depth + 3 bottlenecks):
    w1s (nb, C, Cm), w2s (nb, 3, 3, Cm, Cm), w3s (nb, Cm, C),
    ab (nb, 9, max(C, Cm)) f32. Returns the decoder output at (B, H, H, C)."""
    B, H, _, Cin = x.shape
    Cmid = w1s.shape[-1]
    dt = x.dtype
    N = nimg or min(B, max(1, 4096 // (H * H)))
    while B % N:
        N -= 1
    kernel = _make_kernel(N, H, Cin, Cmid, depth)
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


def pack_subtree_params(params, stats, stack_name, bn_affine, depth: int = 1,
                        eps: float = 1e-3):
    """Pack the subtree bottlenecks' weights/affine tables for
    fused_subtree. Returns (w1s, w2s, w3s, ab)."""
    w1s, w2s, w3s, abs_ = [], [], [], []
    for suffix in bneck_order(depth):
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


# Backwards-compatible aliases for the depth-1 ("<=8px") variant.
BNECK_ORDER = tuple(bneck_order(1))


def fused_bottom(x, w1s, w2s, w3s, ab, interpret: bool = False,
                 nimg: int = 0):
    return fused_subtree(x, w1s, w2s, w3s, ab, depth=1,
                         interpret=interpret, nimg=nimg)


def pack_bottom_params(params, stats, stack_name, bn_affine, eps=1e-3):
    return pack_subtree_params(params, stats, stack_name, bn_affine,
                               depth=1, eps=eps)
