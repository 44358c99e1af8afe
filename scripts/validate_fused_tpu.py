"""On-hardware numerical parity of the compiled fused inference path.

Round-2 verdict (VERDICT.md Missing #2 / Next #1): every fused-kernel
equality test runs interpret=True on CPU, which cannot catch Mosaic
lowering/layout/padding bugs — the exact class CLAUDE.md warns about.
This script runs on the REAL TPU and asserts, with compiled Mosaic code:

  A. per-kernel f32 equality vs the XLA formulation at the exact flagship
     shapes (S4/256 @ 256^2, B=128 batch-blocked + B=1) for every kernel
     the default path launches: bottleneck at each pyramid level,
     pool-fused bottleneck, conv-skip bottleneck, uplevel, head
     (last/not-last). Tolerance 1e-4 — measured headroom is ~1e-5; a
     Mosaic layout/padding bug is O(0.1..1).
  B. full fused_apply vs model.apply at f32 for every flag combination,
     judged against XLA's OWN precision noise floor: on TPU, f32 convs at
     the default matmul precision are computed with bf16 passes, so two
     legitimate f32 programs already diverge through the 4-stack feedback
     (measured: the default-vs-highest-precision gap reaches O(0.1+) on
     random-init sigmoids by stack 3). PASS = fused is within 3x that
     floor (plus 1e-4 slack) per stack.
  C. bf16 (the precision bench.py/BENCH_r02.json measures), on
     CONDITIONED variables — BN running variances lifted so every affine
     damps (the network is contractive): at random init the inter-stack
     feedback is chaotic and ANY two legitimate bf16 programs diverge to
     O(1) by stack 3 (measured: XLA-bf16 sits 0.993 from the f32 truth
     there; even XLA-f32 default-vs-highest differ by 0.98). Conditioned,
     the fused path must track XLA-bf16 to a few 1e-3 per stack AND sit
     no farther from the f32 truth than XLA-bf16 itself. The random-init
     yardstick row (fused <= 1.5x XLA's distance to truth) is kept.
  D. the eval wiring (evaluation.predict.make_predict_decode_fn fused vs
     flax) on TRAINED weights — a quick on-TPU marker overfit so heatmaps
     are peaked and argmax is well-posed (on random-init near-flat maps
     coords are decided by sub-noise margins): every decoded coord must
     agree within 0.5 px — the width of decode v2's quarter-pixel
     refinement (reference eval.py:74-79), whose sign(neighbor
     difference) legitimately flips under bf16 noise on near-symmetric
     peaks; when the true keypoint sits BETWEEN two cells the argmax
     itself is a coin-flip whose refined coords differ by exactly 0.5 px
     — mean delta and both paths' distance-to-GT are asserted instead
     (measured: 0.43 px mean GT error for BOTH paths, identical to 1e-3).
     Confidences within the bf16 band. Matches the guarantee implied by
     /root/reference/eval.py:106-108.
  E. the serving wiring (PoseServer end-to-end on TPU, uint8 wire with
     quantization-exact inputs, fused vs flax servers, identical images,
     same trained weights).

Usage (real TPU, default axon backend — do NOT force CPU):
    python scripts/validate_fused_tpu.py [--quick]

Prints a per-configuration max-abs-diff table (markdown, for PERF.md) and
exits nonzero on any violation. --quick skips serving + off-path dials.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from single_person_pose_estimation_tpu.models import fused_inference as fi  # noqa: E402
from single_person_pose_estimation_tpu.models.fused_inference import (  # noqa: E402
    fused_apply,
)
from single_person_pose_estimation_tpu.models.hourglass import (  # noqa: E402
    StackedHourglass,
)

S, C, HW = 4, 256, 256
KERNEL_TOL = 1e-4
BF16_TOL = 6e-2

# f32 doubles every VMEM buffer; the kernels' blocking is tuned for bf16
# and the 64px level exceeds the default 16 MB scoped-VMEM limit at f32
# even at one image per grid step. Raise it for the f32 legs only (v5e has
# 128 MB VMEM) — the product gates the fused path to 2-byte compute dtypes
# (fused_inference.py docstring).
VMEM_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}

FAILURES = []
ROWS = []


def log(msg):
    print(msg, flush=True)


def check(name, got, want, tol):
    d = float(np.max(np.abs(np.asarray(got, np.float32)
                            - np.asarray(want, np.float32))))
    ok = d <= tol
    ROWS.append((name, d, tol, "PASS" if ok else "FAIL"))
    if not ok:
        FAILURES.append((name, d, tol))
    log(f"  {name:58s} max|d|={d:10.3e}  tol={tol:.2e}  "
        f"{'PASS' if ok else '** FAIL **'}")
    return d


def jit32(fn):
    return jax.jit(fn, compiler_options=VMEM_OPTS)


def coord_agreement(a, b):
    """(mean coord delta px, max coord delta px, max conf delta).

    Exact coordinate equality is NOT the invariant between two correct
    bf16 programs: decode v2's quarter-pixel refinement is a
    sign(neighbor difference) (reference eval.py:74-79) that legitimately
    flips under bf16 noise on near-symmetric peaks, and when the true
    keypoint sits between two heatmap cells the argmax itself is a
    coin-flip between adjacent cells whose refined coords differ by
    exactly 0.5 px (measured: max delta is exactly 0.50 on marker
    overfits, with identical distance-to-GT both paths). The invariant:
    every coord within 0.5 px (the refinement width), confidences within
    the bf16 band, and (checked by the caller) equal ground-truth
    accuracy."""
    d = np.abs(a[..., :2] - b[..., :2])
    return (float(np.mean(d)), float(np.max(d)),
            float(np.max(np.abs(a[..., 2] - b[..., 2]))))


def condition_variables(variables):
    """Lift every BN running variance so each inference-BN affine DAMPS
    (gamma/sqrt(var+eps) ~ 0.2): the 4-stack feedback becomes contractive
    and bf16 rounding noise stops amplifying chaotically. Measured on the
    v5e: at random init two legitimate bf16 programs (XLA vs fused — or
    XLA-bf16 vs the f32 truth) drift to O(1) by stack 3; conditioned, the
    fused path tracks XLA-bf16 to a few 1e-3 through all 4 stacks."""
    return {
        "params": variables["params"],
        "batch_stats": {
            k: {"mean": v["mean"], "var": jnp.full_like(v["var"], 25.0)}
            for k, v in variables["batch_stats"].items()
        },
    }


def overfit_markers_on_tpu(model, steps_n=500):
    """Quick on-TPU marker overfit (weighted_mse, B=16) so heatmaps are
    PEAKED and argmax is well-posed — on random-init near-flat maps the
    decoded coordinate is decided by sub-noise margins and no two correct
    programs need agree. Returns (trained variables, marker batch).
    Same synthetic-marker protocol as scripts/validate_train_tpu.py
    (which drives 800 steps to 0.47 px mean decode error)."""
    from single_person_pose_estimation_tpu import losses
    from single_person_pose_estimation_tpu.configs.default_config import (
        Config,
    )
    from single_person_pose_estimation_tpu.training import steps as tsteps

    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (8, HW, HW, 3)).astype(np.float32)
    kx = np.zeros((8, 17), np.float32)
    ky = np.zeros((8, 17), np.float32)
    for i in range(8):
        for k in range(17):
            x = 40 + (k % 5) * 40 + i
            y = 40 + (k // 5) * 44 + i
            imgs[i, max(0, y - 4):y + 5, max(0, x - 4):x + 5] = \
                [(k % 2), ((k // 2) % 2), (k * 15 % 255) / 255.0]
            kx[i, k] = x / 4.0
            ky[i, k] = y / 4.0
    # uint8-grid pixels so the serving wire (uint8) is quantization-exact.
    imgs = np.round(imgs * 255.0) / 255.0
    batch = {
        "image": jnp.asarray(np.tile(imgs, (2, 1, 1, 1))),
        "kx": jnp.asarray(np.tile(kx, (2, 1))),
        "ky": jnp.asarray(np.tile(ky, (2, 1))),
        "kv": jnp.full((16, 17), 2, jnp.int32),
    }
    tx = tsteps.make_optimizer(5e-3)
    state = tsteps.TrainState.create(model, tx, jax.random.PRNGKey(0))
    step = tsteps.make_train_step(model, tx, losses.weighted_mse, Config(),
                                  augment=False)
    t0 = time.time()
    for i in range(steps_n):
        state, m = step(state, batch)
    loss = float(m["loss"])
    state = tsteps.recalibrate_batch_stats(model, state, [batch])
    log(f"  marker overfit: {steps_n} steps, final loss {loss:.5f} "
        f"({time.time() - t0:.0f}s)")
    return ({"params": state.params, "batch_stats": state.batch_stats},
            batch)


def per_kernel_section(variables, quick):
    """Section A: each Mosaic kernel vs its XLA formulation, f32, compiled
    on the TPU, at the exact shapes the flagship default path launches."""
    params = variables["params"]
    stats = variables["batch_stats"]
    rng = jax.random.PRNGKey(5)

    def rand(shape):
        nonlocal rng
        rng, k = jax.random.split(rng)
        return jax.random.uniform(k, shape, jnp.float32) * 2.0 - 1.0

    B = 16  # enough to exercise pick_nimg batch blocking at every level
    log("\n== A. per-kernel f32 on-TPU equality (compiled Mosaic vs XLA) ==")

    # Identity-skip bottlenecks at every pyramid level (+ B=1 at 64px).
    for lvl, h in (("f1", 64), ("f2", 32), ("f4", 16), ("f8", 8)):
        name = f"hg0_downsample_{lvl}"
        for b in ((B, 1) if lvl == "f1" else (B,)):
            x = rand((b, h, h, C))
            got = jit32(lambda x, n=name: fi._bottleneck_fused(
                params, stats, x, n, interpret=False))(x)
            want = jit32(lambda x, n=name: fi._bottleneck_xla(
                params, stats, x, n, C))(x)
            check(f"A bottleneck {lvl} {h}x{h} B={b}", got, want, KERNEL_TOL)

    # Pool-fused bottlenecks (the <=32px levels on the default path).
    # rows=2048: halved batch-blocking — at f32 the bf16-tuned blocking
    # exceeds the kernel's 24 MB VMEM cap (same code, smaller grid step).
    for lvl, h in (("f2", 32), ("f4", 16), ("f8", 8)):
        name = f"hg0_downsample_{lvl}"
        x = rand((B, h, h, C))
        got, pooled = jit32(lambda x, n=name: fi._bottleneck_pool_fused(
            params, stats, x, n, interpret=False, rows=2048))(x)
        want = jit32(lambda x, n=name: fi._bottleneck_xla(
            params, stats, x, n, C))(x)
        check(f"A bottleneck+pool {lvl} out", got, want, KERNEL_TOL)
        check(f"A bottleneck+pool {lvl} pooled", pooled,
              jit32(fi._maxpool)(jnp.asarray(want)), KERNEL_TOL)

    # Conv-skip bottleneck (front_bottleneck_3: 128 -> 256 channels).
    # 32px map: at f32 the 64px product shape is 656 KB over the kernel's
    # 24 MB VMEM cap even at one image per step (bf16 fits); same kernel
    # code, and the off-path fuse_front dial is bf16-gated anyway.
    x = rand((B, 32, 32, 128))
    got = jit32(lambda x: fi._bottleneck_front_fused(
        params, stats, x, "front_bottleneck_3", C, False, rows=1024))(x)
    want = jit32(lambda x: fi._bottleneck_xla(
        params, stats, x, "front_bottleneck_3", C))(x)
    check("A conv-skip bottleneck front_3 32x32", got, want, KERNEL_TOL)

    # Uplevel kernel (short bottleneck + upsample-add + merged bottleneck)
    # at each decoder level.
    from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel \
        import pick_nimg
    from single_person_pose_estimation_tpu.ops.pallas.uplevel_kernel \
        import fused_uplevel
    for lvl, h in (("f1", 64), ("f2", 32), ("f4", 16), ("f8", 8)):
        feat = rand((B, h, h, C))
        u = rand((B, h // 2, h // 2, C))
        sp = fi._bneck_params(params, stats, f"hg0_upsample_{lvl}_short")
        mp = fi._bneck_params(params, stats, f"hg0_upsample_{lvl}_merged")
        got = jit32(lambda f, u: fused_uplevel(
            f, u, sp, mp, interpret=False,
            nimg=pick_nimg(B, h, h, 1024)))(feat, u)

        def want_fn(f, u, lvl=lvl):
            d = fi._bottleneck_xla(params, stats, f,
                                   f"hg0_upsample_{lvl}_short", C)
            m = d + fi._upsample2x(u)
            return fi._bottleneck_xla(params, stats, m,
                                      f"hg0_upsample_{lvl}_merged", C)

        check(f"A uplevel {lvl} {h}x{h}", got, jit32(want_fn)(feat, u),
              KERNEL_TOL)

    # Head kernel: predict head + inter-stack glue (not-last) and the
    # pruned last-stack variant.
    from single_person_pose_estimation_tpu.ops.pallas.head_kernel import (
        fused_head,
    )
    from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel \
        import bn_affine
    u = rand((B, 64, 64, C))
    y = rand((B, 64, 64, C))
    for i, last in ((0, False), (3, True)):
        name = f"hg{i}"
        ha, hc = bn_affine(params[name + "_conv_1x1_1_bn"]["scale"],
                           params[name + "_conv_1x1_1_bn"]["bias"],
                           stats[name + "_conv_1x1_1_bn"]["mean"],
                           stats[name + "_conv_1x1_1_bn"]["var"], fi._BN_EPS)
        glue = {}
        if not last:
            glue = {"w2": params[name + "_conv_1x1_2"]["kernel"][0, 0],
                    "b2": params[name + "_conv_1x1_2"]["bias"],
                    "w3": params[name + "_conv_1x1_3"]["kernel"][0, 0],
                    "b3": params[name + "_conv_1x1_3"]["bias"]}
        got_hp, got_y = jit32(lambda u, y: fused_head(
            u, y, params[name + "_conv_1x1_1"]["kernel"][0, 0],
            params[name + "_conv_1x1_1"]["bias"], ha, hc,
            params[name + "_conv_1x1_predict"]["kernel"][0, 0],
            params[name + "_conv_1x1_predict"]["bias"],
            last=last, interpret=False, **glue))(u, y)

        def want_head(u, y, name=name, last=last):
            head = jnp.maximum(fi._conv(params, u, name + "_conv_1x1_1"), 0)
            head = fi._bn(params, stats, head, name + "_conv_1x1_1_bn")
            zp = fi._conv(params, head, name + "_conv_1x1_predict")
            hp = jax.nn.sigmoid(zp.astype(jnp.float32))
            if last:
                return hp, y
            h2 = fi._conv(params, head, name + "_conv_1x1_2")
            hm = fi._conv(params, hp.astype(u.dtype), name + "_conv_1x1_3")
            return hp, h2 + hm + y

        want_hp, want_y = jit32(want_head)(u, y)
        check(f"A head hg{i} last={last} predict", got_hp, want_hp,
              KERNEL_TOL)
        if not last:  # last=True returns y_next=None by design
            check(f"A head hg{i} last={last} next_y", got_y, want_y,
                  KERNEL_TOL)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--sections", default="ABCDE",
                    help="subset of ABCDE to run (compile cache makes "
                    "re-runs of individual sections cheap)")
    args = ap.parse_args()
    sections = set(args.sections.upper())

    dev = jax.devices()[0]
    log(f"device: {dev}  backend: {jax.default_backend()}")
    if jax.default_backend() == "cpu":
        log("WARNING: running on CPU — this validates nothing about Mosaic")

    model32 = StackedHourglass(num_stacks=S, num_channels=C,
                               compute_dtype=jnp.float32)
    model16 = StackedHourglass(num_stacks=S, num_channels=C,
                               compute_dtype=jnp.bfloat16)
    variables = model32.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, HW, HW, 3), jnp.float32),
                             train=False)
    # Non-init running stats so eval-mode BN is exercised for real.
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(lambda x: x + 0.01,
                                    variables["batch_stats"]),
    }
    img128 = jax.random.uniform(jax.random.PRNGKey(1), (128, HW, HW, 3),
                                jnp.float32)
    img1 = img128[:1]

    # ---------------- A. per-kernel ----------------
    if "A" in sections:
        t0 = time.time()
        per_kernel_section(variables, args.quick)
        log(f"(section A: {time.time() - t0:.0f}s)")

    # ---------------- B. full model, f32 ----------------
    apply32 = jax.jit(lambda v, x: model32.apply(v, x, train=False))

    def apply32h(v, x):
        with jax.default_matmul_precision("highest"):
            return model32.apply(v, x, train=False)

    apply32h = jax.jit(apply32h)

    def fused32(img, **kw):
        # Halved batch-blocking at f32 (VMEM doubles vs the bf16 tuning);
        # same kernels, same wiring, smaller grid steps.
        return jit32(lambda v, x: fused_apply(
            v, x, num_stacks=S, compute_dtype=jnp.float32,
            bneck_rows=2048, uplevel_rows=1024, **kw))(variables, img)

    default = dict(fuse_levels=True, pool_fuse_max_h=32, fuse_heads=True)
    if sections & {"B", "C"}:
        t0 = time.time()
        ref32_128 = [np.asarray(o) for o in apply32(variables, img128)]
        ref32_1 = [np.asarray(o) for o in apply32(variables, img1)]
        ref32h_128 = [np.asarray(o) for o in apply32h(variables, img128)]
        # XLA's own f32 noise floor: default (bf16-pass convs) vs highest
        # (true f32) — two legitimate XLA f32 programs, per stack.
        floor = [float(np.max(np.abs(a - b)))
                 for a, b in zip(ref32_128, ref32h_128)]
        log(f"\nXLA f32 default-vs-highest precision floor per stack: "
            f"{[f'{f:.2e}' for f in floor]}  ({time.time() - t0:.0f}s)")

    if "B" in sections:
        combos = [
            ("plain-bottlenecks", {}),
            ("+fuse_levels", dict(fuse_levels=True)),
            ("+pool_fuse_max_h=32",
             dict(fuse_levels=True, pool_fuse_max_h=32)),
            ("DEFAULT(+fuse_heads)", default),
        ]
        if not args.quick:
            # fuse_front stays bf16-only (the conv-skip kernel at 64px f32
            # is over its VMEM cap — see section A note); both off-path
            # dials are checked at bf16 in section C.
            combos += [
                ("default+fuse_bottom=3", dict(default, fuse_bottom=3)),
            ]

        log("\n== B. fused_apply vs model.apply, f32, B=128 "
            "(tol = 3x XLA precision floor + 1e-4) ==")
        for name, kw in combos:
            t0 = time.time()
            got = fused32(img128, **kw)
            for s in range(S):
                check(f"B f32 B=128 {name} stack{s}", got[s], ref32_128[s],
                      3.0 * floor[s] + 1e-4)
            log(f"  ({time.time() - t0:.0f}s)")

        log("\n== B. fused_apply vs model.apply, f32, B=1, default path ==")
        floor1 = floor  # B=1 rides the same per-stack conditioning
        got = fused32(img1, **default)
        for s in range(S):
            check(f"B f32 B=1   DEFAULT stack{s}", got[s], ref32_1[s],
                  3.0 * floor1[s] + 1e-4)

    # ---------------- C. bf16 (the headline precision) ----------------
    # C1: conditioned variables (contractive net — see condition_variables):
    # the fused path must track XLA-bf16 tightly per stack AND sit no
    # farther from the f32 truth than XLA-bf16 itself.
    if "C" in sections:
        log("\n== C. bf16, CONDITIONED variables (contractive; tol 1e-2) ==")
        cond = condition_variables(variables)
        apply16 = jax.jit(lambda v, x: model16.apply(v, x, train=False))
        c16_128 = [np.asarray(o, np.float32) for o in apply16(cond, img128)]
        c16_1 = [np.asarray(o, np.float32) for o in apply16(cond, img1)]
        c32h_128 = [np.asarray(o) for o in apply32h(cond, img128)]
        COND_TOL = 1e-2  # measured fused-vs-XLA-bf16 gap <=2.7e-3 per stack
        got = fused_apply(cond, img128, num_stacks=S,
                          compute_dtype=jnp.bfloat16, **default)
        for s in range(S):
            check(f"C bf16 B=128 cond DEFAULT stack{s}", got[s], c16_128[s],
                  COND_TOL)
        d_fused = float(np.max(np.abs(np.asarray(got[-1], np.float32)
                                      - c32h_128[-1])))
        d_xla = float(np.max(np.abs(c16_128[-1] - c32h_128[-1])))
        tol = max(d_xla * 1.5, 5e-3)
        ROWS.append(("C bf16 cond fused-vs-f32truth (xla yardstick)",
                     d_fused, tol, "PASS" if d_fused <= tol else "FAIL"))
        log(f"  cond bf16 last-stack distance to f32 truth: "
            f"fused={d_fused:.3e} xla={d_xla:.3e}")
        if d_fused > tol:
            FAILURES.append(("cond bf16 fused farther from f32 truth",
                             d_fused, tol))
        got = fused_apply(cond, img1, num_stacks=S,
                          compute_dtype=jnp.bfloat16, **default)
        for s in range(S):
            check(f"C bf16 B=1   cond DEFAULT stack{s}", got[s], c16_1[s],
                  COND_TOL)
        if not args.quick:
            # Off-path dials at bf16 (their tuned precision): fuse_front,
            # fuse_bottom, and the space-to-depth front fold.
            for cname, ckw in (
                    ("fuse_front", dict(default, fuse_front=True)),
                    ("fuse_bottom=3", dict(default, fuse_bottom=3)),
                    ("front_s2d", dict(default, front_s2d=True))):
                got = fused_apply(cond, img128, num_stacks=S,
                                  compute_dtype=jnp.bfloat16, **ckw)
                check(f"C bf16 B=128 cond default+{cname} last-stack",
                      got[-1], c16_128[-1], COND_TOL)
        # C2: random-init yardstick (kept for the record): by stack 3 the
        # un-conditioned feedback is chaotic — XLA-bf16 itself sits O(1)
        # from the f32 truth; the fused path must be no farther than 1.5x
        # XLA's own distance. (Per-stack equality is meaningless there.)
        ref16_128 = [np.asarray(o, np.float32)
                     for o in apply16(variables, img128)]
        got = fused_apply(variables, img128, num_stacks=S,
                          compute_dtype=jnp.bfloat16, **default)
        d_fused = float(np.max(np.abs(np.asarray(got[-1], np.float32)
                                      - ref32h_128[-1])))
        d_xla = float(np.max(np.abs(ref16_128[-1] - ref32h_128[-1])))
        tol = max(d_xla * 1.5, 0.02)
        ROWS.append(("C bf16 rand-init fused-vs-f32truth (xla yardstick)",
                     d_fused, tol, "PASS" if d_fused <= tol else "FAIL"))
        log(f"  rand-init bf16 last-stack distance to f32 truth: "
            f"fused={d_fused:.3e} xla={d_xla:.3e}")
        if d_fused > tol:
            FAILURES.append(("rand-init bf16 fused farther from f32 truth",
                             d_fused, tol))

    # ---------------- D/E: trained weights ----------------
    # Peaked heatmaps via a quick on-TPU overfit; argmax becomes well-posed
    # and the eval/serving wirings must agree fused-vs-flax.
    if sections & {"D", "E"}:
        tvars, tbatch = overfit_markers_on_tpu(model16)
        timgs = tbatch["image"][:8]
    if "D" in sections:
        log("\n== D. eval wiring on TRAINED weights: fused vs flax "
            "(bf16) ==")
        from single_person_pose_estimation_tpu.evaluation.predict import (
            make_predict_decode_fn,
        )
        fn_fused = make_predict_decode_fn(model16, use_fused=True)
        fn_flax = make_predict_decode_fn(model16, use_fused=False)
        kf = np.asarray(fn_fused(tvars["params"], tvars["batch_stats"],
                                 timgs))
        kx = np.asarray(fn_flax(tvars["params"], tvars["batch_stats"],
                                timgs))
        coord_mean, coord_d, conf_d = coord_agreement(kf, kx)
        # Ground-truth accuracy of BOTH paths must be equal: the fused
        # decodes land on the markers exactly as well as flax's.
        gkx = np.asarray(tbatch["kx"][:8])
        gky = np.asarray(tbatch["ky"][:8])
        gt_f = float(np.mean(np.hypot(kf[..., 0] - gkx, kf[..., 1] - gky)))
        gt_x = float(np.mean(np.hypot(kx[..., 0] - gkx, kx[..., 1] - gky)))
        gt_gap = abs(gt_f - gt_x)
        ROWS.append(("D eval coord max|d| px (refinement width)", coord_d,
                     0.5, "PASS" if coord_d <= 0.5 else "FAIL"))
        ROWS.append(("D eval coord mean|d| px", coord_mean, 0.15,
                     "PASS" if coord_mean <= 0.15 else "FAIL"))
        ROWS.append(("D eval conf max|d| (trained)", conf_d, BF16_TOL,
                     "PASS" if conf_d <= BF16_TOL else "FAIL"))
        ROWS.append(("D eval fused decode-vs-GT mean px", gt_f, 2.0,
                     "PASS" if gt_f <= 2.0 else "FAIL"))
        ROWS.append(("D eval |GT err fused - flax| px", gt_gap, 0.05,
                     "PASS" if gt_gap <= 0.05 else "FAIL"))
        log(f"  coord max|d|={coord_d:.2f}px (<=0.5) mean|d|="
            f"{coord_mean:.3f}px  conf max|d|={conf_d:.3e}  GT err "
            f"fused {gt_f:.3f}px flax {gt_x:.3f}px")
        if coord_d > 0.5:
            FAILURES.append(("eval coord delta", coord_d, 0.5))
        if coord_mean > 0.15:
            FAILURES.append(("eval coord mean delta", coord_mean, 0.15))
        if conf_d > BF16_TOL:
            FAILURES.append(("eval conf", conf_d, BF16_TOL))
        if gt_f > 2.0:
            FAILURES.append(("eval decode GT err", gt_f, 2.0))
        if gt_gap > 0.05:
            FAILURES.append(("eval GT err gap fused-vs-flax", gt_gap, 0.05))

    if "E" in sections and not args.quick:
        log("\n== E. serving wiring on TRAINED weights: PoseServer fused "
            "vs flax (uint8 wire) ==")
        from single_person_pose_estimation_tpu.serving import PoseServer
        # Marker images are already on the uint8 grid -> wire is exact.
        imgs = np.asarray(timgs)
        outs = {}
        for fused in (True, False):
            srv = PoseServer(model16, tvars["params"],
                             tvars["batch_stats"], buckets=(8,),
                             max_wait_s=0.05, use_fused=fused,
                             transfer_dtype="uint8")
            srv.warmup(image_shape=(HW, HW, 3))
            outs[fused] = srv.predict(imgs)
            srv.close()
        coord_mean, coord_d, conf_d = coord_agreement(outs[True],
                                                      outs[False])
        ROWS.append(("E serving coord max|d| px", coord_d, 0.5,
                     "PASS" if coord_d <= 0.5 else "FAIL"))
        ROWS.append(("E serving coord mean|d| px", coord_mean, 0.15,
                     "PASS" if coord_mean <= 0.15 else "FAIL"))
        ROWS.append(("E serving conf max|d| (trained)", conf_d, BF16_TOL,
                     "PASS" if conf_d <= BF16_TOL else "FAIL"))
        log(f"  serving coord max|d|={coord_d:.2f}px mean|d|="
            f"{coord_mean:.3f}px  conf max|d|={conf_d:.3e}")
        if coord_d > 0.5:
            FAILURES.append(("serving coord delta", coord_d, 0.5))
        if coord_mean > 0.15:
            FAILURES.append(("serving coord mean delta", coord_mean, 0.15))
        if conf_d > BF16_TOL:
            FAILURES.append(("serving conf", conf_d, BF16_TOL))

    # ---------------- markdown table ----------------
    log("\n| configuration | max abs diff | tolerance | result |")
    log("|---|---|---|---|")
    for name, d, tol, res in ROWS:
        log(f"| {name} | {d:.3e} | {tol:.2e} | {res} |")

    if FAILURES:
        log(f"\n{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    log(f"\nALL {len(ROWS)} CHECKS PASSED on {dev}")


if __name__ == "__main__":
    main()
