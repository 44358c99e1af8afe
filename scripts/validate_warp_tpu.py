"""On-hardware numerical validation of the COMPILED augmentation warp
kernel (ops/pallas/warp_kernel.py) — the default TPU geometric backend
inside the production train step that bench.py's train metric measures
(augment=True). Round 3's validate_fused_tpu.py closed the interpret-
mode-only gap for every INFERENCE kernel; every train-side validation
script ran augment=False, so the warp kernel's compiled Mosaic numerics
had no on-TPU evidence. This closes that.

Checks (real v5e, compiled Mosaic — do NOT force CPU):

  A. identity transform: warp(theta=0, s=1, flip=0) returns the input.
     One-hot interpolation weights; any Mosaic layout/padding bug is
     O(0.1-1). Band 1e-2 absorbs the TPU's bf16-pass f32 matmuls.
  B. pure flip: exact column reversal of the input, same band.
  C. geometry on smooth (affine) images at the flagship 256² shape,
     B=64: linear interpolation of an affine image is exact, so the
     2-pass kernel must match the direct gather warp (XLA, also compiled
     on the TPU) away from the zero-pad boundary — interior mean band
     3e-3, max 5e-2 (bf16-pass noise, two passes).
  D. end-to-end augment_batch: backend 'matmul2pass' (the TPU default)
     vs 'gather' under the SAME PRNG key — keypoint outputs bitwise
     equal (the co-transform is shared jnp code; a kernel that disagreed
     with its own keypoint geometry would corrupt training), image
     interiors within the smooth-image band.
  E. the full AUGMENTED production train step at flagship S4/256 bf16
     (the exact program bench.py times): short marker overfit on
     hardware — loss must fall and stay finite through the warp kernel's
     backward (one-hot matmul VJP).

Usage:  python scripts/validate_warp_tpu.py [--quick]   (--quick skips E)
Prints a max-abs-diff table for PERF.md; exits nonzero on any violation.
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

from single_person_pose_estimation_tpu.configs.default_config import Config  # noqa: E402
from single_person_pose_estimation_tpu.ops.augment import (  # noqa: E402
    _warp_image,
    augment_batch,
)
from single_person_pose_estimation_tpu.ops.pallas.warp_kernel import (  # noqa: E402
    affine_warp_batch,
)

FAILURES = []
ROWS = []


def log(msg):
    print(msg, flush=True)


def record(name, d, tol):
    ok = d <= tol
    ROWS.append((name, d, tol, "PASS" if ok else "FAIL"))
    if not ok:
        FAILURES.append((name, d, tol))
    log(f"  {name:52s} {d:10.3e}  tol={tol:.1e}  "
        f"{'PASS' if ok else '** FAIL **'}")


def smooth_images(b, hw):
    yy, xx = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    base = np.stack([xx / hw, yy / hw, (xx + yy) / (2 * hw)], -1)
    imgs = np.stack([base * (0.5 + 0.5 * i / b) + 0.1 * (i % 3) / 3
                     for i in range(b)])
    return np.clip(imgs, 0, 1).astype(np.float32)


def check_identity_and_flip():
    log("\n[A/B] identity + pure flip (compiled, 256², B=8)")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (8, 256, 256, 3)).astype(np.float32))
    zero = jnp.zeros((8,))
    one = jnp.ones((8,))
    warp = jax.jit(lambda i, t, s, f: affine_warp_batch(i, t, s, f))
    ident = np.asarray(warp(imgs, zero, one, jnp.zeros((8,), bool)))
    record("identity transform", float(np.abs(ident - np.asarray(imgs)).max()),
           1e-2)
    flip = np.asarray(warp(imgs, zero, one, jnp.ones((8,), bool)))
    record("pure horizontal flip",
           float(np.abs(flip - np.asarray(imgs)[:, :, ::-1]).max()), 1e-2)


def check_smooth_geometry():
    log("\n[C] affine-image geometry vs gather warp (compiled, 256², B=64)")
    B = 64
    imgs = jnp.asarray(smooth_images(B, 256))
    rng = np.random.default_rng(1)
    theta = jnp.asarray(rng.uniform(-0.5, 0.5, B).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.75, 1.25, B).astype(np.float32))
    flip = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    got = np.asarray(jax.jit(affine_warp_batch)(imgs, theta, s, flip))
    want = np.asarray(jax.jit(jax.vmap(_warp_image))(imgs, s, theta, flip))
    mask = (want.sum(-1) > 1e-6) & (got.sum(-1) > 1e-6)  # away from zero-pad
    diffs = np.abs(got - want)[mask]
    record("smooth geometry near-boundary mean|d|", float(diffs.mean()), 3e-3)
    # For the MAX check, erode the mask: a pixel whose 3x3 neighborhood
    # touches the zero-pad region legitimately differs (the 2-pass
    # composition mixes a zero where the direct warp mixes a real
    # neighbor — the documented half-pixel boundary smoothing,
    # warp_kernel.py docstring); the strict bound holds strictly inside.
    interior = mask.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            interior &= np.roll(np.roll(mask, dy, 1), dx, 2)
    interior[:, (0, -1), :] = False
    interior[:, :, (0, -1)] = False
    d_in = np.abs(got - want)[interior]
    record("smooth geometry interior max|d|", float(d_in.max()), 5e-2)


def check_augment_batch_backends():
    log("\n[D] augment_batch matmul2pass vs gather, same key (256², B=32)")
    cfg = Config()
    B = 32
    key = jax.random.PRNGKey(7)
    imgs = jnp.asarray(smooth_images(B, 256))
    rng = np.random.default_rng(2)
    kx = jnp.asarray(rng.uniform(4, 60, (B, 17)).astype(np.float32))
    ky = jnp.asarray(rng.uniform(4, 60, (B, 17)).astype(np.float32))
    kv = jnp.full((B, 17), 2, jnp.int32)

    outs = {}
    for backend in ("gather", "matmul2pass"):
        fn = jax.jit(lambda k, i, x, y, v, be=backend: augment_batch(
            k, i, x, y, v, label_size=cfg.label_width,
            flip_pairs=cfg.flip_pairs, geometric_backend=be,
            scale_min=cfg.aug_scale_min, scale_max=cfg.aug_scale_max,
            rotate_deg=cfg.aug_rotate_deg))
        outs[backend] = [np.asarray(o) for o in fn(key, imgs, kx, ky, kv)]
    ig, xg, yg, vg = outs["gather"]
    im, xm, ym, vm = outs["matmul2pass"]
    # Same jnp co-transform code in two separate XLA programs: expect
    # bitwise, allow reassociation-level noise.
    record("keypoint x agreement", float(np.abs(xg - xm).max()), 1e-5)
    record("keypoint y agreement", float(np.abs(yg - ym).max()), 1e-5)
    record("visibility bitwise", float(np.abs(vg - vm).max()), 0.0)
    mask = (ig.sum(-1) > 1e-6) & (im.sum(-1) > 1e-6)
    record("image interior mean|d|", float(np.abs(ig - im)[mask].mean()),
           3e-3)


def check_augmented_train():
    log("\n[E] augmented flagship train step (S4/256 bf16, B=16, "
        "warp kernel fwd+bwd)")
    from single_person_pose_estimation_tpu import losses
    from single_person_pose_estimation_tpu.models.hourglass import (
        StackedHourglass,
    )
    from single_person_pose_estimation_tpu.training import steps

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from validate_train_tpu import make_batch

    cfg = Config()
    model = StackedHourglass(num_stacks=4, num_channels=256,
                             compute_dtype=jnp.bfloat16)
    tx = steps.make_optimizer(5e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0))
    step = steps.make_train_step(model, tx, losses.weighted_mse, cfg,
                                 augment=True)  # warp kernel on TPU
    batch = make_batch()
    t0 = time.perf_counter()
    state, m = step(state, batch)
    first = float(m["loss"])
    log(f"  step 1 loss {first:.4f} (compile+run "
        f"{time.perf_counter() - t0:.0f}s)")
    last = first
    for i in range(2, 201):
        state, m = step(state, batch)
        if i % 50 == 0:
            last = float(m["loss"])
            log(f"  step {i} loss {last:.4f}")
    finite = np.isfinite(last)
    # Augmented targets move every step; demand a material fall, not
    # collapse (the augment-off overfit is validate_train_tpu.py's job).
    d = last / first if finite else float("inf")
    record("augmented train loss ratio (200 steps)", d, 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    log(f"devices: {jax.devices()}")
    check_identity_and_flip()
    check_smooth_geometry()
    check_augment_batch_backends()
    if not args.quick:
        check_augmented_train()

    log("\n| check | max|d| / value | tol | verdict |")
    log("|---|---|---|---|")
    for name, d, tol, verdict in ROWS:
        log(f"| {name} | {d:.3e} | {tol:.1e} | {verdict} |")
    if FAILURES:
        log(f"\nVALIDATE_WARP_TPU: FAIL ({len(FAILURES)} violations)")
        sys.exit(1)
    log(f"\nVALIDATE_WARP_TPU: PASS ({len(ROWS)} checks)")


if __name__ == "__main__":
    main()
