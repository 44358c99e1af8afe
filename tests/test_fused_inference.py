"""Fused-bottleneck inference path: equality vs the flax model (f32,
interpreter-mode kernels on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from single_person_pose_estimation_tpu.models.fused_inference import fused_apply
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass


def randomized_variables(model, seed=0, size=64):
    v = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3)),
                   train=False)
    rngs = jax.random.split(jax.random.PRNGKey(seed + 1), 4096)
    i = [0]

    def rnd(x):
        i[0] += 1
        return jax.random.uniform(rngs[i[0]], x.shape, minval=0.5, maxval=1.5)

    # non-trivial BN running stats so the affine fold is exercised
    return {"params": v["params"],
            "batch_stats": jax.tree.map(rnd, v["batch_stats"])}


def test_fused_apply_matches_flax_f32():
    model = StackedHourglass(num_stacks=2, num_channels=32,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    want = model.apply(v, x, train=False)
    got = fused_apply(v, x, num_stacks=2, compute_dtype=jnp.float32,
                      interpret=True)
    assert len(got) == 2
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_apply_single_stack():
    model = StackedHourglass(num_stacks=1, num_channels=16,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))
    want = model.apply(v, x, train=False)
    got = fused_apply(v, x, num_stacks=1, compute_dtype=jnp.float32,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(want[0]), np.asarray(got[0]),
                               atol=1e-4)


def test_fused_bottleneck_kernel_direct():
    """The kernel alone vs a hand-rolled reference bottleneck."""
    from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
        bn_affine,
        fused_bottleneck,
    )

    rng = np.random.default_rng(0)
    B, H, W, C, Cm = 2, 16, 16, 32, 16
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32))
    w1 = jnp.asarray(rng.uniform(-.2, .2, (C, Cm)).astype(np.float32))
    w2 = jnp.asarray(rng.uniform(-.2, .2, (3, 3, Cm, Cm)).astype(np.float32))
    w3 = jnp.asarray(rng.uniform(-.2, .2, (Cm, C)).astype(np.float32))
    b1 = jnp.asarray(rng.uniform(-.1, .1, (Cm,)).astype(np.float32))
    b2 = jnp.asarray(rng.uniform(-.1, .1, (Cm,)).astype(np.float32))
    b3 = jnp.asarray(rng.uniform(-.1, .1, (C,)).astype(np.float32))
    affs = [bn_affine(jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32),
                      jnp.asarray(rng.uniform(-.3, .3, (n,)), jnp.float32),
                      jnp.asarray(rng.uniform(-.5, .5, (n,)), jnp.float32),
                      jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32))
            for n in (Cm, Cm, C)]
    (a1, c1), (a2, c2), (a3, c3) = affs

    got = np.asarray(fused_bottleneck(x, w1, b1, w2, b2, w3, b3,
                                      a1, c1, a2, c2, a3, c3,
                                      interpret=True))

    import jax.lax as lax
    t1 = jnp.maximum(jnp.einsum("bhwc,cm->bhwm", x, w1) + b1, 0) * a1 + c1
    t2c = lax.conv_general_dilated(t1, w2, (1, 1), "SAME",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    t2 = jnp.maximum(t2c + b2, 0) * a2 + c2
    t3 = jnp.maximum(jnp.einsum("bhwm,mc->bhwc", t2, w3) + b3, 0) * a3 + c3
    want = np.asarray(x + t3)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_apply_with_level_fusion_matches_flax():
    """fuse_levels=True (uplevel kernel) must also match exactly at f32."""
    model = StackedHourglass(num_stacks=2, num_channels=32,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    want = model.apply(v, x, train=False)
    got = fused_apply(v, x, num_stacks=2, compute_dtype=jnp.float32,
                      interpret=True, fuse_levels=True)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_apply_all_fusions_matches_flax():
    """The full TPU-default configuration — level fusion + pool fusion at
    the small levels + fused heads/inter-stack glue — must match exactly
    at f32."""
    model = StackedHourglass(num_stacks=2, num_channels=32,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    want = model.apply(v, x, train=False)
    got = fused_apply(v, x, num_stacks=2, compute_dtype=jnp.float32,
                      interpret=True, fuse_levels=True,
                      pool_fuse_max_h=8, fuse_heads=True)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_apply_heads_single_stack():
    """fuse_heads on a 1-stack model exercises the pruned-last-stack path
    (no conv_1x1_2/3 params)."""
    model = StackedHourglass(num_stacks=1, num_channels=16,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(6), (1, 64, 64, 3))
    want = model.apply(v, x, train=False)
    got = fused_apply(v, x, num_stacks=1, compute_dtype=jnp.float32,
                      interpret=True, fuse_heads=True)
    np.testing.assert_allclose(np.asarray(want[0]), np.asarray(got[0]),
                               atol=1e-4)


def test_fused_bottleneck_pool_kernel():
    """Pool-epilogue variant (kept as a documented experiment): output and
    pooled output must match the base kernel + a reference maxpool."""
    from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
        bn_affine,
        fused_bottleneck,
        fused_bottleneck_pool,
    )

    rng = np.random.default_rng(1)
    B, H, W, C, Cm = 2, 16, 16, 32, 16
    args = [jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32)),
            jnp.asarray(rng.uniform(-.2, .2, (C, Cm)).astype(np.float32)),
            jnp.asarray(rng.uniform(-.1, .1, (Cm,)).astype(np.float32)),
            jnp.asarray(rng.uniform(-.2, .2, (3, 3, Cm, Cm)).astype(np.float32)),
            jnp.asarray(rng.uniform(-.1, .1, (Cm,)).astype(np.float32)),
            jnp.asarray(rng.uniform(-.2, .2, (Cm, C)).astype(np.float32)),
            jnp.asarray(rng.uniform(-.1, .1, (C,)).astype(np.float32))]
    affs = [jnp.asarray(rng.uniform(0.5, 1.5, (n,)).astype(np.float32))
            for n in (Cm, Cm, Cm, Cm, C, C)]
    want = np.asarray(fused_bottleneck(*args, *affs, interpret=True))
    got, pooled = fused_bottleneck_pool(*args, *affs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
    ref_pool = want.reshape(B, H // 2, 2, W // 2, 2, C).max((2, 4))
    np.testing.assert_allclose(np.asarray(pooled), ref_pool, atol=1e-5)


def test_fused_apply_bottom_kernel_matches_flax():
    """fuse_bottom=True (the whole <=8px subtree in one launch) must match
    exactly at f32, alone and combined with every other fusion."""
    model = StackedHourglass(num_stacks=2, num_channels=32,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3))
    want = model.apply(v, x, train=False)
    got = fused_apply(v, x, num_stacks=2, compute_dtype=jnp.float32,
                      interpret=True, fuse_bottom=True)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    got_all = fused_apply(v, x, num_stacks=2, compute_dtype=jnp.float32,
                          interpret=True, fuse_levels=True,
                          pool_fuse_max_h=8, fuse_heads=True,
                          fuse_bottom=True)
    for a, b in zip(want, got_all):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_bottom_multiblock():
    """fuse_bottom with batch > images-per-step exercises grid blocking."""
    model = StackedHourglass(num_stacks=1, num_channels=16,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(8), (4, 64, 64, 3))
    want = model.apply(v, x, train=False)
    # 64x64 inputs put the f8 level at 2x2, so nimg caps at B and the
    # auto-picked block still covers the whole batch; force 2 blocks.
    from single_person_pose_estimation_tpu.ops.pallas.bottom_kernel import (
        fused_bottom, pack_bottom_params,
    )
    from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
        bn_affine,
    )
    got = fused_apply(v, x, num_stacks=1, compute_dtype=jnp.float32,
                      interpret=True, fuse_bottom=True)
    np.testing.assert_allclose(np.asarray(want[0]), np.asarray(got[0]),
                               atol=1e-4)
    # Direct multi-block check of the kernel at a grid of 2.
    packed = pack_bottom_params(v["params"], v["batch_stats"], "hg0",
                                bn_affine)
    x8 = jax.random.uniform(jax.random.PRNGKey(9), (4, 8, 8, 16))
    one = fused_bottom(x8, *packed, interpret=True, nimg=4)
    two = fused_bottom(x8, *packed, interpret=True, nimg=2)
    np.testing.assert_allclose(np.asarray(one), np.asarray(two), atol=1e-5)


def test_fused_subtree_depths_match_flax():
    """fuse_bottom depths 2 and 3 (<=16px / <=32px subtrees in one
    launch) must match flax exactly at f32. 128px inputs put f1 at 32px
    so depth=3 covers f2@8, f4@16... i.e. all non-f1 levels."""
    model = StackedHourglass(num_stacks=2, num_channels=32,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model, size=128)
    x = jax.random.uniform(jax.random.PRNGKey(10), (2, 128, 128, 3))
    want = model.apply(v, x, train=False)
    for depth in (2, 3):
        got = fused_apply(v, x, num_stacks=2, compute_dtype=jnp.float32,
                          interpret=True, fuse_bottom=depth)
        for a, b in zip(want, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=f"depth={depth}")


def test_fuse_front_matches_flax():
    """fuse_front (fused front bottlenecks incl. the conv-skip variant)
    must match flax exactly at f32."""
    model = StackedHourglass(num_stacks=2, num_channels=32,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(11), (2, 64, 64, 3))
    want = model.apply(v, x, train=False)
    got = fused_apply(v, x, num_stacks=2, compute_dtype=jnp.float32,
                      interpret=True, fuse_front=True)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    got_all = fused_apply(v, x, num_stacks=2, compute_dtype=jnp.float32,
                          interpret=True, fuse_levels=True,
                          pool_fuse_max_h=8, fuse_heads=True,
                          fuse_front=True)
    for a, b in zip(want, got_all):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_apply_512_input_xla_fallback_above_fuse_max_h():
    """512^2 inputs double the f1 level to 128 rows — above fuse_max_h the
    bottleneck/uplevel kernels (whole-image VMEM blocks) must fall back to
    XLA while the <=64px levels stay fused, and the result must still
    equal the flax model (VERDICT r2 Next #5; measured VMEM blowup on
    v5e without the guard)."""
    model = StackedHourglass(num_stacks=1, num_channels=8,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model, size=512)
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 512, 512, 3))
    want = model.apply(v, x, train=False)
    got = fused_apply(v, x, num_stacks=1, compute_dtype=jnp.float32,
                      interpret=True, fuse_levels=True, pool_fuse_max_h=32,
                      fuse_heads=True)
    np.testing.assert_allclose(np.asarray(want[0]), np.asarray(got[0]),
                               atol=1e-4)


def test_fused_bottleneck_rows_matches_whole_map_kernel():
    """Row-blocked variant (H > 64 levels): exact vs fused_bottleneck at
    every strip height, including the border strips whose 3x3 must see
    ZERO t1 rows (not conv1-of-zero-x rows) and the halo handoff between
    strips. Measured on the v5e this kernel LOSES to XLA at 128px+
    (scripts/bench_rows_bneck_ab.py, PERF.md) and is not on the default
    path; the equality evidence documents the experiment."""
    from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
        bn_affine,
        fused_bottleneck,
        fused_bottleneck_rows,
    )

    rng = np.random.default_rng(7)
    B, H, W, C, Cm = 2, 32, 16, 32, 16
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)).astype(np.float32))
    w1 = jnp.asarray(rng.uniform(-.2, .2, (C, Cm)).astype(np.float32))
    w2 = jnp.asarray(rng.uniform(-.2, .2, (3, 3, Cm, Cm)).astype(np.float32))
    w3 = jnp.asarray(rng.uniform(-.2, .2, (Cm, C)).astype(np.float32))
    # Non-zero biases/shifts make the border-row bug mode visible:
    # relu(b1)*a1 + c1 != 0, so zero-x halo rows corrupt the 3x3 unless
    # the kernel re-zeroes t1 at image borders.
    b1 = jnp.asarray(rng.uniform(.2, .4, (Cm,)).astype(np.float32))
    b2 = jnp.asarray(rng.uniform(-.1, .1, (Cm,)).astype(np.float32))
    b3 = jnp.asarray(rng.uniform(-.1, .1, (C,)).astype(np.float32))
    affs = [bn_affine(jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32),
                      jnp.asarray(rng.uniform(.2, .5, (n,)), jnp.float32),
                      jnp.asarray(rng.uniform(-.5, .5, (n,)), jnp.float32),
                      jnp.asarray(rng.uniform(0.5, 1.5, (n,)), jnp.float32))
            for n in (Cm, Cm, C)]
    (a1, c1), (a2, c2), (a3, c3) = affs

    want = np.asarray(fused_bottleneck(x, w1, b1, w2, b2, w3, b3,
                                       a1, c1, a2, c2, a3, c3,
                                       interpret=True))
    for hb in (8, 16, 32):
        got = np.asarray(fused_bottleneck_rows(x, w1, b1, w2, b2, w3, b3,
                                               a1, c1, a2, c2, a3, c3,
                                               interpret=True, hb=hb))
        np.testing.assert_allclose(got, want, atol=1e-5,
                                   err_msg=f"hb={hb}")


def test_fused_apply_mobile_matches_flax():
    """Mobile (separable-conv) variant through the mobile Pallas kernels
    (ops/pallas/mobile_kernel.py): every fusion flag combination must
    equal model.apply at f32. Measured on the v5e: 3,444 vs 2,260 img/s
    (+52%) — the mobile variant's depthwise convs bypass the MXU on XLA
    and the VMEM fusion is what makes it the fastest model (PERF.md)."""
    model = StackedHourglass(num_stacks=2, num_channels=64, mobile=True,
                             compute_dtype=jnp.float32)
    v = randomized_variables(model)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    want = model.apply(v, x, train=False)
    for flags in (dict(),
                  dict(fuse_heads=True),
                  dict(front_s2d=True),
                  dict(fuse_levels=True, pool_fuse_max_h=32,
                       fuse_heads=True)):
        got = fused_apply(v, x, num_stacks=2, compute_dtype=jnp.float32,
                          interpret=True, mobile=True, **flags)
        for s in range(2):
            np.testing.assert_allclose(np.asarray(want[s]),
                                       np.asarray(got[s]), atol=1e-4,
                                       err_msg=f"{flags} stack{s}")


def test_predict_decode_fused_mobile_matches_flax():
    """make_predict_decode_fn routes the mobile kernels for mobile models
    (use_fused=True + mobile) and must decode the same keypoints."""
    from single_person_pose_estimation_tpu.evaluation.predict import (
        make_predict_decode_fn,
    )

    model = StackedHourglass(num_stacks=1, num_channels=32, mobile=True,
                             compute_dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    plain = make_predict_decode_fn(model, use_fused=False)
    fused = make_predict_decode_fn(model, use_fused=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fused(v["params"], v["batch_stats"], x)),
        np.asarray(plain(v["params"], v["batch_stats"], x)),
        atol=1e-4)
