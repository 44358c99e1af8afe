"""Pallas kernels vs their XLA reference implementations (interpreter mode
on CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu.ops.decode import decode_batch
from single_person_pose_estimation_tpu.ops.heatmap import render_heatmaps_batch
from single_person_pose_estimation_tpu.experimental.decode_kernel import (
    decode_batch_pallas,
)
from single_person_pose_estimation_tpu.experimental.heatmap_kernel import (
    render_heatmaps_batch_pallas,
)


def test_heatmap_kernel_matches_xla():
    rng = np.random.default_rng(0)
    B, K = 4, 17
    kx = rng.uniform(-5, 70, (B, K)).astype(np.float32)
    ky = rng.uniform(-5, 70, (B, K)).astype(np.float32)
    kv = rng.integers(0, 3, (B, K)).astype(np.int32)
    want = np.asarray(render_heatmaps_batch(kx, ky, kv))
    got = np.asarray(render_heatmaps_batch_pallas(kx, ky, kv, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_heatmap_kernel_sigma2():
    kx = np.array([[32.0]], np.float32)
    ky = np.array([[30.0]], np.float32)
    kv = np.array([[2]], np.int32)
    want = np.asarray(render_heatmaps_batch(kx, ky, kv, sigma=2.0))
    got = np.asarray(render_heatmaps_batch_pallas(kx, ky, kv, sigma=2.0,
                                                  interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def random_heatmaps(seed, B=3, H=64, W=64, K=17, border=False):
    rng = np.random.default_rng(seed)
    hm = rng.uniform(0, 0.3, (B, H, W, K)).astype(np.float32)
    for b in range(B):
        for k in range(K):
            if border:
                x = rng.choice([0, 1, W - 2, W - 1])
                y = rng.choice([0, 1, H - 2, H - 1])
            else:
                x = rng.integers(0, W)
                y = rng.integers(0, H)
            hm[b, y, x, k] = rng.uniform(0.5, 1.0)
    return hm


@pytest.mark.parametrize("legacy", [True, False])
@pytest.mark.parametrize("border", [False, True])
def test_decode_kernel_matches_xla(legacy, border):
    hm = random_heatmaps(1, border=border)
    want = np.asarray(decode_batch(hm, conf_threshold=1e-6, legacy=legacy))
    got = np.asarray(decode_batch_pallas(hm, conf_threshold=1e-6,
                                         legacy=legacy, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_decode_kernel_threshold():
    hm = np.full((2, 64, 64, 17), 0.05, np.float32)
    got = np.asarray(decode_batch_pallas(hm, conf_threshold=0.1,
                                         legacy=True, interpret=True))
    assert (got == 0).all()


def test_decode_kernel_tie_breaking():
    hm = np.zeros((1, 64, 64, 1), np.float32)
    hm[0, 10, 10, 0] = 0.9
    hm[0, 10, 11, 0] = 0.7
    hm[0, 11, 10, 0] = 0.7     # tie in the patch
    want = np.asarray(decode_batch(hm, legacy=True))
    got = np.asarray(decode_batch_pallas(hm, legacy=True, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6)


# ---------------------------------------------------------------------------
# 2-pass matmul warp kernel
# ---------------------------------------------------------------------------

def test_warp_kernel_geometry_on_smooth_image():
    """Affine warp of an affine image: linear interp is exact, so 2-pass
    must equal the direct gather warp away from zero-pad boundaries."""
    from single_person_pose_estimation_tpu.ops.augment import _warp_image
    from single_person_pose_estimation_tpu.ops.pallas.warp_kernel import (
        affine_warp_batch,
    )

    H = W = 64
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    grad = np.stack([xx / W, yy / H, (xx + yy) / (H + W)], -1).astype(np.float32)
    imgs = jnp.asarray(np.stack([grad, grad * 0.5 + 0.2]))
    theta = jnp.asarray([0.3, -0.4])
    s = jnp.asarray([0.8, 1.2])
    flip = jnp.asarray([False, True])
    got = np.asarray(affine_warp_batch(imgs, theta, s, flip, interpret=True))
    want = np.stack([np.asarray(_warp_image(imgs[b], s[b], theta[b], flip[b]))
                     for b in range(2)])
    mask = (want.sum(-1) > 1e-6) & (got.sum(-1) > 1e-6)
    assert np.abs(got - want)[mask].mean() < 1e-3


def test_warp_kernel_identity():
    from single_person_pose_estimation_tpu.ops.pallas.warp_kernel import (
        affine_warp_batch,
    )
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    out = np.asarray(affine_warp_batch(
        imgs, jnp.zeros((1,)), jnp.ones((1,)), jnp.zeros((1,), bool),
        interpret=True))
    np.testing.assert_allclose(out, np.asarray(imgs), atol=1e-5)


def test_warp_kernel_pure_flip():
    from single_person_pose_estimation_tpu.ops.pallas.warp_kernel import (
        affine_warp_batch,
    )
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    out = np.asarray(affine_warp_batch(
        imgs, jnp.zeros((1,)), jnp.ones((1,)), jnp.ones((1,), bool),
        interpret=True))
    np.testing.assert_allclose(out, np.asarray(imgs)[:, :, ::-1], atol=1e-5)


def test_augment_batch_backends_agree():
    """Both geometric backends: identical keypoint transforms, matching
    image statistics (interpolation differs, geometry must not)."""
    from single_person_pose_estimation_tpu.ops.augment import augment_batch

    B = 4
    key = jax.random.PRNGKey(5)
    imgs = jax.random.uniform(jax.random.PRNGKey(6), (B, 64, 64, 3))
    kx = jax.random.uniform(jax.random.PRNGKey(7), (B, 17)) * 16
    ky = jax.random.uniform(jax.random.PRNGKey(8), (B, 17)) * 16
    kv = jnp.full((B, 17), 2, jnp.int32)

    img_g, kxg, kyg, kvg = augment_batch(key, imgs, kx, ky, kv,
                                         label_size=16,
                                         geometric_backend="gather")
    # interpret-mode pallas path on CPU
    import single_person_pose_estimation_tpu.ops.pallas.warp_kernel as wk
    orig = wk.affine_warp_batch
    wk.affine_warp_batch = lambda i, t, s, f: orig(i, t, s, f, interpret=True)
    try:
        img_m, kxm, kym, kvm = augment_batch(key, imgs, kx, ky, kv,
                                             label_size=16,
                                             geometric_backend="matmul2pass")
    finally:
        wk.affine_warp_batch = orig

    np.testing.assert_array_equal(np.asarray(kxg), np.asarray(kxm))
    np.testing.assert_array_equal(np.asarray(kyg), np.asarray(kym))
    np.testing.assert_array_equal(np.asarray(kvg), np.asarray(kvm))
    # photometric renorm forces [0,1]; means should be close
    assert abs(float(img_g.mean()) - float(img_m.mean())) < 0.05


def _ref_mobile_bneck(x, args):
    """Hand-rolled mobile bottleneck (depthwise->pointwise->relu->BN x3,
    identity skip) in plain jnp — the mobile_kernel tuple layout."""
    import jax.lax as lax

    (dw1, pw1, b1, dw2, pw2, b2, dw3, pw3, b3,
     a1, c1, a2, c2, a3, c3) = args
    t1 = jnp.maximum(jnp.einsum("bhwc,cd->bhwd", x * dw1, pw1) + b1,
                     0) * a1 + c1
    u = lax.conv_general_dilated(
        t1, dw2[:, :, None, :], (1, 1), "SAME",
        feature_group_count=t1.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    t2 = jnp.maximum(jnp.einsum("bhwc,cd->bhwd", u, pw2) + b2, 0) * a2 + c2
    t3 = jnp.maximum(jnp.einsum("bhwc,cd->bhwd", t2 * dw3, pw3) + b3,
                     0) * a3 + c3
    return x + t3


def _mobile_args(seed, C, Cm):
    rng = np.random.default_rng(seed)
    f = lambda s, lo, hi: jnp.asarray(rng.uniform(lo, hi, s), jnp.float32)
    return (f((C,), 0.5, 1.5), f((C, Cm), -.2, .2), f((Cm,), -.1, .1),
            f((3, 3, Cm), -.5, .5), f((Cm, Cm), -.2, .2), f((Cm,), -.1, .1),
            f((Cm,), 0.5, 1.5), f((Cm, C), -.2, .2), f((C,), -.1, .1),
            f((Cm,), 0.5, 1.5), f((Cm,), -.3, .3),
            f((Cm,), 0.5, 1.5), f((Cm,), -.3, .3),
            f((C,), 0.5, 1.5), f((C,), -.3, .3))


def test_mobile_bottleneck_kernel_direct():
    """fused_bottleneck_mobile vs the hand-rolled separable bottleneck."""
    from single_person_pose_estimation_tpu.ops.pallas.mobile_kernel import (
        fused_bottleneck_mobile,
    )

    rng = np.random.default_rng(11)
    B, H, W, C, Cm = 2, 16, 16, 32, 16
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.float32)
    args = _mobile_args(12, C, Cm)
    want = np.asarray(_ref_mobile_bneck(x, args))
    got = np.asarray(fused_bottleneck_mobile(x, *args, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_mobile_bottleneck_pool_kernel_direct():
    from single_person_pose_estimation_tpu.ops.pallas.mobile_kernel import (
        fused_bottleneck_mobile_pool,
    )
    import jax.lax as lax

    rng = np.random.default_rng(13)
    B, H, W, C, Cm = 2, 16, 16, 32, 16
    x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.float32)
    args = _mobile_args(14, C, Cm)
    want = np.asarray(_ref_mobile_bneck(x, args))
    want_p = np.asarray(lax.reduce_window(
        jnp.asarray(want), -jnp.inf, lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID"))
    got, got_p = fused_bottleneck_mobile_pool(x, *args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_p), want_p, atol=1e-4)


def test_mobile_uplevel_kernel_direct():
    from single_person_pose_estimation_tpu.ops.pallas.mobile_kernel import (
        fused_uplevel_mobile,
    )

    rng = np.random.default_rng(15)
    B, H, W, C, Cm = 2, 16, 16, 32, 16
    feat = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.float32)
    ulo = jnp.asarray(rng.uniform(-1, 1, (B, H // 2, W // 2, C)),
                      jnp.float32)
    s_args = _mobile_args(16, C, Cm)
    m_args = _mobile_args(17, C, Cm)
    d = _ref_mobile_bneck(feat, s_args)
    up = jnp.repeat(jnp.repeat(ulo, 2, axis=1), 2, axis=2)
    want = np.asarray(_ref_mobile_bneck(d + up, m_args))
    got = np.asarray(fused_uplevel_mobile(feat, ulo, s_args, m_args,
                                          interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_explicit_nimg_must_divide_batch():
    """An explicit nimg that does not divide B is rejected at trace time —
    the kernel grid is B // nimg blocks, so a non-divisor would silently
    drop the tail images (ops/pallas/bottleneck_kernel.resolve_nimg)."""
    import pytest

    from single_person_pose_estimation_tpu.ops.pallas.bottleneck_kernel import (
        fused_bottleneck,
        resolve_nimg,
    )

    assert resolve_nimg(0, 128, 64, 64) >= 1     # auto path unchanged
    assert resolve_nimg(4, 128, 8, 8) == 4
    with pytest.raises(ValueError, match="divide"):
        resolve_nimg(3, 128, 8, 8)

    C, Cm = 8, 4
    x = jnp.ones((4, 8, 8, C))
    args = [jnp.ones((C, Cm)), jnp.zeros(Cm), jnp.ones((3, 3, Cm, Cm)),
            jnp.zeros(Cm), jnp.ones((Cm, C)), jnp.zeros(C),
            jnp.ones(Cm), jnp.zeros(Cm), jnp.ones(Cm), jnp.zeros(Cm),
            jnp.ones(C), jnp.zeros(C)]
    with pytest.raises(ValueError, match="divide"):
        fused_bottleneck(x, *args, interpret=True, nimg=3)
