"""Tests for on-device augmentation: geometric/photometric correctness,
image-keypoint consistency, flip label swapping, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from single_person_pose_estimation_tpu.ops import augment


def test_deterministic_given_key():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(jax.random.PRNGKey(1), (256, 256, 3))
    kx = jnp.full((17,), 32.0)
    ky = jnp.full((17,), 32.0)
    kv = jnp.full((17,), 2)
    a = augment.augment_geometric(key, img, kx, ky, kv)
    b = augment.augment_geometric(key, img, kx, ky, kv)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_image_keypoint_consistency():
    """A bright dot at the keypoint's image location must end up (close to)
    the transformed keypoint's location after the same augmentation.

    Image is warped in 256-space, keypoints in 64-space (reference applies
    the same parameters in each space independently), so tolerance covers
    the sub-pixel center mismatch plus bilinear spread.
    """
    hits = 0
    for seed in range(10):
        key = jax.random.PRNGKey(seed)
        kx64, ky64 = 40.0, 24.0
        img = jnp.zeros((256, 256, 3))
        img = img.at[int(ky64 * 4), int(kx64 * 4)].set(1.0)
        out_img, ox, oy, ov = augment.augment_geometric(
            key, img, jnp.array([kx64]), jnp.array([ky64]), jnp.array([2]),
            flip_pairs=())
        peak = jnp.unravel_index(jnp.argmax(out_img[:, :, 0]), (256, 256))
        py, px = float(peak[0]), float(peak[1])
        ex, ey = float(ox[0]) * 4, float(oy[0]) * 4
        if abs(px - ex) < 6 and abs(py - ey) < 6:
            hits += 1
    # The reference itself carries a ~1.5px systematic offset between the
    # 256-space image warp center (127.5) and the 64-space keypoint center
    # (31.5); with bilinear peak spread a couple of near-boundary cases can
    # exceed even a 6px box, so require a strong majority.
    assert hits >= 9


def test_flip_swaps_labels():
    """With many trials, some flips occur; when they do, left/right pairs
    must swap (visibilities travel with the labels)."""
    kx = jnp.arange(17, dtype=jnp.float32) + 10
    ky = jnp.arange(17, dtype=jnp.float32) + 20
    kv = jnp.array([2] + [1, 2] * 8)
    img = jnp.zeros((256, 256, 3))
    saw_flip = False
    for seed in range(20):
        _, ox, oy, ov = augment.augment_geometric(
            jax.random.PRNGKey(seed), img, kx, ky, kv)
        ov = np.asarray(ov)
        if ov[1] == 2 and ov[2] == 1:  # left_eye/right_eye vis swapped
            saw_flip = True
            break
    assert saw_flip


def test_invisible_keypoints_stay_zero():
    kx = jnp.array([30.0, 0.0])
    ky = jnp.array([30.0, 0.0])
    kv = jnp.array([2, 0])
    img = jnp.zeros((256, 256, 3))
    for seed in range(5):
        _, ox, oy, ov = augment.augment_geometric(
            jax.random.PRNGKey(seed), img, kx, ky, kv, flip_pairs=())
        assert float(ox[1]) == 0.0 and float(oy[1]) == 0.0


def test_identity_when_ranges_collapsed():
    img = jax.random.uniform(jax.random.PRNGKey(2), (64, 64, 3))
    kx = jnp.array([20.0])
    ky = jnp.array([40.0])
    kv = jnp.array([2])
    out_img, ox, oy, _ = augment.augment_geometric(
        jax.random.PRNGKey(0), img, kx, ky, kv, flip_pairs=(),
        scale_min=1.0, scale_max=1.0, rotate_deg=0.0)
    # flip may still trigger; check either identity or exact mirror
    flipped = np.allclose(np.asarray(out_img), np.asarray(img[:, ::-1]), atol=1e-5)
    same = np.allclose(np.asarray(out_img), np.asarray(img), atol=1e-5)
    assert flipped or same


def test_photometric_range_and_shape():
    img = jax.random.uniform(jax.random.PRNGKey(3), (64, 64, 3))
    out = augment.augment_photometric(jax.random.PRNGKey(4), img)
    assert out.shape == img.shape
    assert float(jnp.min(out)) >= -1e-6
    assert float(jnp.max(out)) <= 1 + 1e-6
    # min-max renorm hits both bounds exactly
    np.testing.assert_allclose(float(jnp.min(out)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(jnp.max(out)), 1.0, atol=1e-6)


def test_photometric_constant_image_no_nan():
    """A constant (e.g. black) frame must not NaN the training path.

    The reference's min-max renorm divides by zero here
    (dataset_builder.py:214-217); our version epsilon-guards it
    (VERDICT.md Weak #6)."""
    for value in (0.0, 0.5, 1.0):
        img = jnp.full((64, 64, 3), value)
        out = augment.augment_photometric(jax.random.PRNGKey(6), img)
        assert np.isfinite(np.asarray(out)).all(), f"NaN at value={value}"
        assert float(jnp.min(out)) >= -1e-6
        assert float(jnp.max(out)) <= 1 + 1e-6


def test_hsv_round_trip():
    rgb = jax.random.uniform(jax.random.PRNGKey(5), (32, 32, 3))
    back = augment.hsv_to_rgb(augment.rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_hsv_matches_tf():
    import pytest
    tf = pytest.importorskip("tensorflow")
    rgb = np.random.default_rng(6).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    got = np.asarray(augment.rgb_to_hsv(rgb))
    want = tf.image.rgb_to_hsv(rgb).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_warp_image_matches_tf_projective_transform():
    """Image-level oracle for the fused affine warp (PARITY.md deviation
    #2: imgaug itself is absent, but the warp must still be a CORRECT
    bilinear affine): `_warp_image`'s flip->scale->rotate-about-center
    inverse map, expressed as TF's output->input transform vector, must
    reproduce tf.raw_ops.ImageProjectiveTransformV3 (an independent
    third-party bilinear-affine implementation with the same
    constant-zero fill semantics) pixel-for-pixel."""
    import pytest
    tf = pytest.importorskip("tensorflow")

    rng = np.random.default_rng(7)
    H, W = 37, 29
    img = rng.uniform(0.0, 1.0, (H, W, 3)).astype(np.float32)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0

    cases = [(1.0, 0.0, False), (0.8, 17.0, False), (1.2, -25.0, True),
             (0.75, 30.0, True), (1.25, -30.0, False), (1.0, 0.0, True)]
    for s, deg, flip in cases:
        theta = np.deg2rad(deg)
        got = np.asarray(augment._warp_image(
            jnp.asarray(img), jnp.float32(s), jnp.float32(theta),
            jnp.asarray(flip)))

        # Our inverse map (augment.py _warp_image):
        #   x_in = f * inv_s * ( cos*(x_out-cx) + sin*(y_out-cy)) + cx
        #   y_in =     inv_s * (-sin*(x_out-cx) + cos*(y_out-cy)) + cy
        # with f = -1 on flip; TF's transform is [a0 a1 a2 b0 b1 b2 c0 c1]
        # mapping output (x, y) -> input (a0 x + a1 y + a2, b0 x + b1 y + b2).
        inv_s = 1.0 / s
        f = -1.0 if flip else 1.0
        a0 = f * inv_s * np.cos(theta)
        a1 = f * inv_s * np.sin(theta)
        a2 = cx - a0 * cx - a1 * cy
        b0 = -inv_s * np.sin(theta)
        b1 = inv_s * np.cos(theta)
        b2 = cy - b0 * cx - b1 * cy
        transform = np.asarray(
            [[a0, a1, a2, b0, b1, b2, 0.0, 0.0]], np.float32)
        want = tf.raw_ops.ImageProjectiveTransformV3(
            images=img[None], transforms=transform, output_shape=[H, W],
            fill_value=0.0, interpolation="BILINEAR",
            fill_mode="CONSTANT").numpy()[0]
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"s={s} deg={deg} flip={flip}")


def test_augment_batch_shapes():
    B = 4
    key = jax.random.PRNGKey(7)
    imgs = jax.random.uniform(jax.random.PRNGKey(8), (B, 128, 128, 3))
    kx = jax.random.uniform(jax.random.PRNGKey(9), (B, 17)) * 64
    ky = jax.random.uniform(jax.random.PRNGKey(10), (B, 17)) * 64
    kv = jnp.full((B, 17), 2)
    out_imgs, ox, oy, ov = augment.augment_batch(key, imgs, kx, ky, kv)
    assert out_imgs.shape == imgs.shape
    assert ox.shape == (B, 17) and oy.shape == (B, 17) and ov.shape == (B, 17)
    # per-example keys -> examples augmented differently
    assert not np.allclose(np.asarray(out_imgs[0]), np.asarray(out_imgs[1]))
