"""Statistical equivalence of the on-device augmentation parameter sampling.

PARITY.md deviation #2 claims the rebuilt augmentation is *statistically
equivalent* to the reference's imgaug path (dataset_builder.py:154-199):
flip probability 0.5, affine scale U(0.75, 1.25), rotation U(-30, 30) deg,
sampled independently per example. These tests pin that claim with
empirical distributions rather than leaving it as prose: Kolmogorov-
Smirnov distance against the exact uniform CDF, moment checks, and
per-example independence across a batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu.ops import augment

N = 8192
# KS critical value at alpha=1e-6 for N samples: sqrt(ln(2/alpha)/(2N)).
_KS_BOUND = float(np.sqrt(np.log(2 / 1e-6) / (2 * N)))


@pytest.fixture(scope="module")
def sampled_params():
    keys = jax.random.split(jax.random.PRNGKey(20260819), N)
    s, theta, flip = jax.vmap(
        lambda k: augment._affine_params(k, 0.75, 1.25, 30.0))(keys)
    return (np.asarray(s), np.asarray(theta), np.asarray(flip))


def _ks_uniform(samples, lo, hi):
    """KS distance of `samples` from U(lo, hi)."""
    x = np.sort((samples - lo) / (hi - lo))
    n = len(x)
    cdf_hi = np.arange(1, n + 1) / n
    cdf_lo = np.arange(0, n) / n
    return max(np.max(cdf_hi - x), np.max(x - cdf_lo))


def test_scale_uniform_over_imgaug_range(sampled_params):
    s, _, _ = sampled_params
    assert s.min() >= 0.75 and s.max() <= 1.25
    assert abs(s.mean() - 1.0) < 0.01
    assert _ks_uniform(s, 0.75, 1.25) < _KS_BOUND


def test_rotation_uniform_over_imgaug_range(sampled_params):
    _, theta, _ = sampled_params
    deg = theta * 180.0 / np.pi
    assert deg.min() >= -30.0 and deg.max() <= 30.0
    assert abs(deg.mean()) < 0.5
    assert _ks_uniform(deg, -30.0, 30.0) < _KS_BOUND


def test_flip_probability_half(sampled_params):
    _, _, flip = sampled_params
    p = flip.astype(np.float64).mean()
    # 6-sigma binomial band around 0.5 for N samples.
    assert abs(p - 0.5) < 6 * 0.5 / np.sqrt(N)


def test_params_independent_per_example():
    """augment_batch must draw distinct per-example parameters (the
    reference reseeds a GLOBAL imgaug RNG per call — a data race we
    replace with split per-example keys), and the same key must
    reproduce the same batch."""
    B = 32
    key = jax.random.PRNGKey(7)
    images = jnp.linspace(0, 1, B * 16 * 16 * 3).reshape(B, 16, 16, 3)
    kx = jnp.tile(jnp.linspace(5, 60, 17)[None], (B, 1))
    ky = jnp.tile(jnp.linspace(60, 5, 17)[None], (B, 1))
    kv = jnp.full((B, 17), 2, jnp.int32)
    img1, ox1, oy1, _ = augment.augment_batch(key, images, kx, ky, kv)
    img2, ox2, oy2, _ = augment.augment_batch(key, images, kx, ky, kv)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    np.testing.assert_array_equal(np.asarray(ox1), np.asarray(ox2))
    # Identical inputs per example, so identical outputs would mean the
    # examples shared one parameter draw; require near-total diversity.
    unique_rows = {np.asarray(ox1)[b].tobytes() for b in range(B)}
    assert len(unique_rows) >= B - 1  # allow one coincidental flip-only tie


def test_keypoint_and_image_transforms_agree_statistically():
    """A bright dot warped through the image path must land where the
    keypoint path says (up to bilinear support), across many draws —
    ties the two independently-implemented transforms together."""
    H = W = 64  # run in heatmap space so both paths share one geometry
    keys = jax.random.split(jax.random.PRNGKey(3), 24)
    for key in keys:
        s, theta, flip = augment._affine_params(key, 0.75, 1.25, 30.0)
        image = jnp.zeros((H, W, 1)).at[40, 22, 0].set(1.0)
        out = augment._warp_image(image, s, theta, flip)
        ox, oy, _ = augment._transform_keypoints(
            jnp.array([22.0]), jnp.array([40.0]), jnp.array([2]),
            s, theta, flip, H, augment._flip_permutation(1, ()))
        x, y = float(ox[0]), float(oy[0])
        if not (1 <= x < W - 2 and 1 <= y < H - 2):
            continue  # warped out of frame: nothing to locate
        peak = jnp.argmax(out[..., 0])
        py, px = np.unravel_index(int(peak), (H, W))
        # Bilinear spreads the dot over a (1/s)-scaled 2x2 support.
        assert abs(px - x) <= 2.0 and abs(py - y) <= 2.0
