"""Pallas kernels vs their XLA reference implementations (interpreter mode
on CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu.ops.decode import decode_batch
from single_person_pose_estimation_tpu.ops.heatmap import render_heatmaps_batch
from single_person_pose_estimation_tpu.ops.pallas.decode_kernel import (
    decode_batch_pallas,
)
from single_person_pose_estimation_tpu.ops.pallas.heatmap_kernel import (
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
