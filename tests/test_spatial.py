"""Spatial (H-sharded) parallelism: halo-exchange conv equivalence tests
on the spoofed 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu.parallel import mesh as mesh_lib
from single_person_pose_estimation_tpu.parallel import spatial


@pytest.fixture(scope="module")
def smesh():
    return mesh_lib.create_mesh((8,), ("spatial",))


def reference_conv(x, kernel, bias):
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


def test_conv3x3_spatial_matches_unsharded(smesh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 32, 8)).astype(np.float32))
    k = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, 8, 16)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-0.1, 0.1, (16,)).astype(np.float32))

    want = np.asarray(reference_conv(x, k, b))
    xs = spatial.shard_spatial(x, smesh)
    got = np.asarray(spatial.conv3x3_spatial(xs, k, b, smesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_output_stays_sharded(smesh):
    x = spatial.shard_spatial(jnp.ones((1, 64, 32, 4)), smesh)
    k = jnp.ones((3, 3, 4, 4)) * 0.1
    out = spatial.conv3x3_spatial(x, k, None, smesh)
    assert out.sharding.spec == jax.sharding.PartitionSpec(
        None, "spatial", None, None)
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(1, 8, 32, 4)}


def test_boundary_rows_zero_padded(smesh):
    """Global SAME zero padding: top/bottom output rows must match the
    unsharded conv (edge shards receive zero halos, not garbage)."""
    x = jnp.ones((1, 64, 16, 2))
    k = jnp.ones((3, 3, 2, 1))
    want = np.asarray(reference_conv(x, k, jnp.zeros((1,))))
    got = np.asarray(spatial.conv3x3_spatial(
        spatial.shard_spatial(x, smesh), k, jnp.zeros((1,)), smesh))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # interior row sums 3*3*2=18; edge rows 2*3*2=12
    assert got[0, 0, 5, 0] == pytest.approx(12.0)
    assert got[0, 31, 5, 0] == pytest.approx(18.0)


def test_pool_and_upsample_spatial(smesh):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 16, 4)).astype(np.float32))
    xs = spatial.shard_spatial(x, smesh)

    pooled = spatial.maxpool2x2_spatial(xs, smesh)
    want_pool = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(want_pool),
                               atol=1e-6)

    up = spatial.upsample2x_spatial(pooled, smesh)
    assert up.shape == (2, 64, 16, 4)
    # nearest upsample of the pooled map
    np.testing.assert_allclose(
        np.asarray(up)[0, 0, 0], np.asarray(pooled)[0, 0, 0], atol=1e-6)


def test_chained_conv_pool_conv(smesh):
    """A small sharded pipeline (conv -> pool -> conv) equals unsharded."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 16, 4)).astype(np.float32))
    k1 = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 4, 8)).astype(np.float32))
    k2 = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 8, 8)).astype(np.float32))
    zero8 = jnp.zeros((8,))

    ref = reference_conv(x, k1, zero8)
    ref = jax.lax.reduce_window(ref, -jnp.inf, jax.lax.max,
                                (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    ref = reference_conv(ref, k2, zero8)

    xs = spatial.shard_spatial(x, smesh)
    out = spatial.conv3x3_spatial(xs, k1, zero8, smesh)
    out = spatial.maxpool2x2_spatial(out, smesh)
    out = spatial.conv3x3_spatial(out, k2, zero8, smesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
