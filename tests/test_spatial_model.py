"""End-to-end spatially-sharded hourglass vs the unsharded model
(VERDICT.md Next #8) on the spoofed 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.parallel import mesh as mesh_lib
from single_person_pose_estimation_tpu.parallel.spatial import conv_spatial
from single_person_pose_estimation_tpu.parallel.spatial_model import (
    spatial_apply,
)


def spatial_mesh():
    return mesh_lib.create_mesh((8,), ("spatial",))


def test_conv7x7_stride2_spatial_matches_unsharded():
    """The front's 7x7/s2 conv: halo size 3, stride-aligned offset."""
    mesh = spatial_mesh()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    k = jnp.asarray(rng.uniform(-0.2, 0.2, (7, 7, 3, 8)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-0.1, 0.1, (8,)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = conv_spatial(x, k, b, mesh, "spatial", stride=2)
    assert got.shape == want.shape == (2, 64, 64, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_spatial_apply_matches_unsharded_512():
    """Full 512x512 hourglass forward, H sharded 8-way above gather_h=64,
    replicated below — must match model.apply to float tolerance."""
    model = StackedHourglass(num_stacks=1, num_channels=16,
                             compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 512, 512, 3)), train=False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 512, 3))

    want = model.apply(variables, x, train=False)
    got = spatial_apply(variables, x, spatial_mesh(), num_stacks=1,
                        gather_h=64)
    assert len(got) == len(want) == 1
    assert got[0].shape == want[0].shape
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               atol=1e-4)


def test_spatial_apply_multi_stack_low_gather():
    """Two stacks at 256^2 with a low gather threshold exercises the
    re-shard on the decoder path (upsample crossing gather_h upward)."""
    model = StackedHourglass(num_stacks=2, num_channels=16,
                             compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 256, 256, 3)), train=False)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 256, 256, 3))

    want = model.apply(variables, x, train=False)
    got = spatial_apply(variables, x, spatial_mesh(), num_stacks=2,
                        gather_h=32)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
