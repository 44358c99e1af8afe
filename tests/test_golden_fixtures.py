"""TF-free numeric parity regression against committed golden fixtures.

The fixtures (tests/fixtures/golden_ref_*.npz) hold reference-model
heatmap outputs + imported flax variables, generated from the reference's
own source by tests/gen_golden_fixtures.py. This pins parity for future
rounds even in environments without TensorFlow (VERDICT.md Next #9).
"""

import glob
import os

import numpy as np
import pytest

from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures")
GOLDEN = sorted(glob.glob(os.path.join(FIXTURES, "golden_ref_*.npz")))


def unflatten_variables(data):
    from flax.traverse_util import unflatten_dict

    import jax.numpy as jnp

    flat = {
        tuple(k[len("var/"):].split("/")): jnp.asarray(v)
        for k, v in data.items() if k.startswith("var/")
    }
    return unflatten_dict(flat)


@pytest.mark.parametrize(
    "path", GOLDEN, ids=[os.path.basename(p) for p in GOLDEN])
def test_golden_reference_parity(path):
    data = dict(np.load(path))
    stacks, channels, size, mobile = (int(v) for v in data["meta"])
    variables = unflatten_variables(data)
    model = StackedHourglass(num_stacks=stacks, num_channels=channels,
                             mobile=bool(mobile))
    outs = model.apply(variables, data["x"], train=False)
    assert len(outs) == stacks
    for i in range(stacks):
        golden = data[f"ref_out_{i}"]
        assert golden.std() > 0.01  # non-vacuous fixture
        np.testing.assert_allclose(
            np.asarray(outs[i]), golden, atol=1e-4,
            err_msg=f"{os.path.basename(path)} stack {i} diverges from "
                    "recorded reference output")


def test_golden_fixtures_exist():
    assert GOLDEN, "no golden fixtures committed under tests/fixtures/"


@pytest.mark.parametrize(
    "path", [p for p in GOLDEN if "mobile" not in p],
    ids=[os.path.basename(p) for p in GOLDEN if "mobile" not in p])
def test_golden_reference_parity_fused_path(path):
    """The Pallas-fused inference path must ALSO match the recorded
    reference outputs — kernel-level parity, not just flax parity
    (interpreter-mode kernels; non-mobile fixtures only)."""
    from single_person_pose_estimation_tpu.models.fused_inference import (
        fused_apply,
    )

    import jax.numpy as jnp

    data = dict(np.load(path))
    stacks, channels, size, mobile = (int(v) for v in data["meta"])
    variables = unflatten_variables(data)
    outs = fused_apply(variables, jnp.asarray(data["x"]),
                       num_stacks=stacks, compute_dtype=jnp.float32,
                       interpret=True, fuse_levels=True,
                       pool_fuse_max_h=size // 8, fuse_heads=True)
    for i in range(stacks):
        np.testing.assert_allclose(
            np.asarray(outs[i]), data[f"ref_out_{i}"], atol=1e-4,
            err_msg=f"fused path diverges from reference, stack {i}")
