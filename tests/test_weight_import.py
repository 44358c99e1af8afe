"""TF->JAX weight import + end-to-end numeric parity vs Keras.

This is the BASELINE.json north-star check in miniature: with imported
reference-format weights, the flax model's heatmaps must match the Keras
model's to atol 1e-4 (SURVEY.md §6).
"""

import numpy as np
import pytest

pytest.importorskip("tensorflow")

from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.utils import weight_import

from keras_oracle import build_keras_hourglass, randomize_keras_weights


def parity_case(num_stacks, mobile, seed, input_size=64, channels=32):
    keras_model = build_keras_hourglass(
        num_stacks=num_stacks, num_channels=channels,
        input_size=input_size, mobile=mobile)
    randomize_keras_weights(keras_model, seed=seed)
    variables = weight_import.keras_to_flax_variables(keras_model)

    flax_model = StackedHourglass(num_stacks=num_stacks,
                                  num_channels=channels, mobile=mobile)
    ok, msg = weight_import.validate_import(
        variables, flax_model, input_shape=(1, input_size, input_size, 3))
    assert ok, msg

    rng = np.random.default_rng(seed + 100)
    x = rng.uniform(0, 1, (2, input_size, input_size, 3)).astype(np.float32)
    keras_out = keras_model.predict(x, verbose=0)
    if num_stacks == 1:
        keras_out = [keras_out]
    flax_out = flax_model.apply(variables, x, train=False)
    for i, (a, b) in enumerate(zip(keras_out, flax_out)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=f"stack {i} heatmaps diverge beyond atol 1e-4")


def test_parity_single_stack():
    parity_case(num_stacks=1, mobile=False, seed=0)


def test_parity_two_stacks():
    """Two stacks exercise the inter-stack residual heads."""
    parity_case(num_stacks=2, mobile=False, seed=1)


def test_parity_mobile_variant():
    parity_case(num_stacks=1, mobile=True, seed=2)


def test_round_trip_flax_to_keras():
    """flax -> keras -> flax preserves every tensor exactly."""
    keras_model = build_keras_hourglass(num_stacks=1, num_channels=32)
    randomize_keras_weights(keras_model, seed=3)
    v1 = weight_import.keras_to_flax_variables(keras_model)

    keras_model2 = build_keras_hourglass(num_stacks=1, num_channels=32)
    weight_import.flax_to_keras_weights(v1, keras_model2)
    v2 = weight_import.keras_to_flax_variables(keras_model2)

    import jax
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_validate_import_catches_missing():
    keras_model = build_keras_hourglass(num_stacks=1, num_channels=32)
    variables = weight_import.keras_to_flax_variables(keras_model)
    del variables["params"]["front_conv_1x1_1"]
    flax_model = StackedHourglass(num_stacks=1, num_channels=32)
    ok, msg = weight_import.validate_import(
        variables, flax_model, input_shape=(1, 64, 64, 3))
    assert not ok
    assert "front_conv_1x1_1" in msg
