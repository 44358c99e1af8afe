"""Numeric parity against the reference's OWN model source.

Round-1 parity was proven only against a hand-rewritten Keras twin
(tests/keras_oracle.py) at toy geometry (VERDICT.md Missing #2): a shared
misreading of the reference would pass silently. Here the oracle is the
reference file itself — /root/reference/model/hourglass.py:5
`create_hourglass_model` imported directly — and the check runs at the
published flagship geometry (4 stacks / 256 channels @ 256x256,
Train.ipynb cell 10).

The only accommodation is a one-line Keras-2 shim (`K.int_shape`, used at
reference hourglass.py:190,215, removed in Keras 3).
"""

import os
import sys

import numpy as np
import pytest

pytest.importorskip("tensorflow")

REFERENCE = "/root/reference"
if not os.path.isdir(os.path.join(REFERENCE, "model")):
    pytest.skip("reference checkout not available", allow_module_level=True)

from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.utils import weight_import

from keras_oracle import randomize_keras_weights_scaled


def _reference_create_hourglass():
    """Import create_hourglass_model from the reference source (test-only
    oracle usage; the product code shares nothing with it)."""
    import keras.backend as K

    if not hasattr(K, "int_shape"):  # removed in Keras 3
        K.int_shape = lambda x: tuple(x.shape)
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.hourglass import create_hourglass_model

    return create_hourglass_model


def _parity_case(num_stacks, num_channels, input_size, seed, batch=1,
                 mobile=False, atol=1e-4):
    create = _reference_create_hourglass()
    ref_model = create(17, num_stacks, num_channels,
                       input_shape=(input_size, input_size, 3),
                       predict_activation="sigmoid", mobile=mobile)
    randomize_keras_weights_scaled(ref_model, seed=seed)

    variables = weight_import.keras_to_flax_variables(ref_model)
    flax_model = StackedHourglass(num_stacks=num_stacks,
                                  num_channels=num_channels, mobile=mobile)
    ok, msg = weight_import.validate_import(
        variables, flax_model,
        input_shape=(1, input_size, input_size, 3))
    assert ok, msg

    rng = np.random.default_rng(seed + 1)
    x = rng.uniform(0, 1, (batch, input_size, input_size, 3)).astype(
        np.float32)
    ref_out = ref_model.predict(x, verbose=0)
    if num_stacks == 1:
        ref_out = [ref_out]
    flax_out = flax_model.apply(variables, x, train=False)
    for i, (a, b) in enumerate(zip(ref_out, flax_out)):
        a, b = np.asarray(a), np.asarray(b)
        # Guard against the saturation failure mode: a comparison where
        # the reference output is ~constant proves nothing.
        assert a.std() > 0.01, f"stack {i}: oracle output saturated"
        np.testing.assert_allclose(
            a, b, atol=atol,
            err_msg=f"stack {i} heatmaps diverge from reference source")
    return ref_model


def test_parity_vs_reference_source_small():
    """Fast cross-check at the geometry round 1 used."""
    _parity_case(num_stacks=2, num_channels=32, input_size=64, seed=7,
                 batch=2)


def test_parity_vs_reference_source_mobile():
    """SeparableConv2D mapping against the reference's mobile variant."""
    _parity_case(num_stacks=1, num_channels=32, input_size=64, seed=8,
                 batch=2, mobile=True)


def test_parity_vs_reference_source_s4_flagship():
    """Flagship S4/256 @ 256x256 — the published best config
    (S4_E120_Adam_IOU, Train.ipynb cell 10), param count pinned."""
    ref_model = _parity_case(num_stacks=4, num_channels=256, input_size=256,
                             seed=11, batch=1)
    assert ref_model.count_params() == 13_784_260
