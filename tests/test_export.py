"""Export artifact round-trip, jax2tf SavedModel parity, profiling utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.training import steps as steps_lib
from single_person_pose_estimation_tpu.utils import export, profiling


CFG = Config().replace(image_height=64, image_width=64,
                       label_height=16, label_width=16,
                       hg_num_stacks=1, hg_num_channels=16,
                       compute_dtype="float32")


def make_state():
    model = StackedHourglass(num_stacks=1, num_channels=16)
    tx = steps_lib.make_optimizer(1e-3)
    return model, steps_lib.TrainState.create(
        model, tx, jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))


def test_artifact_round_trip(tmp_path):
    model, state = make_state()
    path = str(tmp_path / "artifact")
    export.save_inference_artifact(CFG, state.params, state.batch_stats, path)
    assert os.path.exists(os.path.join(path, "config.json"))

    model2, variables, predict = export.load_inference_artifact(path)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    want = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats}, x, train=False)[-1]
    got = predict(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_savedmodel_export_parity(tmp_path):
    tf = pytest.importorskip("tensorflow")
    model, state = make_state()
    path = str(tmp_path / "savedmodel")
    export.export_savedmodel(CFG, state.params, state.batch_stats, path,
                             batch_size=2)
    loaded = tf.saved_model.load(path)
    x = np.random.default_rng(2).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(loaded.f(tf.constant(x)))
    want = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False)[-1])
    np.testing.assert_allclose(got, want, atol=1e-5)


def _tflite_run(tf, path, x):
    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    inp = interp.get_input_details()[0]
    out = interp.get_output_details()[0]
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    return interp.get_tensor(out["index"])


def test_tflite_export_parity_mobile(tmp_path):
    """TFLite export of the mobile variant (its edge-deployment target):
    the flatbuffer's output matches the flax model on the same weights."""
    tf = pytest.importorskip("tensorflow")
    cfg = CFG.replace(mobile=True)
    model = StackedHourglass(num_stacks=1, num_channels=16, mobile=True)
    tx = steps_lib.make_optimizer(1e-3)
    state = steps_lib.TrainState.create(
        model, tx, jax.random.PRNGKey(5), input_shape=(1, 64, 64, 3))
    path = str(tmp_path / "model.tflite")
    size = export.export_tflite(cfg, state.params, state.batch_stats, path,
                                batch_size=1)
    assert size == os.path.getsize(path) > 0
    x = np.random.default_rng(6).uniform(0, 1, (1, 64, 64, 3)).astype(
        np.float32)
    got = _tflite_run(tf, path, x)
    want = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False)[-1])
    assert got.shape == want.shape == (1, 16, 16, 17)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_tflite_export_quantized(tmp_path):
    """Dynamic-range quantization shrinks the flatbuffer and stays within
    a loose band of the float answer (sigmoid heads bound outputs to
    [0, 1], so an absolute tolerance is meaningful)."""
    tf = pytest.importorskip("tensorflow")
    model, state = make_state()
    f32_path = str(tmp_path / "f32.tflite")
    dyn_path = str(tmp_path / "dyn.tflite")
    f32_size = export.export_tflite(CFG, state.params, state.batch_stats,
                                    f32_path)
    dyn_size = export.export_tflite(CFG, state.params, state.batch_stats,
                                    dyn_path, quantize="dynamic")
    # int8 weights drop ~3 bytes/param, but the converter only quantizes
    # tensors with >= 1024 elements (its min_elements default) and at this
    # toy scale flatbuffer graph overhead dominates total size — so assert
    # against the expected shrink of the quantizable weights themselves.
    quantizable = 4 * sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
        if np.prod(p.shape) >= 1024)
    assert f32_size - dyn_size > 0.5 * 0.75 * quantizable
    x = np.random.default_rng(7).uniform(0, 1, (1, 64, 64, 3)).astype(
        np.float32)
    got = _tflite_run(tf, dyn_path, x)
    want = _tflite_run(tf, f32_path, x)
    assert np.abs(got - want).max() < 0.1
    # untrained 1-stack heads hover near 0.5; make the check non-vacuous
    assert np.abs(got - want).max() < np.abs(want).max()


def test_tflite_export_int8_calibrated(tmp_path):
    """Full-integer quantization with representative-image calibration:
    converts, runs, and stays within an int8 band of the float answer
    (float I/O boundary keeps the caller interface unchanged)."""
    tf = pytest.importorskip("tensorflow")
    model, state = make_state()
    path = str(tmp_path / "int8.tflite")
    rng = np.random.default_rng(8)
    export.export_tflite(
        CFG, state.params, state.batch_stats, path, quantize="int8",
        representative_images=(
            rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
            for _ in range(4)))
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    got = _tflite_run(tf, path, x)
    want = np.asarray(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False)[-1])
    assert np.abs(got - want).max() < 0.1


def test_tflite_export_validation(tmp_path):
    _, state = make_state()
    with pytest.raises(ValueError, match="quantize"):
        export.export_tflite(CFG, state.params, state.batch_stats,
                             str(tmp_path / "x.tflite"), quantize="bogus")
    with pytest.raises(ValueError, match="representative"):
        export.export_tflite(CFG, state.params, state.batch_stats,
                             str(tmp_path / "x.tflite"), quantize="int8")


def test_step_timer():
    import time
    t = profiling.StepTimer(window=10)
    t.tick(4)           # arrival
    t.tick(4)           # first interval = compile, dropped
    for _ in range(5):
        time.sleep(0.01)
        t.tick(4)
    s = t.summary()
    assert s["mean_step_s"] >= 0.009
    assert s["items_per_sec"] > 0
    assert set(s) == {"mean_step_s", "p50_step_s", "p90_step_s",
                      "items_per_sec"}


def test_trace_context(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        with profiling.annotate("unit-test-span"):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
    # a trace directory with at least one event file must exist
    found = any(files for _, _, files in os.walk(d))
    assert found


def test_artifact_round_trip_mobile(tmp_path):
    """The Orbax inference artifact must rebuild the MOBILE variant from
    its saved config (mobile=True) — a wrong model family would fail
    structurally or numerically on restore."""
    cfg = CFG.replace(mobile=True)
    model = StackedHourglass(num_stacks=1, num_channels=16, mobile=True)
    tx = steps_lib.make_optimizer(1e-3)
    state = steps_lib.TrainState.create(
        model, tx, jax.random.PRNGKey(3), input_shape=(1, 64, 64, 3))
    path = str(tmp_path / "artifact_mobile")
    export.save_inference_artifact(cfg, state.params, state.batch_stats,
                                   path)
    model2, variables, predict = export.load_inference_artifact(path)
    assert getattr(model2, "mobile", False) is True
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    want = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats}, x,
                       train=False)[-1]
    np.testing.assert_allclose(np.asarray(predict(x)), np.asarray(want),
                               atol=1e-6)
