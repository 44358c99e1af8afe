"""Multi-chip tests on the spoofed 8-device CPU mesh: mesh construction,
batch sharding, data-parallel train/eval step equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu import losses
from single_person_pose_estimation_tpu.configs.default_config import Config
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.parallel import mesh as mesh_lib
from single_person_pose_estimation_tpu.training import steps


TINY = Config().replace(hg_num_stacks=2, hg_num_channels=32,
                        image_height=64, image_width=64,
                        label_height=16, label_width=16)


def tiny_model():
    return StackedHourglass(num_stacks=2, num_channels=32)


def make_batch(B, key=0):
    return {
        "image": jax.random.uniform(jax.random.PRNGKey(key), (B, 64, 64, 3)),
        "kx": jax.random.uniform(jax.random.PRNGKey(key + 1), (B, 17)) * 16,
        "ky": jax.random.uniform(jax.random.PRNGKey(key + 2), (B, 17)) * 16,
        "kv": jnp.full((B, 17), 2, jnp.int32),
    }


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest must spoof 8 CPU devices"
    mesh = mesh_lib.create_mesh((-1,), ("data",))
    assert mesh.devices.shape == (8,)
    mesh2 = mesh_lib.create_mesh((-1, 2), ("data", "model"))
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        mesh_lib.create_mesh((3,), ("data",))


def test_shard_batch_layout():
    mesh = mesh_lib.create_mesh((-1,), ("data",))
    batch = mesh_lib.shard_batch(make_batch(16), mesh)
    shard_shapes = [s.data.shape for s in batch["image"].addressable_shards]
    assert all(s == (2, 64, 64, 3) for s in shard_shapes)
    assert len(shard_shapes) == 8


def test_shard_local_batch_single_process():
    """Multi-host assembly path at process_count=1: the local batch IS the
    global batch, values and sharding must match shard_batch exactly
    (VERDICT.md Weak #7 — this seam had zero coverage)."""
    assert jax.process_count() == 1
    mesh = mesh_lib.create_mesh((-1,), ("data",))
    batch = make_batch(16)
    local = mesh_lib.shard_local_batch(batch, mesh)
    ref = mesh_lib.shard_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(local[k]),
                                      np.asarray(ref[k]))
        assert local[k].sharding == ref[k].sharding
        assert len(local[k].addressable_shards) == 8


def test_pad_batch_to_devices():
    batch, n = mesh_lib.pad_batch_to_devices(make_batch(13), 8)
    assert n == 13
    assert batch["image"].shape[0] == 16
    batch, n = mesh_lib.pad_batch_to_devices(make_batch(16), 8)
    assert n == 16 and batch["image"].shape[0] == 16


def test_train_step_runs_and_metrics():
    model = tiny_model()
    tx = steps.make_optimizer(1e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    train_step = steps.make_train_step(model, tx, losses.iou, TINY)
    state, metrics = train_step(state, make_batch(8))
    assert int(state.step) == 1
    assert set(metrics) == {"loss", "loss/hg0", "loss/hg1"}
    assert float(metrics["loss"]) == pytest.approx(
        float(metrics["loss/hg0"]) + float(metrics["loss/hg1"]), rel=1e-5)


def test_loss_decreases_over_steps():
    """Minimum end-to-end slice (SURVEY.md §7 stage 3): synthetic crops,
    MSE step, loss decreasing."""
    model = tiny_model()
    tx = steps.make_optimizer(1e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    train_step = steps.make_train_step(model, tx, losses.weighted_mse, TINY,
                                       augment=False)
    batch = make_batch(8)
    first = None
    for i in range(8):
        state, metrics = train_step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first


def test_data_parallel_matches_single_device():
    """The sharded step must compute the same update as the unsharded one
    (GSPMD all-reduce == single-device batch gradient).

    Uses SGD: with Adam, f32 reduction-order noise (~1e-7) in near-zero
    gradients flips m-hat/sqrt(v-hat) signs and shows up as +-lr param
    deltas, masking true (in)equivalence.
    """
    import optax
    model = tiny_model()
    tx = optax.sgd(0.01)
    batch = make_batch(16, key=7)

    state1 = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                     input_shape=(1, 64, 64, 3))
    step1 = steps.make_train_step(model, tx, losses.mse, TINY, augment=False)
    state1, m1 = step1(state1, batch)

    mesh = mesh_lib.create_mesh((-1,), ("data",))
    state8 = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                     input_shape=(1, 64, 64, 3))
    state8 = jax.device_put(state8, mesh_lib.replicated(mesh))
    step8 = steps.make_train_step(model, tx, losses.mse, TINY, augment=False,
                                  mesh=mesh)
    state8, m8 = step8(state8, mesh_lib.shard_batch(batch, mesh))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    p1 = jax.tree.leaves(state1.params)
    p8 = jax.tree.leaves(state8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_eval_step_sharded():
    model = tiny_model()
    tx = steps.make_optimizer(1e-3)
    mesh = mesh_lib.create_mesh((-1,), ("data",))
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    eval_step = steps.make_eval_step(model, losses.iou, TINY, mesh=mesh)
    m = eval_step(state, mesh_lib.shard_batch(make_batch(16), mesh))
    assert np.isfinite(float(m["loss"]))


def test_predict_fn_returns_last_stack():
    model = tiny_model()
    tx = steps.make_optimizer(1e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    predict = steps.make_predict_fn(model)
    out = predict(state.params, state.batch_stats,
                  jnp.zeros((4, 64, 64, 3)))
    assert out.shape == (4, 16, 16, 17)
    # must equal apply()[-1]
    ref = model.apply({"params": state.params,
                       "batch_stats": state.batch_stats},
                      jnp.zeros((4, 64, 64, 3)), train=False)[-1]
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_graft_entry_dryrun():
    """The driver's multichip dry run must work on the spoofed mesh."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_graft_entry_forward_shapes():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out_shape = jax.eval_shape(fn, *args)
    assert out_shape.shape == (8, 64, 64, 17)


def test_tensor_parallel_state_sharding():
    """TP rules shard conv output channels + channel vectors over 'model',
    replicate scalars/rng/17-channel head."""
    from single_person_pose_estimation_tpu.parallel import sharding_rules
    import optax

    model = tiny_model()
    tx = steps.make_optimizer(1e-3)
    state = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                    input_shape=(1, 64, 64, 3))
    mesh = mesh_lib.create_mesh((4, 2), ("data", "model"))
    sharded = sharding_rules.shard_state(state, mesh, "model")

    k = sharded.params["hg0_downsample_f1_conv_3x3_2"]["kernel"]
    assert k.sharding.spec == jax.sharding.PartitionSpec(
        None, None, None, "model")
    # 17-channel predict bias is not divisible by 2 -> replicated.
    b17 = sharded.params["hg0_conv_1x1_predict"]["bias"]
    assert b17.sharding.spec == jax.sharding.PartitionSpec()
    # rng and step replicated.
    assert sharded.rng.sharding.spec == jax.sharding.PartitionSpec()
    assert sharded.step.sharding.spec == jax.sharding.PartitionSpec()
    # Adam moments follow the same rule as their params.
    mu = sharded.opt_state[0].mu["hg0_downsample_f1_conv_3x3_2"]["kernel"]
    assert mu.sharding.spec == jax.sharding.PartitionSpec(
        None, None, None, "model")


def test_dp_tp_matches_single_device():
    """A dp x tp sharded SGD step computes the same update as unsharded."""
    import optax
    from single_person_pose_estimation_tpu.parallel import sharding_rules

    model = tiny_model()
    tx = optax.sgd(0.01)
    batch = make_batch(8, key=11)

    s1 = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                 input_shape=(1, 64, 64, 3))
    step1 = steps.make_train_step(model, tx, losses.mse, TINY, augment=False)
    s1, m1 = step1(s1, batch)

    mesh = mesh_lib.create_mesh((4, 2), ("data", "model"))
    s2 = steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                 input_shape=(1, 64, 64, 3))
    s2 = sharding_rules.shard_state(s2, mesh, "model")
    step2 = steps.make_train_step(model, tx, losses.mse, TINY, augment=False,
                                  mesh=mesh, model_axis="model",
                                  example_state=s2)
    s2, m2 = step2(s2, mesh_lib.shard_batch(batch, mesh))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        # TP resharding adds further f32 reduction-order noise vs pure DP.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_shard_files_for_process():
    from single_person_pose_estimation_tpu.parallel.distributed import (
        shard_files_for_process,
    )

    files = [f"file_{i:02d}-100.tfrec" for i in range(7)]
    parts = [shard_files_for_process(files, p, 3) for p in range(3)]
    # disjoint, complete, round-robin balanced within one file
    assert sorted(sum(parts, [])) == sorted(files)
    assert {len(p) for p in parts} <= {2, 3}
    assert not set(parts[0]) & set(parts[1])
    with pytest.raises(ValueError, match="cannot feed"):
        shard_files_for_process(files[:2], 0, 3)
    assert shard_files_for_process(files, 0, 1) == files


def test_aggregate_metrics_single_process_identity():
    """Single process: aggregate_metrics is the identity (the collective
    is exercised for real in the 2-process cluster test below)."""
    from single_person_pose_estimation_tpu.parallel.distributed import (
        aggregate_metrics,
    )

    m = {"val_loss": 1.25, "loss/hg0": 0.5}
    out = aggregate_metrics(m, weight=64)
    assert out == {"val_loss": 1.25, "loss/hg0": 0.5}
    assert out is not m  # a copy, safe to mutate


def test_dataset_builder_process_sharding(tmp_path):
    from test_data import make_synthetic_coco
    from single_person_pose_estimation_tpu.data import coco as coco_lib
    from single_person_pose_estimation_tpu.data import pipeline as pipe

    root = str(tmp_path / "dataset")
    make_synthetic_coco(root, "train2017", n_images=3, people_per=2)
    make_synthetic_coco(root, "val2017", n_images=2, people_per=1)
    cfg = TINY.replace(dataset_dir=root, batch_size=2,
                       num_examples_per_record=2)
    coco_lib.gen_trainval_records(cfg)
    b0 = pipe.DatasetBuilder(cfg, process_index=0, process_count=2)
    b1 = pipe.DatasetBuilder(cfg, process_index=1, process_count=2)
    assert not set(b0.train_filenames) & set(b1.train_filenames)
    assert (b0.num_train_examples + b1.num_train_examples) == 6


def _run_cluster_generation(mode, ckpt_dir):
    """Launch one 2-process localhost cluster generation; return outputs."""
    import os
    import socket
    import subprocess
    import sys

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen([sys.executable, worker, coord, str(i), "2",
                          mode, ckpt_dir],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    # The trainer leg compiles a multi-device train+eval program in TWO
    # processes sharing this host's one core — give it real headroom.
    timeout = 1500 if mode == "trainer" else 300
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} ({mode}) failed:\n{out}"
        assert f"MULTIHOST_WORKER_OK pid={i}" in out, out
    return outs


def test_two_process_localhost_cluster(tmp_path):
    """Run the multi-host path FOR REAL: a 2-process localhost CPU cluster
    (VERDICT r2 Missing #4 — jax.distributed.initialize had never executed
    with process_count > 1). Each worker gets 4 spoofed CPU devices; the
    workers assert global device discovery (8), disjoint file sharding,
    a cross-process global-batch sum (tests/_multihost_worker.py) — and
    the save->KILL->restore checkpoint lifecycle (VERDICT r3 Next #2):
    generation 1 saves a globally data-sharded tree through
    CheckpointManager and exits; a FRESH cluster generation restores it
    and verifies every shard's values."""
    ckpt_dir = str(tmp_path / "mh_ckpt")
    outs = _run_cluster_generation("main", ckpt_dir)
    for out in outs:
        assert "MULTIHOST_CKPT_MAIN_OK" in out, out
    outs = _run_cluster_generation("restore", ckpt_dir)
    for out in outs:
        assert "MULTIHOST_CKPT_RESTORE_OK" in out, out


def test_two_process_trainer_cluster(tmp_path):
    """Drive the REAL Trainer across the 2-process cluster (VERDICT r4
    Weak #4 / Next #5): each process builds Trainer over its disjoint
    shard_files (4 train + 4 valid shards, round-robin 2+2 each) and
    trains 2 epochs on the global 8-device mesh. The workers assert the
    aggregated val metric equals a single-process weighted recompute
    over the UNION of validation shards with the same state
    (tests/_multihost_worker.py::_trainer_leg); the parent asserts the
    best-promotion decision and the final param digest are IDENTICAL on
    both processes."""
    import re

    from test_data import make_synthetic_coco
    from single_person_pose_estimation_tpu.data import coco as coco_lib

    root = str(tmp_path / "dataset")
    # 8 train / 8 valid examples -> 4 shards each (2 per record), split
    # round-robin 2+2 per process; local batch 4 = local device count,
    # so every global batch is full (no padding).
    make_synthetic_coco(root, "train2017", n_images=4, people_per=2)
    make_synthetic_coco(root, "val2017", n_images=2, people_per=4)
    cfg = Config().replace(dataset_dir=root, num_examples_per_record=2)
    coco_lib.gen_trainval_records(cfg)

    outs = _run_cluster_generation("trainer", root)
    rows = []
    for out in outs:
        m = re.search(r"MULTIHOST_TRAINER pid=(\d+) best_epoch=(\d+) "
                      r"best_val=([\d.]+) agg_val=([\d.]+) "
                      r"digest=([\d.]+)", out)
        assert m, out
        rows.append(m.groups())
        assert "MULTIHOST_TRAINER_OK" in out
    assert len(rows) == 2
    (p0, e0, bv0, av0, d0), (p1, e1, bv1, av1, d1) = rows
    assert {p0, p1} == {"0", "1"}
    assert e0 == e1, "best-promotion epoch diverged across processes"
    assert bv0 == bv1, "best val_loss diverged across processes"
    assert av0 == av1, "aggregated val metric diverged across processes"
    assert d0 == d1, "final param trees diverged across processes"


# ---------------------------------------------------------------------------
# Sharded-state checkpointing (VERDICT r3 Weak #2 / Next #2): save/restore
# must round-trip mesh-placed TrainStates — DP-replicated, dp x tp sharded,
# and ACROSS topologies (sharded -> replicated and back), because a real
# resume may happen on a different mesh than the save.
# ---------------------------------------------------------------------------


def _tiny_state(tx=None):
    import optax
    model = tiny_model()
    tx = tx or optax.sgd(0.01)
    return steps.TrainState.create(model, tx, jax.random.PRNGKey(0),
                                   input_shape=(1, 64, 64, 3))


def _assert_state_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _bump(state):
    """A distinguishable variant of `state` (so restore provably loads)."""
    return jax.tree.map(
        lambda x: x + 1 if np.issubdtype(np.asarray(x).dtype, np.floating)
        else x, state)


def test_checkpoint_roundtrip_dp_replicated(tmp_path):
    """Save a DP-replicated (mesh-placed) TrainState through the real
    CheckpointManager; restore into the same sharding."""
    from single_person_pose_estimation_tpu.training.checkpoint import (
        CheckpointManager,
    )

    mesh = mesh_lib.create_mesh((-1,), ("data",))
    state = jax.device_put(_tiny_state(), mesh_lib.replicated(mesh))
    mgr = CheckpointManager(str(tmp_path / "ck"), async_checkpointing=False)
    mgr.save(1, state, {"epoch": 1})
    mgr.wait()

    abstract = _bump(state)  # same shardings, different values
    restored, meta = mgr.restore(abstract)
    assert meta["epoch"] == 1
    _assert_state_equal(restored, state)
    # Restored leaves keep the mesh placement.
    assert restored.params["front_conv_1x1_1"]["kernel"].sharding == \
        mesh_lib.replicated(mesh)
    mgr.close()


def test_checkpoint_roundtrip_dp_tp_sharded(tmp_path):
    """Save a dp x tp CHANNEL-SHARDED TrainState (params + Adam moments
    sharded over the 'model' axis); restore into (a) the same sharding,
    (b) a fully-replicated topology, and (c) save replicated -> restore
    sharded. Values must survive every leg exactly."""
    from single_person_pose_estimation_tpu.parallel import sharding_rules
    from single_person_pose_estimation_tpu.training.checkpoint import (
        CheckpointManager,
    )

    tx = steps.make_optimizer(1e-3)  # Adam: moments in the tree
    host_state = _tiny_state(tx)
    mesh = mesh_lib.create_mesh((4, 2), ("data", "model"))
    sharded = sharding_rules.shard_state(host_state, mesh, "model")
    mgr = CheckpointManager(str(tmp_path / "ck"), async_checkpointing=False)
    mgr.save(1, sharded, {"epoch": 1})
    mgr.wait()

    # (a) same dp x tp sharding.
    rest_a, _ = mgr.restore(_bump(sharded))
    _assert_state_equal(rest_a, host_state)
    k = rest_a.params["hg0_downsample_f1_conv_3x3_2"]["kernel"]
    assert k.sharding.spec == jax.sharding.PartitionSpec(
        None, None, None, "model")

    # (b) sharded checkpoint -> replicated abstract state (topology
    # change at restore time).
    repl = jax.device_put(_bump(host_state), mesh_lib.replicated(mesh))
    rest_b, _ = mgr.restore(repl)
    _assert_state_equal(rest_b, host_state)
    assert rest_b.params["hg0_downsample_f1_conv_3x3_2"]["kernel"] \
        .sharding.spec == jax.sharding.PartitionSpec()

    # (c) replicated checkpoint -> sharded abstract state.
    mgr.save(2, jax.device_put(host_state, mesh_lib.replicated(mesh)),
             {"epoch": 2})
    mgr.wait()
    rest_c, meta_c = mgr.restore(_bump(sharded))
    assert meta_c["epoch"] == 2
    _assert_state_equal(rest_c, host_state)
    assert rest_c.params["hg0_downsample_f1_conv_3x3_2"]["kernel"] \
        .sharding.spec == jax.sharding.PartitionSpec(
            None, None, None, "model")
    mgr.close()


def test_checkpoint_best_promotion_sharded(tmp_path):
    """maybe_promote_best with a mesh-placed state: best/ must track the
    lowest val_loss exactly as in the single-device path."""
    from single_person_pose_estimation_tpu.training.checkpoint import (
        CheckpointManager,
    )

    mesh = mesh_lib.create_mesh((-1,), ("data",))
    state = jax.device_put(_tiny_state(), mesh_lib.replicated(mesh))
    mgr = CheckpointManager(str(tmp_path / "ck"), async_checkpointing=False)
    assert mgr.maybe_promote_best(1.0, state, {"epoch": 1})
    better = _bump(state)
    assert mgr.maybe_promote_best(0.5, better, {"epoch": 2})
    assert not mgr.maybe_promote_best(0.7, state, {"epoch": 3})
    best, meta = mgr.restore_best(_bump(state))
    assert meta["epoch"] == 2 and meta["val_loss"] == 0.5
    _assert_state_equal(best, better)
    mgr.close()
