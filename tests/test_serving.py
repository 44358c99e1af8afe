"""PoseServer: micro-batching queue, bucket padding, decode equality,
concurrency, shutdown."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.serving import PoseServer


@pytest.fixture(scope="module")
def served():
    model = StackedHourglass(num_stacks=1, num_channels=16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    server = PoseServer(model, variables["params"],
                        variables["batch_stats"],
                        buckets=(1, 2, 4), max_wait_s=0.01,
                        use_fused=False, transfer_dtype="float32")
    server.warmup(image_shape=(64, 64, 3))
    yield model, variables, server
    server.close()


def _direct(model, variables, images):
    from single_person_pose_estimation_tpu.ops.decode import _decode_v2
    hms = model.apply(variables, images, train=False)[-1]
    return np.asarray(jax.vmap(
        lambda h: _decode_v2(h, conf_threshold=1e-6, legacy=True))(hms))


def test_single_request_matches_direct(served):
    model, variables, server = served
    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (64, 64, 3)))
    got = server.submit(img).result(timeout=60)
    want = _direct(model, variables, img[None])[0]
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (17, 3)


def test_batch_pads_to_bucket_and_matches(served):
    model, variables, server = served
    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (3, 64, 64, 3)))
    got = server.predict(imgs)  # 3 requests -> bucket 4 (padded)
    want = _direct(model, variables, imgs)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_concurrent_submitters(served):
    model, variables, server = served
    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (8, 64, 64, 3)))
    want = _direct(model, variables, imgs)
    results = [None] * 8

    def worker(i):
        results[i] = server.submit(imgs[i]).result(timeout=60)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(8):
        np.testing.assert_allclose(results[i], want[i], atol=1e-5,
                                   err_msg=f"request {i}")
    stats = server.stats()
    assert stats["served"] >= 12
    assert stats["latency_p50_ms"] is not None
    assert stats["avg_batch"] >= 1.0


def test_close_rejects_new_requests(served):
    model = StackedHourglass(num_stacks=1, num_channels=16)
    variables = model.init(jax.random.PRNGKey(4),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    server = PoseServer(model, variables["params"],
                        variables["batch_stats"], buckets=(1, 2),
                        use_fused=False, transfer_dtype="float32")
    img = np.zeros((64, 64, 3), np.float32)
    fut = server.submit(img)
    fut.result(timeout=60)
    server.close()
    server.close()  # idempotent
    with pytest.raises(RuntimeError):
        server.submit(img)


def test_close_fails_requests_racing_past_the_sentinel():
    """A submit() that passes the _closed check concurrently with close()
    can enqueue BEHIND the shutdown sentinel; close() must fail its future
    rather than leave the caller blocked forever."""
    model = StackedHourglass(num_stacks=1, num_channels=16)
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    server = PoseServer(model, variables["params"],
                        variables["batch_stats"], buckets=(1, 2),
                        use_fused=False, transfer_dtype="float32")
    # Simulate the race deterministically: retire the batcher as if it had
    # consumed close()'s sentinel, THEN let a straggler submit slip in
    # (_closed is still False, so the check passes — the real interleaving).
    server._queue.put(None)
    server._thread.join()
    fut = server.submit(np.zeros((64, 64, 3), np.float32))
    server.close()
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=10)


def test_bad_bucket_config():
    model = StackedHourglass(num_stacks=1, num_channels=16)
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError, match="ascending"):
        PoseServer(model, variables["params"], variables["batch_stats"],
                   buckets=(4, 2), use_fused=False)


def test_uint8_transfer_matches_quantized_direct(served):
    """transfer_dtype='uint8' must equal a direct forward on the
    host-quantized image (the wire format is the only difference)."""
    model, variables, _ = served
    server = PoseServer(model, variables["params"],
                        variables["batch_stats"], buckets=(1,),
                        use_fused=False, transfer_dtype="uint8")
    try:
        img = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(9), (64, 64, 3)))
        got = server.submit(img).result(timeout=60)
        q = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
        want = _direct(model, variables,
                       (q.astype(np.float32) / 255.0)[None])[0]
        np.testing.assert_allclose(got, want, atol=1e-5)
    finally:
        server.close()


def test_bad_transfer_dtype():
    model = StackedHourglass(num_stacks=1, num_channels=16)
    variables = model.init(jax.random.PRNGKey(6),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError, match="transfer_dtype"):
        PoseServer(model, variables["params"], variables["batch_stats"],
                   use_fused=False, transfer_dtype="int4")


def test_mesh_sharded_server():
    """PoseServer with a data-axis mesh: batches are sharded over the
    8-device CPU mesh and results still match the direct forward."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8]) if len(jax.devices()) >= 8 else None
    if devices is None:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(devices, ("data",))
    model = StackedHourglass(num_stacks=1, num_channels=16)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    server = PoseServer(model, variables["params"],
                        variables["batch_stats"], buckets=(8,),
                        max_wait_s=0.05, use_fused=False,
                        transfer_dtype="float32", mesh=mesh)
    try:
        server.warmup(image_shape=(64, 64, 3))
        imgs = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(8), (8, 64, 64, 3)))
        got = server.predict(imgs)
        want = _direct(model, variables, imgs)
        np.testing.assert_allclose(got, want, atol=1e-5)
    finally:
        server.close()


def test_mesh_server_rounds_buckets_and_pads():
    """Buckets indivisible by the data-axis size are rounded up at
    construction (ADVICE r2: (1, 4, 16, 64) over 8 devices would crash at
    warmup otherwise), and a partial batch pads+shards correctly."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    model = StackedHourglass(num_stacks=1, num_channels=16)
    variables = model.init(jax.random.PRNGKey(9),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    server = PoseServer(model, variables["params"],
                        variables["batch_stats"], buckets=(1, 4, 16, 64),
                        max_wait_s=0.02, use_fused=False,
                        transfer_dtype="float32", mesh=mesh)
    try:
        assert server._buckets == (8, 16, 64)
        server.warmup(image_shape=(64, 64, 3))
        imgs = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(10), (3, 64, 64, 3)))
        got = server.predict(imgs)  # 3 requests -> bucket 8, sharded
        want = _direct(model, variables, imgs)
        np.testing.assert_allclose(got, want, atol=1e-5)
    finally:
        server.close()


def test_mobile_fused_server_matches_direct():
    """A mobile model with use_fused=True routes the mobile Pallas kernels
    (interpret mode here) and must decode the same keypoints as the flax
    forward. Pins the serving.PoseServer mobile auto-routing added in
    round 3 (+52% over XLA on the v5e, scripts/bench_mobile_fused.py)."""
    model = StackedHourglass(num_stacks=1, num_channels=16, mobile=True,
                             compute_dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    server = PoseServer(model, variables["params"],
                        variables["batch_stats"],
                        buckets=(1, 2), max_wait_s=0.01,
                        use_fused=True, interpret=True,
                        transfer_dtype="float32")
    try:
        img = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(6), (64, 64, 3)))
        got = server.submit(img).result(timeout=300)
        want = _direct(model, variables, img[None])[0]
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        server.close()
