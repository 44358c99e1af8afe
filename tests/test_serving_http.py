"""HTTP serving layer: stdlib front end over the micro-batching PoseServer.

The reference has no network serving at all (its closest analog is the
Colab webcam loop, utilities/javascript_utils.py); serving_http is the
production-shaped boundary. These tests run the real HTTP stack over
loopback: JPEG and raw-array uploads, pixel-unit mapping, concurrent
clients coalescing into micro-batches, error paths, and health/stats.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from single_person_pose_estimation_tpu.data.images import encode_jpeg
from single_person_pose_estimation_tpu.models.hourglass import StackedHourglass
from single_person_pose_estimation_tpu.serving import PoseServer
from single_person_pose_estimation_tpu.serving_http import HttpPoseService

H = W = 64


@pytest.fixture(scope="module")
def service():
    model = StackedHourglass(num_stacks=1, num_channels=16)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, H, W, 3)), train=False)
    server = PoseServer(model, variables["params"],
                        variables["batch_stats"], buckets=(1, 4),
                        use_fused=False, transfer_dtype="float32")
    svc = HttpPoseService(server, input_size=(H, W))
    port = svc.start(port=0)
    yield svc, server, port
    svc.close()
    server.close()


def _post(port, path, body, headers):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz_and_stats(service):
    _, _, port = service
    status, body = _get(port, "/healthz")
    assert status == 200 and body == {"status": "ok"}
    status, body = _get(port, "/stats")
    assert status == 200 and "served" in body and "avg_batch" in body


def test_predict_jpeg_roundtrip(service):
    svc, server, port = service
    img = np.full((H, W, 3), 128, np.uint8)
    out = _post(port, "/predict", encode_jpeg(img),
                {"Content-Type": "image/jpeg"})
    assert out["units"] == "pixels"
    assert out["image_size"] == [H, W]
    kps = np.asarray(out["keypoints"])
    assert kps.shape == (17, 3)
    # pixel units: coordinates within the uploaded image's bounds
    assert (kps[:, 0] >= 0).all() and (kps[:, 0] <= W).all()


def test_predict_matches_direct_submit(service):
    """The HTTP path must return exactly what a direct submit decodes
    (modulo the heatmap->pixel scaling it applies)."""
    svc, server, port = service
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    out = _post(port, "/predict", img.tobytes(),
                {"Content-Type": "application/octet-stream",
                 "X-Shape": f"{H},{W},3"})
    direct = np.asarray(server.submit(img).result(), np.float64)
    got = np.asarray(out["keypoints"])
    hm = H // 4
    np.testing.assert_allclose(got[:, 0], direct[:, 0] / hm * W, atol=1e-6)
    np.testing.assert_allclose(got[:, 1], direct[:, 1] / hm * H, atol=1e-6)
    np.testing.assert_allclose(got[:, 2], direct[:, 2], atol=1e-6)


def test_jpeg_resized_to_model_input(service):
    """An upload at a different resolution is resized for the model and
    the keypoints come back in the ORIGINAL image's pixel frame."""
    _, _, port = service
    img = np.full((2 * H, 2 * W, 3), 90, np.uint8)
    out = _post(port, "/predict", encode_jpeg(img),
                {"Content-Type": "image/jpeg"})
    assert out["image_size"] == [2 * H, 2 * W]
    kps = np.asarray(out["keypoints"])
    assert (kps[:, 0] <= 2 * W).all() and (kps[:, 1] <= 2 * H).all()


def test_concurrent_clients_batch(service):
    """N concurrent HTTP clients must all resolve (their submissions
    coalesce into micro-batches underneath)."""
    svc, server, port = service
    before = server.stats()["served"]
    imgs = [np.random.default_rng(i).uniform(0, 1, (H, W, 3))
            .astype(np.float32) for i in range(8)]
    results = [None] * len(imgs)

    def call(i):
        results[i] = _post(port, "/predict", imgs[i].tobytes(),
                           {"Content-Type": "application/octet-stream",
                            "X-Shape": f"{H},{W},3"})

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None and len(r["keypoints"]) == 17 for r in results)
    assert server.stats()["served"] >= before + len(imgs)


def test_bad_input_is_400_not_crash(service):
    _, _, port = service
    for body, headers in [
        (b"not a jpeg", {"Content-Type": "image/jpeg"}),
        (b"\x00" * 10, {"Content-Type": "application/octet-stream",
                        "X-Shape": "4,4"}),          # bad shape header
        (np.full((4, 4, 3), np.nan, np.float32).tobytes(),
         {"Content-Type": "application/octet-stream", "X-Shape": "4,4,3"}),
        (np.zeros((4, 4, 3), np.float32).tobytes(),
         {"Content-Type": "application/octet-stream",
          "X-Shape": "-1,4,3"}),                     # reshape must not infer
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(port, "/predict", body, headers)
        assert exc.value.code == 400
        assert "error" in json.loads(exc.value.read())
    # server still healthy afterwards
    status, _ = _get(port, "/healthz")
    assert status == 200


def test_unknown_route_404(service):
    _, _, port = service
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(port, "/nope")
    assert exc.value.code == 404


def test_bad_units_rejected():
    with pytest.raises(ValueError, match="units"):
        HttpPoseService(object(), units="degrees")
