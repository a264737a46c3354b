"""Serving layer: micro-batcher coalescing/padding/fault-tolerance and the
HTTP front-end (serve.py), exercised against a stub predictor — no device
work, so this runs in the fast gate.  The full-stack serve test (real tiny
models over HTTP) lives in test_integration.py."""

import io
import json
import threading
import time
import urllib.request
import urllib.error

import numpy as np
import pytest

from camouflage_multimodal_tpu.serve import (InferenceService, MicroBatcher,
                                             make_server)

S = 32  # stub image size


class StubPredictor:
    """Looks like api.MultimodalPredictor to InferenceService."""

    def __init__(self, batch_size_seen):
        self.batch_size_seen = batch_size_seen
        self.rg_pipeline = type("P", (), {"image_size": S})()

    def predict_batch(self, images):
        assert images.dtype == np.uint8
        B = images.shape[0]
        self.batch_size_seen.append(B)
        brightness = images.reshape(B, -1).mean(axis=1) / 255.0
        logits = np.stack([1.0 - brightness, brightness], axis=1)
        return {
            "mask_logits": logits,
            "mask_prob": logits / logits.sum(axis=1, keepdims=True),
            "instance_logits": logits.copy(),
            "instance_prob": logits / logits.sum(axis=1, keepdims=True),
            "edge_prob": brightness[:, None],
            "score": brightness[:, None],
            "heatmap": np.broadcast_to(brightness[:, None, None],
                                       (B, S, S)).copy(),
            "attention": {"rg2kg": np.zeros((B, 4, 13))},  # nested dict
        }


def test_microbatcher_coalesces_and_pads():
    seen = []
    stub = StubPredictor(seen)
    b = MicroBatcher(stub.predict_batch, batch_size=4, max_wait_ms=60.0)
    try:
        imgs = [np.full((S, S, 3), 40 * i, np.uint8) for i in range(6)]
        futs = [b.submit(im) for im in imgs]
        outs = [f.result(timeout=10) for f in futs]
        # every program invocation ran at a FIXED bucket shape (1/2/4)
        assert all(n in (1, 2, 4) for n in seen), seen
        # 6 requests in <= 3 batches (the first may fire solo before the rest enqueue)
        assert len(seen) <= 3
        # each request got ITS OWN row (brightness is per-image distinct)
        for i, out in enumerate(outs):
            expected = imgs[i].mean() / 255.0
            np.testing.assert_allclose(float(out["score"][0]), expected,
                                       atol=1e-6)
            assert out["attention"]["rg2kg"].shape == (4, 13)  # row-indexed
        st = b.stats()
        assert st["requests"] == 6 and st["batches"] == len(seen)
        assert st["p50_latency_ms"] is not None
    finally:
        b.close()


def test_microbatcher_bucketed_light_load():
    """A lone request under light load runs the batch-1 bucket (VERDICT r4
    item 7 — it used to pay the full batch_size program); bucketed=False
    restores the single-program behavior."""
    seen = []
    b = MicroBatcher(StubPredictor(seen).predict_batch, batch_size=8,
                     max_wait_ms=1.0)
    try:
        assert b.buckets == [1, 2, 4, 8]
        out = b.submit(np.zeros((S, S, 3), np.uint8)).result(timeout=10)
        assert seen == [1]
        assert float(out["score"][0]) == 0.0
        assert b.stats()["bucket_sizes"] == [1, 2, 4, 8]
    finally:
        b.close()

    seen2 = []
    b2 = MicroBatcher(StubPredictor(seen2).predict_batch, batch_size=8,
                      max_wait_ms=1.0, bucketed=False)
    try:
        b2.submit(np.zeros((S, S, 3), np.uint8)).result(timeout=10)
        assert seen2 == [8]
    finally:
        b2.close()


def test_microbatcher_propagates_failures():
    def boom(images):
        raise RuntimeError("device exploded")

    b = MicroBatcher(boom, batch_size=2, max_wait_ms=1.0)
    try:
        fut = b.submit(np.zeros((S, S, 3), np.uint8))
        with pytest.raises(RuntimeError, match="device exploded"):
            fut.result(timeout=10)
        # the worker survives a failed batch and serves the next one
        fut2 = b.submit(np.zeros((S, S, 3), np.uint8))
        with pytest.raises(RuntimeError):
            fut2.result(timeout=10)
    finally:
        b.close()


def test_microbatcher_close_fails_pending_and_rejects_submit():
    """close() must resolve (with an error) any future still in the queue —
    not strand its caller until the result timeout — and later submits must
    raise instead of enqueueing into a dead worker."""
    release = threading.Event()
    entered = threading.Event()

    def slow(images):
        entered.set()
        release.wait(timeout=10)
        return {"score": np.zeros((images.shape[0], 1), np.float32)}

    b = MicroBatcher(slow, batch_size=1, max_wait_ms=1.0)
    first = b.submit(np.zeros((S, S, 3), np.uint8))
    entered.wait(timeout=10)          # worker is busy inside predict_fn
    stranded = b.submit(np.zeros((S, S, 3), np.uint8))  # sits in the queue
    closer = threading.Thread(target=b.close)
    closer.start()
    release.set()                     # let the in-flight batch finish
    closer.join(timeout=10)
    assert not closer.is_alive()
    assert first.result(timeout=10)["score"].shape == (1,)
    with pytest.raises(RuntimeError, match="closed"):
        stranded.result(timeout=10)   # resolved by close(), not stranded
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(np.zeros((S, S, 3), np.uint8))


@pytest.fixture()
def http_service():
    seen = []
    service = InferenceService(StubPredictor(seen), batch_size=2,
                               max_wait_ms=1.0)
    server = make_server(service, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url
    server.shutdown()
    service.close()


def _png_bytes(value: int) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.full((S, S, 3), value, np.uint8)).save(buf,
                                                              format="PNG")
    return buf.getvalue()


def test_http_predict_health_stats(http_service):
    url = http_service
    with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["image_size"] == S

    req = urllib.request.Request(url + "/predict?heatmap=1",
                                 data=_png_bytes(200), method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        resp = json.loads(r.read())
    assert resp["mask_pred"] == 1  # bright image → class 1 in the stub
    assert 0.0 <= resp["score"] <= 1.0
    assert resp["classification"]  # a band string
    assert "heatmap_png_base64" in resp and resp["latency_ms"] > 0

    # without ?heatmap the PNG is omitted
    req = urllib.request.Request(url + "/predict", data=_png_bytes(10),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        resp = json.loads(r.read())
    assert resp["mask_pred"] == 0 and "heatmap_png_base64" not in resp

    with urllib.request.urlopen(url + "/stats", timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 2

    # malformed body → 400 with an error message, server stays up
    req = urllib.request.Request(url + "/predict", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(req, timeout=10)
    assert exc_info.value.code == 400

    # unknown path → 404
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        urllib.request.urlopen(url + "/nope", timeout=10)
    assert exc_info.value.code == 404


def test_http_inference_failure_is_500_not_400():
    """Device/server faults during inference must surface as retryable 5xx;
    only an undecodable payload is the client's 400."""
    def boom(images):
        raise RuntimeError("device exploded")

    service = InferenceService(StubPredictor([]), batch_size=1,
                               max_wait_ms=1.0)
    service.batcher.predict_fn = boom
    server = make_server(service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        req = urllib.request.Request(url + "/predict", data=_png_bytes(100),
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=15)
        assert exc_info.value.code == 500
        assert "device exploded" in json.loads(exc_info.value.read())["error"]
    finally:
        server.shutdown()
        service.close()


def test_http_concurrent_requests_share_batches(http_service):
    url = http_service
    results = [None] * 4
    errors = []

    def hit(i):
        try:
            req = urllib.request.Request(url + "/predict",
                                         data=_png_bytes(60 * i),
                                         method="POST")
            with urllib.request.urlopen(req, timeout=20) as r:
                results[i] = json.loads(r.read())
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    # responses are per-request, not per-batch: scores strictly increase
    scores = [r["score"] for r in results]
    assert scores == sorted(scores) and len(set(scores)) == 4
