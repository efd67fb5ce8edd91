"""Serving daemon tests: micro-batching semantics, HTTP surface, error
handling. Uses a stub pipeline — the batcher only requires `.generate`,
which keeps these tests model-free and fast (sd_tpu/serve.py)."""

from __future__ import annotations

import base64
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from sd_tpu.serve import BatchingServer, make_http_server


class StubPipeline:
    """Records every generate() call; returns per-prompt constant images."""

    def __init__(self, delay=0.0, fail=False):
        self.calls = []
        self.delay = delay
        self.fail = fail
        self.lock = threading.Lock()

    def generate(self, prompts, negative_prompt="", num_steps=30,
                 guidance_scale=7.5, guidance_rescale=0.0, sampler="ddim",
                 seed=0, height=None, width=None, clip_skip=None, eta=0.0,
                 sag_scale=0.0):
        with self.lock:
            self.calls.append({
                "prompts": list(prompts), "steps": num_steps,
                "sampler": sampler, "seed": seed, "sag_scale": sag_scale,
            })
        if self.fail:
            raise RuntimeError("synthetic model failure")
        if self.delay:
            time.sleep(self.delay)
        h = height or 16
        w = width or 16
        return np.stack([
            np.full((h, w, 3), (len(p) * 7) % 256, np.uint8) for p in prompts
        ])


@pytest.fixture
def served():
    """(batcher, base_url, stub) with a generous batching window."""
    stub = StubPipeline()
    batcher = BatchingServer(stub, max_batch=4, batch_window_ms=250)
    batcher.start()
    server = make_http_server(batcher, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield batcher, url, stub
    server.shutdown()
    server.server_close()
    batcher.stop()


def _post(url, body, timeout=10):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _decode_png(b64):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))


def test_single_request_roundtrip(served):
    _, url, stub = served
    out = _post(url, {"prompt": "a cat", "steps": 7, "seed": 3})
    img = _decode_png(out["image"])
    assert img.shape == (16, 16, 3)
    assert (img == (len("a cat") * 7) % 256).all()
    assert out["seed"] == 3
    assert stub.calls[0]["steps"] == 7 and stub.calls[0]["seed"] == 3


def test_concurrent_same_params_batch_together(served):
    batcher, url, stub = served
    results = {}

    def go(name):
        results[name] = _post(url, {"prompt": name, "steps": 5})

    threads = [threading.Thread(target=go, args=(p,))
               for p in ("a cat", "a big dog")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # one generate call served both prompts
    assert len(stub.calls) == 1, stub.calls
    assert sorted(stub.calls[0]["prompts"]) == ["a big dog", "a cat"]
    assert results["a cat"]["batch_size"] == 2
    # both requests report the shared group seed
    assert results["a cat"]["seed"] == results["a big dog"]["seed"]
    # each slot got its own image
    assert (_decode_png(results["a cat"]["image"])
            == (len("a cat") * 7) % 256).all()
    assert (_decode_png(results["a big dog"]["image"])
            == (len("a big dog") * 7) % 256).all()


def test_different_params_do_not_batch(served):
    _, url, stub = served

    def go(body):
        _post(url, body)

    threads = [
        threading.Thread(target=go, args=({"prompt": "a", "steps": 5},)),
        threading.Thread(target=go, args=({"prompt": "b", "steps": 9},)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(stub.calls) == 2
    assert {c["steps"] for c in stub.calls} == {5, 9}


def test_explicit_distinct_seeds_do_not_batch(served):
    _, url, stub = served
    threads = [
        threading.Thread(target=_post,
                         args=(url, {"prompt": "a", "seed": 1})),
        threading.Thread(target=_post,
                         args=(url, {"prompt": "b", "seed": 2})),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(stub.calls) == 2
    assert {c["seed"] for c in stub.calls} == {1, 2}


@pytest.mark.parametrize("body,msg", [
    ({}, "prompt"),
    ({"prompt": "  "}, "prompt"),
    ({"prompt": "x", "sampler": "banana"}, "sampler"),
    ({"prompt": "x", "steps": 0}, "steps"),
    ({"prompt": "x", "width": 100}, "width"),
])
def test_validation_errors_return_400(served, body, msg):
    _, url, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, body)
    assert e.value.code == 400
    assert msg in json.loads(e.value.read())["error"]


def test_invalid_json_returns_400(served):
    _, url, _ = served
    req = urllib.request.Request(url + "/generate", data=b"{not json")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_healthz_and_metrics(served):
    batcher, url, _ = served
    _post(url, {"prompt": "warm", "steps": 2})
    with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
        h = json.loads(r.read())
    assert h["ok"] is True
    assert h["requests_served"] >= 1 and h["batches_run"] >= 1
    assert batcher.requests_served >= 1


def test_model_failure_returns_500_and_server_survives():
    stub = StubPipeline(fail=True)
    batcher = BatchingServer(stub, max_batch=2, batch_window_ms=10)
    batcher.start()
    server = make_http_server(batcher, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, {"prompt": "boom"})
        assert e.value.code == 500
        assert "synthetic model failure" in json.loads(e.value.read())["error"]
        # the worker thread survived the exception and keeps serving
        stub.fail = False
        out = _post(url, {"prompt": "ok now"})
        assert "image" in out
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()


def test_end_to_end_with_real_pipeline():
    """Full stack: HTTP → batcher → real (smoke-config) Text2ImagePipeline
    → base64 PNG back. Two concurrent same-param requests share one
    compiled TPU/CPU invocation."""
    from sd_tpu.pipeline import Text2ImagePipeline

    pipe = Text2ImagePipeline.from_config("configs/sd_txt2img_smoke.yaml",
                                          param_dtype=None)
    batcher = BatchingServer(pipe, max_batch=2, batch_window_ms=2000,
                             default_steps=2, default_guidance=2.0)
    batcher.start()
    server = make_http_server(batcher, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        results = {}

        def go(p):
            results[p] = _post(url, {"prompt": p, "steps": 2}, timeout=600)

        threads = [threading.Thread(target=go, args=(p,))
                   for p in ("a cat", "a dog")]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert batcher.batches_run == 1  # one compiled call served both
        for p in ("a cat", "a dog"):
            img = _decode_png(results[p]["image"])
            assert img.shape == (32, 32, 3) and img.dtype == np.uint8
            assert results[p]["batch_size"] == 2
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()


def test_max_batch_respected():
    stub = StubPipeline()
    batcher = BatchingServer(stub, max_batch=2, batch_window_ms=300)
    batcher.start()
    server = make_http_server(batcher, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        threads = [threading.Thread(
            target=_post, args=(url, {"prompt": f"p{i}", "steps": 5}))
            for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(len(c["prompts"]) <= 2 for c in stub.calls)
        assert sum(len(c["prompts"]) for c in stub.calls) == 4
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()


def test_sag_scale_keys_batches_and_validates():
    """sag_scale joins the compilation key, reaches generate(), and
    rejects non-ddim samplers at validation time."""
    stub = StubPipeline()
    batcher = BatchingServer(stub, max_batch=4, batch_window_ms=100)
    batcher.start()
    try:
        r = batcher.submit({"prompt": "a", "steps": 5, "seed": 3,
                            "sag_scale": 0.75})
        assert r["seed"] == 3
        assert stub.calls[-1]["sag_scale"] == 0.75
        # default: sag off → generate sees 0.0 (kwarg omitted → stub default)
        batcher.submit({"prompt": "b", "steps": 5, "seed": 3})
        assert stub.calls[-1]["sag_scale"] == 0.0
        with pytest.raises(ValueError, match="ddim"):
            batcher.submit({"prompt": "c", "sampler": "euler",
                            "sag_scale": 0.5})
    finally:
        batcher.stop()


def test_non_pow2_group_pads_to_bucket():
    """A 3-request group must run as a padded batch-4 generate() call
    (batch-size bucketing: one compiled program per pow-2 bucket), while
    each requester still gets its own image and batch_size=3."""
    stub = StubPipeline()
    batcher = BatchingServer(stub, max_batch=4, batch_window_ms=400)
    batcher.start()
    server = make_http_server(batcher, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    results = {}
    lock = threading.Lock()

    def go(i):
        r = _post(url, {"prompt": "x" * (i + 1), "steps": 5})
        with lock:
            results[i] = r

    try:
        threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(stub.calls) == 1
        call = stub.calls[0]
        assert len(call["prompts"]) == 4          # padded to the bucket
        assert call["prompts"][3] == call["prompts"][2]  # pad = repeat last
        for i, r in results.items():
            assert r["batch_size"] == 3           # realized group size
            img = np.frombuffer(
                base64.b64decode(r["image"]), np.uint8)
            assert img.size > 0
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()
