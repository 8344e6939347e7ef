"""Serving layer: dynamic batching, bucket padding, HTTP round-trip.

The generator is faked (records batch sizes, returns deterministic images)
so these run fast on CPU; one test drives a real tiny SD1Generator to pin
the per-sample-seeds contract end to end.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from from_ddpm_to_stable_diffusion_tpu.serving import (DynamicBatcher,
                                                       GenerateRequest,
                                                       make_server,
                                                       serve_forever_in_thread)


class FakeGen:
    """Deterministic stand-in: image pixel = seed (mod 256); records calls."""

    def __init__(self, delay_s=0.0, fail=False):
        self.calls = []
        self.delay_s = delay_s
        self.fail = fail
        self.lock = threading.Lock()

    def __call__(self, prompts, negs, seeds):
        with self.lock:
            self.calls.append((list(prompts), list(negs), list(seeds)))
        if self.fail:
            raise RuntimeError("boom")
        time.sleep(self.delay_s)
        imgs = np.zeros((len(prompts), 4, 4, 3), np.uint8)
        for i, s in enumerate(seeds):
            imgs[i] = 0 if s is None else (s % 256)
        return imgs


def make_batcher(gen, **kw):
    kw.setdefault("buckets", (1, 2, 4))
    kw.setdefault("max_wait_ms", 30.0)
    return DynamicBatcher(gen, **kw)


def test_single_request_roundtrip():
    gen = FakeGen()
    b = make_batcher(gen)
    img = b.submit(GenerateRequest("a cat", seed=7)).result(timeout=5)
    assert img.shape == (4, 4, 3) and img[0, 0, 0] == 7
    assert len(gen.calls) == 1 and gen.calls[0][0] == ["a cat"]
    m = b.metrics()
    assert m["served"] == 1 and m["batches"] == 1 and m["padded_slots"] == 0
    b.shutdown()


def test_concurrent_requests_coalesce_and_keep_seed_identity():
    gen = FakeGen(delay_s=0.05)
    b = make_batcher(gen, max_wait_ms=80.0)
    futs = {}

    def submit(i):
        futs[i] = b.submit(GenerateRequest(f"p{i}", seed=i + 10))

    threads = [threading.Thread(target=submit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, f in futs.items():
        assert f.result(timeout=5)[0, 0, 0] == i + 10
    m = b.metrics()
    assert m["served"] == 4
    # the co-rider window must have coalesced at least once
    assert m["batches"] < 4 and m["mean_batch"] > 1.0
    b.shutdown()


def test_bucket_padding_trimmed():
    gen = FakeGen(delay_s=0.05)
    b = make_batcher(gen, max_wait_ms=100.0)
    futs = [None] * 3

    def submit(i):
        futs[i] = b.submit(GenerateRequest(f"p{i}", seed=i))

    threads = [threading.Thread(target=submit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, f in enumerate(futs):
        assert f.result(timeout=5)[0, 0, 0] == i
    # 3 requests → one bucket-4 call (or worst-case racy split); every
    # underlying call length must be a bucket size
    for prompts, _, _ in gen.calls:
        assert len(prompts) in (1, 2, 4)
    assert b.metrics()["padded_slots"] >= 1 or len(gen.calls) > 1
    b.shutdown()


def test_failure_propagates_and_server_keeps_serving():
    gen = FakeGen(fail=True)
    b = make_batcher(gen)
    with pytest.raises(RuntimeError, match="boom"):
        b.submit(GenerateRequest("x")).result(timeout=5)
    gen.fail = False
    ok = b.submit(GenerateRequest("y", seed=3)).result(timeout=5)
    assert ok[0, 0, 0] == 3
    m = b.metrics()
    assert m["failed"] == 1 and m["served"] == 1
    b.shutdown()


def test_queue_full_rejects():
    gen = FakeGen(delay_s=0.2)
    b = DynamicBatcher(gen, buckets=(1,), max_wait_ms=1.0, max_queue=1)
    futs = [b.submit(GenerateRequest(f"p{i}")) for i in range(8)]
    errors = 0
    for f in futs:
        try:
            f.result(timeout=10)
        except RuntimeError:
            errors += 1
    assert errors >= 1  # at least one rejected by the bounded queue
    # rejections must reconcile: requests == served + failed (queue drained)
    m = b.metrics()
    assert m["failed"] == errors
    assert m["requests"] == m["served"] + m["failed"]
    b.shutdown()


def test_warmup_compiles_exact_buckets():
    """warmup(b) must reach the generator as ONE bucket-b call — the
    coalescing window cannot split it (race: b queued singles could batch
    as < b and leave the real bucket uncompiled)."""
    gen = FakeGen()
    # max_wait_ms=0: any per-request submission would batch as singles
    b = make_batcher(gen, max_wait_ms=0.0)
    b.warmup()
    sizes = sorted(len(p) for p, _, _ in gen.calls)
    assert sizes == [1, 2, 4]
    # warmup traffic stays out of the request metrics
    m = b.metrics()
    assert m["requests"] == 0 and m["served"] == 0 and m["batches"] == 0
    with pytest.raises(ValueError, match="unknown bucket"):
        b.warmup(buckets=(3,))
    b.shutdown()


def test_none_seed_draws_fresh_random_seed():
    """seed=None: the server draws a fresh seed per request — two identical
    None-seed requests must NOT reuse one deterministic derived seed."""
    gen = FakeGen()
    b = make_batcher(gen)
    b.submit(GenerateRequest("x")).result(timeout=5)
    b.submit(GenerateRequest("x")).result(timeout=5)
    seeds = [s for _, _, ss in gen.calls for s in ss]
    assert all(s is not None for s in seeds)
    assert seeds[0] != seeds[1]  # P(collision) = 2^-31
    b.shutdown()


@pytest.fixture()
def http_server():
    gen = FakeGen()
    b = make_batcher(gen)
    server = make_server(b, port=0)
    serve_forever_in_thread(server)
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}", gen
    server.shutdown()
    b.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/v1/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=10)


def test_http_png_and_json_formats(http_server):
    url, _ = http_server
    resp = _post(url, {"prompt": "a dog", "seed": 42})
    assert resp.headers["Content-Type"] == "image/png"
    assert resp.read()[:8] == b"\x89PNG\r\n\x1a\n"

    resp = _post(url, {"prompt": "a dog", "seed": 42, "format": "json"})
    body = json.loads(resp.read())
    assert body["shape"] == [4, 4, 3]
    import base64

    raw = np.frombuffer(base64.b64decode(body["image_b64"]),
                        np.uint8).reshape(4, 4, 3)
    assert raw[0, 0, 0] == 42


def test_http_health_metrics_and_errors(http_server):
    url, _ = http_server
    health = json.loads(urllib.request.urlopen(url + "/healthz",
                                               timeout=10).read())
    assert health["ok"] is True
    _post(url, {"prompt": "x", "seed": 1})
    metrics = json.loads(urllib.request.urlopen(url + "/metrics",
                                                timeout=10).read())
    assert metrics["served"] >= 1 and "latency_ms_p50" in metrics

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, {"no_prompt": True})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url, {"prompt": "x", "seed": "one"})
    assert e.value.code == 400
    # valid JSON that is not an object must 400, not drop the connection
    for body in ([1, 2, 3], "str", 5):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, body)
        assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(url + "/nope", timeout=10)
    assert e.value.code == 404


def test_serve_cli_registered():
    from from_ddpm_to_stable_diffusion_tpu.__main__ import STAGES

    assert "serve" in STAGES
    from from_ddpm_to_stable_diffusion_tpu.cli import serve

    with pytest.raises(SystemExit):
        serve.main(["--help"])


@pytest.mark.slow
def test_sd1_generator_per_sample_seeds_batch_invariant():
    """The serving contract on the real pipeline (tiny op point, CPU):
    a seed's image is identical whether it rides alone or in a batch."""
    from from_ddpm_to_stable_diffusion_tpu.pipelines.sd1 import SD1Generator
    from tests.test_sd1 import _FakeModels

    gen = SD1Generator(_FakeModels(), sampler="k_euler",
                       n_inference_steps=3, height=64, width=64)
    solo = gen(["p"], per_sample_seeds=[123])
    pair = gen(["p", "q"], per_sample_seeds=[123, 456])
    # batch-1 and batch-2 are different XLA programs; fp reassociation can
    # flip a pixel sitting exactly on a uint8 quantization boundary (same
    # tolerance as test_sd1_generator_matches_generate)
    np.testing.assert_allclose(solo[0].astype(np.int16),
                               pair[0].astype(np.int16), atol=1)
    assert not np.array_equal(pair[0], pair[1])
