"""Serving front-end tests (serve.py): micro-batching semantics with a
fake backend (fast), and a real HTTP round-trip on the tiny pipeline
(slow tier)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from instancediffusion_tpu.serve import BatchingQueue


class FakeBackend:
    """Records calls; returns per-request images encoding (index, seed)."""

    def __init__(self, delay_s=0.0):
        self.calls = []
        self.delay_s = delay_s

    def __call__(self, metas, seeds=None, **kw):
        if self.delay_s:
            time.sleep(self.delay_s)
        self.calls.append((list(metas), list(seeds), kw))
        out = np.zeros((len(metas), 2, 2, 3), np.uint8)
        for i, s in enumerate(seeds):
            out[i, 0, 0, 0] = s  # seed watermark
        return out


def test_batching_pads_to_fixed_size_and_trims():
    fake = FakeBackend()
    bq = BatchingQueue(fake, batch_size=4, max_wait_ms=30.0, steps=7)
    futs = [bq.submit({"prompt": f"p{i}"}, seed=10 + i) for i in range(5)]
    imgs = [f.result(timeout=10) for f in futs]
    bq.close()

    # 5 requests -> one full batch of 4 + one short batch padded to 4
    assert len(fake.calls) == 2
    (m0, s0, kw0), (m1, s1, kw1) = fake.calls
    assert len(m0) == 4 and s0 == [10, 11, 12, 13]
    assert len(m1) == 4 and s1 == [14, 14, 14, 14]  # padded by repetition
    assert m1[0]["prompt"] == "p4" and m1[-1]["prompt"] == "p4"
    assert kw0 == {"steps": 7}  # gen kwargs pass through
    # each request got ITS OWN image (watermark = its seed), pad rows dropped
    for i, img in enumerate(imgs):
        assert img.shape == (2, 2, 3)
        assert img[0, 0, 0] == 10 + i
    assert bq.requests == 5 and bq.batches == 2


def test_batching_exception_resolves_all_futures():
    def boom(metas, seeds=None, **kw):
        raise RuntimeError("backend down")

    bq = BatchingQueue(boom, batch_size=2, max_wait_ms=10.0)
    futs = [bq.submit({"prompt": "x"}) for _ in range(2)]
    for f in futs:
        with pytest.raises(RuntimeError, match="backend down"):
            f.result(timeout=10)
    bq.close()


def test_concurrent_submissions_share_one_batch():
    fake = FakeBackend(delay_s=0.05)
    bq = BatchingQueue(fake, batch_size=8, max_wait_ms=200.0)
    futs = []

    def client(i):
        futs.append((i, bq.submit({"prompt": str(i)}, seed=i)))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, f in futs:
        assert f.result(timeout=10)[0, 0, 0] == i
    bq.close()
    assert bq.batches == 1, fake.calls  # all 8 coalesced


@pytest.mark.slow
def test_http_end_to_end():
    from tests.test_pipeline import tiny_config
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline
    from instancediffusion_tpu.serve import serve
    import instancediffusion_tpu.data.grounding_input as gi

    pipe = InstanceDiffusionPipeline.random_init(tiny_config(), seed=0)
    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    server = None
    try:
        server = serve(pipe, host="127.0.0.1", port=0, batch_size=2,
                       max_wait_ms=20.0, steps=4, mis=0.0, sampler="dpm")
        port = server.server_address[1]

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["requests"] >= 2  # warm-up ran

        body = json.dumps({
            "prompt": "a thing", "phrases": ["a thing"],
            "locations": [[0.2, 0.2, 0.8, 0.8]], "points": [[0.5, 0.5]],
            "seed": 7,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            png = r.read()
            assert r.headers["Content-Type"] == "image/png"
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        # json format variant + determinism across requests
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate?format=json", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req2, timeout=300) as r:
            payload = json.loads(r.read())
        import base64

        assert base64.b64decode(payload["png_base64"]) == png
        size = pipe.cfg.model.image_size * 2
        assert payload["shape"] == [size, size, 3]

        # malformed request -> 400, server stays alive
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        if server is not None:
            server.shutdown()
            server.batcher.close()
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old
