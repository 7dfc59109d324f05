"""Production serving front-end: micro-batching HTTP server.

The reference has no serving story at all — inference.py is a one-shot
CLI (inference.py:165-310). This module turns the pipeline into a
long-lived service the TPU way:

  * ONE compiled program serves every request: requests are micro-batched
    onto the static `batch_size` of a single `generate_batch` XLA program
    (heterogeneous instance metas batch structurally — all grounding
    tensors are max_objs-padded), so the chip always runs the same warm
    graph regardless of arrival pattern.
  * a collector thread gathers requests for up to `max_wait_ms` (or until
    `batch_size` are waiting), pads the tail of a short batch by repeating
    the last meta (padding rows are dropped before responding), and
    resolves per-request futures.
  * startup warm-up compiles the serving graph before the port opens, so
    the first request never pays the cold XLA compile. NOTE on restarts:
    over the current remote-device backend the persistent compilation
    cache does NOT make restarts fast — the cache key carries a
    per-device-session component, so a fresh process pays trace+compile
    again (measured; docs/PERF.md r4 "cache postmortem" and r5 cold-start
    section). Opt into the AOT blob cache (`--aot_dir`, aot.py) to halve
    that: the measured restart-to-first-image floor is ~7 min (session
    spin-up + backend compile of the pre-lowered module). Plan restarts
    around that SLA, or keep a standby process warm.
  * deterministic: an explicit per-request `seed` (default 0) maps to the
    same image bytes every time, like every other surface here.

Endpoints (stdlib http.server; zero new dependencies):
  GET  /healthz            -> {"ok": true, "device": ..., "requests": N}
  POST /generate           body: demo-style meta JSON (prompt/phrases/
                           locations[/points/scribbles/polygons/segs],
                           optional seed) -> image/png
                           (?format=json -> base64 PNG + latency stats)

CLI: python -m instancediffusion_tpu.serve --test_config box \
       --ckpt pretrained/instancediffusion_sd15.pth \
       --steps 20 --sampler dpm --batch_size 8 --port 8321
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class BatchingQueue:
    """Collects generate requests into fixed-size micro-batches.

    submit() returns a Future resolving to one (H, W, 3) uint8 array. The
    worker drains up to `batch_size` requests, waiting at most
    `max_wait_ms` after the first arrival before dispatching a short
    (padded) batch."""

    def __init__(self, generate_batch, batch_size: int = 8,
                 max_wait_ms: float = 50.0, **gen_kwargs):
        self._generate_batch = generate_batch
        self.batch_size = int(batch_size)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.gen_kwargs = gen_kwargs
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self.batches = 0          # observability
        self.requests = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, meta: dict, seed: int = 0) -> Future:
        fut: Future = Future()
        self._q.put((meta, int(seed), fut))
        return fut

    def close(self, timeout: float = 5.0):
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._worker.join(timeout)

    def _drain(self):
        """Block for the first request, then gather up to batch_size for
        at most max_wait_s."""
        first = self._q.get()
        if first is None:
            return []
        items = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(items) < self.batch_size:
            budget = deadline - time.monotonic()
            if budget <= 0:
                break
            try:
                nxt = self._q.get(timeout=budget)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _run(self):
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            n = len(items)
            # pad short batches to the FIXED batch_size: every micro-batch
            # runs the one compiled XLA program regardless of arrival
            # pattern (a varying batch length would retrace per length)
            metas = [m for m, _, _ in items]
            seeds = [s for _, s, _ in items]
            metas += [metas[-1]] * (self.batch_size - n)
            seeds += [seeds[-1]] * (self.batch_size - n)
            try:
                imgs = self._generate_batch(metas, seeds=seeds,
                                            **self.gen_kwargs)[:n]
                self.batches += 1
                self.requests += len(items)
                for (_, _, fut), img in zip(items, imgs):
                    fut.set_result(np.asarray(img))
            except Exception as e:  # resolve every future, never wedge
                for _, _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)


def _png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def make_handler(batcher: BatchingQueue, device_desc: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj: dict):
            self._reply(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {
                    "ok": True, "device": device_desc,
                    "requests": batcher.requests,
                    "batches": batcher.batches,
                    "batch_size": batcher.batch_size,
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/generate"):
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                meta = json.loads(self.rfile.read(n) or b"{}")
                seed = int(meta.pop("seed", 0))
                if "prompt" not in meta:
                    raise ValueError("meta needs at least a 'prompt'")
                meta.setdefault("phrases", [])
                meta.setdefault("locations", [])
            except Exception as e:
                self._json(400, {"error": str(e)})
                return
            t0 = time.monotonic()
            try:
                img = batcher.submit(meta, seed).result(timeout=600)
            except Exception as e:
                self._json(500, {"error": str(e)})
                return
            dt = time.monotonic() - t0
            png = _png_bytes(img)
            if "format=json" in (self.path.split("?", 1) + [""])[1]:
                self._json(200, {
                    "png_base64": base64.b64encode(png).decode(),
                    "latency_s": round(dt, 3),
                    "shape": list(img.shape),
                })
            else:
                self._reply(200, png, "image/png")

    return Handler


def serve(pipe, host: str = "127.0.0.1", port: int = 8321,
          batch_size: int = 8, max_wait_ms: float = 50.0,
          warmup: bool = True, aot_dir: str | None = None,
          **gen_kwargs) -> ThreadingHTTPServer:
    """Start serving `pipe` (InstanceDiffusionPipeline). Returns the
    running server (call .shutdown() to stop); blocks only in __main__.

    aot_dir: opt into the jax.export program cache (aot.py) — the serving
    graph loads from / saves to StableHLO blobs there, cutting a restart's
    warm-up from re-trace+compile to deserialize+compile (docs/PERF.md r5
    cold-start section)."""
    import jax

    if aot_dir:
        pipe.enable_aot(aot_dir)
    batcher = BatchingQueue(pipe.generate_batch, batch_size=batch_size,
                            max_wait_ms=max_wait_ms, **gen_kwargs)
    if warmup:
        # compile the exact serving graph before opening the port
        warm_meta = {
            "prompt": "warmup", "phrases": ["a thing"],
            "locations": [[0.2, 0.2, 0.8, 0.8]], "points": [[0.5, 0.5]],
        }
        t0 = time.time()
        futs = [batcher.submit(warm_meta, seed=i) for i in range(batch_size)]
        for f in futs:
            f.result(timeout=3600)
        print(f"serve: warm-up compiled+ran in {time.time() - t0:.0f}s",
              flush=True)

    server = ThreadingHTTPServer(
        (host, port), make_handler(batcher, str(jax.devices()[0]))
    )
    server.batcher = batcher  # for tests/observability
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"serve: listening on http://{host}:{port}", flush=True)
    return server


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("InstanceDiffusion-TPU serving")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8321)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--test_config", type=str, default="box")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=50.0)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--alpha", type=float, default=0.75)
    p.add_argument("--mis", type=float, default=0.0)
    p.add_argument("--sampler", type=str, default="plms",
                   choices=["plms", "dpm", "ddim"])
    p.add_argument("--mesh", action="store_true",
                   help="shard serving batches over all local devices")
    p.add_argument("--aot_dir", type=str, default=None,
                   help="jax.export blob cache dir: restarts skip re-trace "
                        "and compile a pre-lowered module (docs/PERF.md r5)")
    args = p.parse_args(argv)

    import os

    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

    cfg = apply_test_preset(Config(), args.test_config)
    if args.ckpt and os.path.exists(args.ckpt):
        pipe = InstanceDiffusionPipeline.from_checkpoint(args.ckpt, cfg)
    else:
        if args.ckpt:
            print(f"warning: checkpoint {args.ckpt} not found; random init")
        pipe = InstanceDiffusionPipeline.random_init(cfg, seed=0)

    mesh = None
    if args.mesh:
        from instancediffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    server = serve(
        pipe, host=args.host, port=args.port, batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms, steps=args.steps,
        guidance_scale=args.guidance_scale, alpha=args.alpha, mis=args.mis,
        sampler=args.sampler, mesh=mesh, aot_dir=args.aot_dir,
    )
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
