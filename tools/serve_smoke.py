"""Hardware serving smoke (VERDICT r4 #6): start serve.py's stack against
the real chip, issue /generate requests over HTTP, record cold/warm latency
and micro-batch throughput. The reference has no serving story at all
(inference.py is a one-shot CLI) — this keeps our beyond-reference claim
honest with a measured number.

Run: python tools/serve_smoke.py   (steps/sampler bounded to keep the
compile affordable: DPM-Solver++(2M) 20 steps, batch_size 4)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time
import urllib.request

META = {
    "prompt": "a cat and a dog on a wooden bench",
    "phrases": ["a cat", "a dog", "a wooden bench"],
    "locations": [
        [0.05, 0.35, 0.45, 0.90],
        [0.55, 0.30, 0.95, 0.90],
        [0.02, 0.55, 0.98, 0.98],
    ],
    "points": [[0.25, 0.62], [0.75, 0.60], [0.50, 0.76]],
}


def main():
    _os.environ.setdefault("IDTPU_ALLOW_HASH_TOKENIZER", "1")
    batch_size = int(_os.environ.get("SMOKE_BATCH", "4"))
    steps = int(_os.environ.get("SMOKE_STEPS", "20"))
    port = int(_os.environ.get("SMOKE_PORT", "8321"))

    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline
    from instancediffusion_tpu.serve import serve

    t0 = time.time()
    cfg = apply_test_preset(Config(), "box")
    pipe = InstanceDiffusionPipeline.random_init(cfg, seed=0)
    print(f"smoke: init {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    server = serve(pipe, port=port, batch_size=batch_size, steps=steps,
                   sampler="dpm", max_wait_ms=50.0)
    warm_s = time.time() - t0
    print(f"smoke: serve warm-up (compile) {warm_s:.0f}s",
          file=sys.stderr, flush=True)

    url = f"http://127.0.0.1:{port}/generate?format=json"
    lat = []
    for i in range(3):
        body = json.dumps({**META, "seed": i}).encode()
        t0 = time.time()
        with urllib.request.urlopen(
            urllib.request.Request(url, data=body,
                                   headers={"Content-Type": "application/json"}),
            timeout=600,
        ) as r:
            resp = json.loads(r.read())
        wall = time.time() - t0
        lat.append(wall)
        print(f"smoke: request {i + 1}/3 wall={wall:.2f}s "
              f"server_latency={resp['latency_s']}s shape={resp['shape']}",
              flush=True)

    # one concurrent burst: batch_size requests land in ONE micro-batch
    import threading

    walls = [None] * batch_size

    def one(i):
        body = json.dumps({**META, "seed": 100 + i}).encode()
        t0 = time.time()
        with urllib.request.urlopen(
            urllib.request.Request(url, data=body,
                                   headers={"Content-Type": "application/json"}),
            timeout=600,
        ) as r:
            r.read()
        walls[i] = time.time() - t0

    threads = [threading.Thread(target=one, args=(i,)) for i in range(batch_size)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    burst = time.time() - t0
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthz", timeout=30
    ) as r:
        health = json.loads(r.read())

    print(json.dumps({
        "warmup_compile_s": round(warm_s, 1),
        "single_latency_s": [round(x, 2) for x in lat],
        "p50_single_s": round(sorted(lat)[1], 2),
        "burst_n": batch_size,
        "burst_wall_s": round(burst, 2),
        "burst_img_s": round(batch_size / burst, 3),
        "batches": health["batches"],
        "requests": health["requests"],
        "steps": steps,
        "sampler": "dpm",
    }))
    server.shutdown()


if __name__ == "__main__":
    main()
