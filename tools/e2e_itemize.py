"""Itemize end-to-end generate() wall time into host/link/device phases.

VERDICT r3 ask #2: "trace and itemize the ~83 ms/batch sampler+decode
overhead the roofline table excludes". The UNet-side story is closed
(docs/PERF.md round-4 copy-elimination section); what remains between the
measured bench number and the UNet roofline is host glue + link latency +
device-side non-UNet work. This tool runs the exact bench protocol and
prints the per-phase breakdown recorded by pipeline.generate().

Usage (on the machine with the real chip):
    python tools/e2e_itemize.py            # 50-step flagship protocol
    BENCH_STEPS=5 python tools/e2e_itemize.py   # short, for quick A/Bs
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    os.environ.setdefault("IDTPU_ALLOW_HASH_TOKENIZER", "1")
    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

    num_images = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    # explicit mis (the config default is the reference's 0.36; the
    # flagship bench protocol is mis=0 — an unset mis here once measured
    # the MIS path by accident and "reproduced" 0.3006 to within 0.8%)
    mis = float(os.environ.get("BENCH_MIS", "0.0"))

    cfg = apply_test_preset(Config(), "box")
    pipe = InstanceDiffusionPipeline.random_init(cfg, seed=0)

    meta = {
        "prompt": "a cat and a dog and a robin sitting on a wooden bench in a park",
        "phrases": ["a cat", "a dog", "a robin", "a wooden bench"],
        "locations": [
            [0.05, 0.35, 0.45, 0.90],
            [0.55, 0.30, 0.95, 0.90],
            [0.42, 0.05, 0.58, 0.25],
            [0.02, 0.55, 0.98, 0.98],
        ],
        "points": [[0.25, 0.62], [0.75, 0.60], [0.50, 0.15], [0.50, 0.76]],
        "alpha_type": [0.75, 0.0, 0.25],
    }

    print(f"itemize: compiling (B={num_images}, steps={steps})...",
          file=sys.stderr, flush=True)
    t0 = time.time()
    pipe.generate(meta, num_images=num_images, steps=steps, mis=mis, seed=0)
    print(f"itemize: compiled in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)

    rows = []
    for i in range(n_runs):
        t0 = time.time()
        pipe.generate(meta, num_images=num_images, steps=steps, mis=mis, seed=i + 1)
        wall = time.time() - t0
        t = dict(pipe.last_timings)
        t["wall"] = wall
        t["unaccounted"] = wall - sum(
            v for k, v in t.items() if k != "wall"
        )
        rows.append(t)
        print(f"run {i + 1}: " + "  ".join(
            f"{k}={v * 1000:.1f}ms" for k, v in t.items()
        ), flush=True)

    keys = list(rows[0])
    print("\nmedian over runs (ms):")
    for k in keys:
        med = float(np.median([r[k] for r in rows]))
        print(f"  {k:18s} {med * 1000:9.1f}")
    med_wall = float(np.median([r["wall"] for r in rows]))
    print(f"\nserial img/s/chip = {num_images / med_wall:.4f} (median wall)")
    # device program time of one batch: warm dispatch + block_until_ready
    program_s = float(np.median(
        [r.get("sample_dispatch", 0) + r.get("sample_device", 0)
         for r in rows]
    ))

    # pipelined steady state (VERDICT r4 #1 'done' criterion): enqueue all
    # batches up-front via block=False, time fetch-to-fetch intervals.
    # exposed = interval - serial program time; covers BOTH leftover host
    # glue and the per-batch device-side encode/x_init micro-programs.
    n_pipe = max(n_runs, 3)
    prime = pipe.generate(meta, num_images=num_images, steps=steps, mis=mis,
                          seed=100, block=False)
    handles = [
        pipe.generate(meta, num_images=num_images, steps=steps, mis=mis,
                      seed=101 + i, block=False)
        for i in range(n_pipe)
    ]
    prime.fetch()
    marks = [time.time()]
    for h in handles:
        h.fetch()
        marks.append(time.time())
    intervals = np.diff(marks)
    steady = float(np.median(intervals))
    print(f"\npipelined steady state over {n_pipe} batches:")
    print(f"  interval (median)  {steady * 1000:9.1f} ms/batch")
    print(f"  program (serial)   {program_s * 1000:9.1f} ms/batch")
    print(f"  exposed host+misc  {(steady - program_s) * 1000:9.1f} ms/batch")
    print(f"\npipelined img/s/chip = {num_images / steady:.4f}")


if __name__ == "__main__":
    main()
