"""Device-trace the FULL generate path (sampler scan + UniFusion + CLIP +
VAE decode) — the ~660 ms/batch the UNet-only trace (profile_bench.py)
cannot see. Short step count keeps the trace small; per-step UNet cost is
already known from profile_bench, so this capture exists to price the
NON-UNet components: VAE decode, grounding/CLIP encode, scan glue.

python tools/generate_trace.py [--out docs/traces/r3_gen] [--batch 8] [--steps 5]
then: python tools/xplane_parse.py <out> --top 30
"""


from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import argparse
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/traces/r3_gen")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax

    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

    cfg = apply_test_preset(Config(), "box")
    pipe = InstanceDiffusionPipeline.random_init(cfg, seed=0)
    meta = {
        "prompt": "a cat and a dog on a bench",
        "phrases": ["a cat", "a dog"],
        "locations": [[0.05, 0.35, 0.45, 0.90], [0.55, 0.30, 0.95, 0.90]],
        "points": [[0.25, 0.62], [0.75, 0.60]],
        "alpha_type": [0.75, 0.0, 0.25],
    }

    t0 = time.time()
    imgs = pipe.generate(meta, num_images=args.batch, steps=args.steps,
                         mis=0.0, seed=0)
    print(f"compile+run {time.time()-t0:.0f}s {imgs.shape}", file=sys.stderr)

    jax.profiler.start_trace(args.out)
    imgs = pipe.generate(meta, num_images=args.batch, steps=args.steps,
                         mis=0.0, seed=1)
    assert imgs.shape[0] == args.batch
    jax.profiler.stop_trace()
    print("trace captured to", args.out, file=sys.stderr)


if __name__ == "__main__":
    main()
