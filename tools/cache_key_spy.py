"""Persistent-compilation-cache key probe for the bench sample graph.

Diagnoses the round-3 open issue (docs/PERF.md "Open issue"): consecutive
identical bench.py processes each re-add one cache entry for the big
`jit_sample_fn` graph, i.e. its cache key varies across processes on the
axon backend while the CPU-backend key is byte-stable.

Method (cheap — no compile happens): wrap `jax._src.cache_key.get` so that
the moment the TARGET module's key has been computed we print it and abort
the backend compile by raising. Enabling DEBUG logging on
`jax._src.cache_key` makes jax itself print the per-component hashes
("computation", "jax_lib version", "backend version", "XLA flags",
"compile_options", "accelerator_config", "compression", "custom_hook") —
running this twice and diffing the component lines identifies the first
nondeterministic component.

Usage:
    # axon backend (default session backend):
    python tools/cache_key_spy.py > /tmp/spy_a.txt 2>&1
    python tools/cache_key_spy.py > /tmp/spy_b.txt 2>&1
    diff /tmp/spy_a.txt /tmp/spy_b.txt

    # CPU control (known byte-stable):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/cache_key_spy.py

Smaller graphs' keys are logged along the way (they compile normally until
the target is reached — pass --target '' to log every key without
aborting, which does compile everything).
"""

import argparse
import logging
import os
import sys
import time


class _KeyCaptured(Exception):
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--target", default="sample",
        help="abort (skipping compiles) once a module whose name contains "
             "this substring has had its key computed; '' = never abort",
    )
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    # fail fast if the device link is dead — same subprocess probe +
    # retry/backoff as bench.py (the daemon-thread probe SIGABRTed on
    # exit; see bench._device_sanity's round-3 postmortem)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _device_sanity

    _device_sanity()
    # asset-free key probe: the hash-fallback tokenizer is fine here (the
    # cache key depends only on graph structure, not token values)
    os.environ.setdefault("IDTPU_ALLOW_HASH_TOKENIZER", "1")

    import jax
    from jax._src import cache_key

    logging.basicConfig(stream=sys.stdout, level=logging.WARNING,
                        format="%(message)s")
    logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)

    backend = jax.devices()[0].client
    print(f"spy: jax={jax.__version__} platform={backend.platform} "
          f"platform_version={backend.platform_version!r}", flush=True)

    real_get = cache_key.get

    def spy_get(module, devices, compile_options, bknd, *a, **kw):
        name = str(module.operation.attributes["sym_name"])
        print(f"spy: computing key for module {name}", flush=True)
        key = real_get(module, devices, compile_options, bknd, *a, **kw)
        print(f"spy: KEY {key}", flush=True)
        if args.target and args.target in name:
            raise _KeyCaptured(key)
        return key

    cache_key.get = spy_get
    # the compiler module binds `get` at call time via the module attr, but
    # some call sites import it directly — patch those too
    from jax._src import compiler

    if getattr(compiler, "cache_key", None) is not None:
        compiler.cache_key.get = spy_get

    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

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

    t0 = time.time()
    try:
        pipe.generate(meta, num_images=args.batch, steps=args.steps,
                      mis=0.0, seed=0)
        print("spy: generate completed without hitting the target module",
              flush=True)
    except _KeyCaptured as e:
        print(f"spy: captured target key in {time.time() - t0:.0f}s: {e}",
              flush=True)
        return 0
    except Exception as e:  # compiles aborted mid-pipeline surface variously
        if any(isinstance(c, _KeyCaptured) for c in _chain(e)):
            print(f"spy: captured (wrapped) in {time.time() - t0:.0f}s",
                  flush=True)
            return 0
        raise
    return 0


def _chain(e):
    seen = []
    while e is not None and e not in seen:
        seen.append(e)
        e = e.__cause__ or e.__context__
    return seen


if __name__ == "__main__":
    sys.exit(main())
