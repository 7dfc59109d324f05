"""Cold-start attribution + jax.export AOT experiment (VERDICT r4 #5).

A fresh serving process pays ~5-10 min before the first image:
  session spin-up (~5.5 min observed r4) + host trace/MLIR-lower (~200 s on
  this 1-core host) + XLA backend compile (~300-400 s; the persistent cache
  cannot help because the cache key carries a per-device-session component —
  docs/PERF.md r4 cache postmortem).

This tool measures the pieces separately and tests the one lever that could
remove the host-side share: `jax.export` (serialize the lowered StableHLO;
a restart deserializes instead of re-tracing). The backend compile still
runs on load, so the SLA floor is spin-up + backend compile.

Usage:
  python tools/aot_cold_start.py export   # trace+lower+serialize, timed
  python tools/aot_cold_start.py load     # fresh process: deserialize+run
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

BLOB = "/tmp/idtpu_flagship_sample.jaxexport"
META = {
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


def _pipe_and_args(num_images=8, steps=50):
    """Build the pipeline and capture the flagship sample_fn + its concrete
    dispatch args WITHOUT running the program (spy on _get_sample_fn)."""
    os_mark = time.time()
    os_env = __import__("os").environ
    os_env.setdefault("IDTPU_ALLOW_HASH_TOKENIZER", "1")
    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

    cfg = apply_test_preset(Config(), "box")
    pipe = InstanceDiffusionPipeline.random_init(cfg, seed=0)
    print(f"init: {time.time() - os_mark:.0f}s", file=sys.stderr, flush=True)

    captured = {}
    real_get = pipe._get_sample_fn

    def spy(key):
        fn = real_get(key)

        def wrapper(*args):
            captured["fn"], captured["args"] = fn, args
            # return a placeholder — we only want the args
            raise _Captured()

        return wrapper

    pipe._get_sample_fn = spy
    try:
        pipe.generate(META, num_images=num_images, steps=steps, mis=0.0,
                      seed=0, block=False)
    except _Captured:
        pass
    finally:
        pipe._get_sample_fn = real_get
    return pipe, captured["fn"], captured["args"]


class _Captured(Exception):
    pass


def _register_schedule_serialization():
    """jax.export serialization needs every custom pytree in the call
    signature registered by name (auxdata is None for our schedules)."""
    from jax import export as jexport
    from instancediffusion_tpu.samplers.plms import PLMSSchedule

    jexport.register_pytree_node_serialization(
        PLMSSchedule,
        serialized_name="instancediffusion_tpu.PLMSSchedule",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: None,
    )


def do_export():
    import jax
    from jax import export as jexport

    _register_schedule_serialization()
    pipe, fn, args = _pipe_and_args()
    t0 = time.time()
    shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), args
    )
    exported = jexport.export(fn)(*shapes)
    trace_s = time.time() - t0
    t0 = time.time()
    blob = exported.serialize()
    ser_s = time.time() - t0
    with open(BLOB, "wb") as f:
        f.write(blob)
    print(f"trace+lower: {trace_s:.0f}s  serialize: {ser_s:.1f}s  "
          f"blob: {len(blob) / 1e6:.1f} MB -> {BLOB}")


def do_load():
    import jax
    from jax import export as jexport

    _register_schedule_serialization()
    t0 = time.time()
    with open(BLOB, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    deser_s = time.time() - t0
    pipe, fn, args = _pipe_and_args()  # real conditioning tensors
    t0 = time.time()
    out = exported.call(*args)  # first call: backend compile + run
    np.asarray(out)
    first_s = time.time() - t0
    t0 = time.time()
    out = exported.call(*args)
    np.asarray(out)
    warm_s = time.time() - t0
    print(f"deserialize: {deser_s:.1f}s  first call (backend compile+run): "
          f"{first_s:.0f}s  warm call: {warm_s:.1f}s")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "export"
    (do_export if mode == "export" else do_load)()
