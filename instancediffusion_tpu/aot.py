"""AOT program cache: `jax.export` blobs keyed by (sample-fn static key,
argument structure, platform, library/jax versions).

Why this exists: over a remote-device backend the persistent XLA
compilation cache cannot make process restarts fast (its key carries a
per-device-session component — docs/PERF.md r4 "cache postmortem"), so a
fresh serving process re-pays trace + backend compile before its first
image. Measured on the flagship 50-step PLMS B=8 program (docs/PERF.md r5
cold-start section): deserializing a 1.9 MB StableHLO blob replaces the
25 s re-trace AND the backend compile of the pre-lowered module is ~199 s
vs 290-476 s for compile-on-first-call — restart-to-first-image drops
from ~10-12 min to ~7 min. The blob embeds only the PROGRAM; weights stay
ordinary call arguments, so checkpoint/LoRA swaps never invalidate it.

The reference has no analogue: its inference is a one-shot CLI that
rebuilds everything per run (/root/reference/inference.py:165-310).

Usage (opt-in; nothing changes unless enabled):

    pipe.enable_aot("/var/cache/idtpu_aot")   # or serve(..., aot_dir=...)

First call of each program variant looks for a blob; on a miss it
exports (trace+lower once), compiles via `Exported.call`, and saves the
blob atomically. Any load/run error falls back to the plain jit path —
AOT is an accelerator, never a correctness dependency.

Scope: single-device programs only. Mesh-sharded variants (tp_mesh set)
fall through to jit — exporting sharded programs ties the blob to a
device topology, which is a deploy-artifact decision we don't make here.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import jax
import numpy as np

_SCHEDULE_SERIALIZATIONS_DONE = False


def register_serializations() -> None:
    """Register the sampler schedule pytrees with jax.export (idempotent).
    Serialization needs every custom pytree node in the call signature
    registered by a stable name; auxdata is None for all three."""
    global _SCHEDULE_SERIALIZATIONS_DONE
    if _SCHEDULE_SERIALIZATIONS_DONE:
        return
    from jax import export as jexport

    from instancediffusion_tpu.samplers.ddim import DDIMSchedule
    from instancediffusion_tpu.samplers.dpm import DPMSchedule
    from instancediffusion_tpu.samplers.plms import PLMSSchedule

    for cls, name in (
        (PLMSSchedule, "instancediffusion_tpu.PLMSSchedule"),
        (DPMSchedule, "instancediffusion_tpu.DPMSchedule"),
        (DDIMSchedule, "instancediffusion_tpu.DDIMSchedule"),
    ):
        try:
            jexport.register_pytree_node_serialization(
                cls,
                serialized_name=name,
                serialize_auxdata=lambda aux: b"",
                deserialize_auxdata=lambda b: None,
            )
        except ValueError:
            # already registered (e.g. two pipelines in one process)
            pass
    _SCHEDULE_SERIALIZATIONS_DONE = True


def _arg_signature(args) -> str:
    """Stable string over pytree structure + leaf shapes/dtypes. str(treedef)
    names custom nodes (the schedule classes), so a sampler change or a
    cond-dict key change (e.g. MIS rows appearing) changes the signature."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        a = np.asarray(leaf) if np.isscalar(leaf) else leaf
        parts.append(f"{tuple(a.shape)}:{a.dtype}")
    return "|".join(parts)


class AOTProgramCache:
    """Directory of `jax.export` blobs; wrap() turns a jitted sample_fn
    into a callable that loads/saves its blob transparently."""

    def __init__(self, directory: str, save: bool = True):
        self.directory = directory
        self.save = save
        os.makedirs(directory, exist_ok=True)
        # loads: blob found+used; saves: blob exported+written;
        # fallbacks: errors that dropped a variant back to plain jit
        self.stats = {"loads": 0, "saves": 0, "fallbacks": 0}

    def _blob_path(self, key, args) -> str:
        h = hashlib.sha256()
        h.update(repr(key).encode())
        h.update(_arg_signature(args).encode())
        h.update(jax.default_backend().encode())
        h.update(jax.__version__.encode())
        sampler = key[-1]
        return os.path.join(
            self.directory, f"{sampler}-{h.hexdigest()[:20]}.jaxexport"
        )

    def _load(self, path):
        from jax import export as jexport

        if not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return jexport.deserialize(bytearray(f.read()))

    def _export(self, jit_fn, args):
        from jax import export as jexport

        shapes = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype)
            if np.isscalar(a)
            else jax.ShapeDtypeStruct(a.shape, a.dtype),
            args,
        )
        return jexport.export(jit_fn)(*shapes)

    def _save(self, exported, path) -> None:
        blob = exported.serialize()
        fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)  # atomic: concurrent processes race safely
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def wrap(self, key, jit_fn):
        """Resolve lazily on the first call (the blob path needs concrete
        arg shapes). Exported path replaces jit entirely for this variant:
        even a cache MISS routes through export -> Exported.call, which is
        measurably cheaper than jit's compile-on-first-call (it skips the
        second trace and hands XLA one pre-lowered module)."""
        register_serializations()
        state = {"resolved": False, "exported": None}

        def call(*args):
            if not state["resolved"]:
                state["resolved"] = True
                path = self._blob_path(key, args)
                try:
                    exported = self._load(path)
                    if exported is not None:
                        self.stats["loads"] += 1
                    else:
                        exported = self._export(jit_fn, args)
                        if self.save:
                            self._save(exported, path)
                            self.stats["saves"] += 1
                    state["exported"] = exported
                except Exception:
                    self.stats["fallbacks"] += 1
                    state["exported"] = None
            if state["exported"] is not None:
                try:
                    return state["exported"].call(*args)
                except Exception:
                    # e.g. a stale blob from an incompatible jax version;
                    # drop this variant to plain jit for the process life
                    self.stats["fallbacks"] += 1
                    state["exported"] = None
            return jit_fn(*args)

        return call
