"""Inference-side grounding batch preparation.

Equivalent of the reference's `prepare_batch` (utils/input.py:41-125) +
`GroundingNetInput.prepare/get_null_input`
(grounding_input/text_grounding_tokinzer_input.py:13-94): convert a demo
meta dict (phrases/locations/points/scribbles/polygons/segs) into the
zero-padded (max_objs) grounding tensor bundle consumed by UniFusion.

Host-side NumPy only; phrase CLIP embedding is injected by the caller
(a jitted CLIP forward). Box->att_mask rasterization happens on device
(ops/instance_mask.rasterize_boxes) per the BASELINE "conditioning never
round-trips to host" requirement, so no att_masks here.
"""

from __future__ import annotations

import numpy as np

N_SCRIBBLE_POINTS = 20
N_POLYGON_POINTS = 256
SEG_SIZE = 512

# Sentinel for prepare_grounding's phrase_embeddings entries: "this slot HAS
# a phrase embedding (set text_masks), but the vector is injected later on
# device" — the pipeline keeps the pooled CLIP rows device-side and scatters
# them into positive_embeddings inside the jitted sampling program, so the
# host never blocks on a device read between text encode and sample dispatch
# (the double-buffering prerequisite; see pipeline._inject_embeddings).
DEFER_EMBEDDING = "defer-embedding"


def zero_grounding_np(
    batch: int, max_objs: int = 30, in_dim: int = 768
) -> dict[str, np.ndarray]:
    z = np.zeros
    return {
        "boxes": z((batch, max_objs, 4), np.float32),
        "masks": z((batch, max_objs), np.float32),
        "text_masks": z((batch, max_objs), np.float32),
        "positive_embeddings": z((batch, max_objs, in_dim), np.float32),
        "scribbles": z((batch, max_objs, N_SCRIBBLE_POINTS * 2), np.float32),
        "polygons": z((batch, max_objs, N_POLYGON_POINTS * 2), np.float32),
        "segs": z((batch, max_objs, SEG_SIZE, SEG_SIZE), np.float32),
        "points": z((batch, max_objs, 2), np.float32),
    }


def prepare_grounding(
    meta: dict,
    phrase_embeddings: list[np.ndarray | None],
    batch: int = 1,
    max_objs: int = 30,
    in_dim: int = 768,
) -> dict[str, np.ndarray]:
    """meta carries per-instance lists: locations (xyxy [0,1]), and optional
    points / scribbles / polygons / segs; phrase_embeddings[i] is the
    (in_dim,) pooled CLIP feature for phrase i (None -> null).

    Mirrors utils/input.py:53-89 incl. the text_mask completion."""
    out = zero_grounding_np(1, max_objs, in_dim)
    locations = meta["locations"]
    n = min(len(locations), max_objs)
    polygons = meta.get("polygons") or [None] * n
    scribbles = meta.get("scribbles") or [None] * n
    segs = meta.get("segs")
    points = meta.get("points") or [None] * n

    for i in range(n):
        out["boxes"][0, i] = np.asarray(locations[i], np.float32)
        out["masks"][0, i] = 1.0
        if phrase_embeddings[i] is not None:
            out["text_masks"][0, i] = 1.0
            if phrase_embeddings[i] is not DEFER_EMBEDDING:
                out["positive_embeddings"][0, i] = np.asarray(
                    phrase_embeddings[i], np.float32
                ).reshape(-1)
        if polygons[i] is not None:
            out["polygons"][0, i] = np.asarray(polygons[i], np.float32)
        if scribbles[i] is not None:
            out["scribbles"][0, i] = np.asarray(scribbles[i], np.float32)
        if segs is not None and len(segs) > i and segs[i] is not None:
            out["segs"][0, i] = np.asarray(segs[i], np.float32).reshape(
                SEG_SIZE, SEG_SIZE
            )
        if points[i] is not None:
            out["points"][0, i] = np.asarray(points[i], np.float32)

    # text_mask scalar/list completion (utils/input.py:21-31,83)
    tm = meta.get("text_mask")
    if tm is not None:
        mult = np.ones(max_objs, np.float32)
        if isinstance(tm, (int, float)):
            mult *= tm
        else:
            for i, v in enumerate(tm):
                mult[i] = v
        out["text_masks"][0] *= mult

    return {k: np.repeat(v, batch, axis=0) for k, v in out.items()}


def instance_grounding_from_batch(batch: dict, k: int) -> dict:
    """Training-side per-instance grounding (the reference's instance_meta,
    decode_item.py:724-739): a full max_objs-padded grounding dict where
    slot 0 holds instance k of every sample and all other slots are null.

    Zero-copy reassembly from the training batch rows (the reference
    materializes one (1,...) tensor dict per instance per sample, incl. a
    duplicated 512x512 seg raster). text/image masks are forced to 1 for
    the instance slot regardless of random embedding dropout, matching
    decode_item.py:734-736. Works on np or jnp batches."""
    b, n = batch["masks"].shape

    def pad_any(a):
        a1 = a[:, k : k + 1]
        if isinstance(a1, np.ndarray):
            z = np.zeros((b, n - 1) + a1.shape[2:], a1.dtype)
            return np.concatenate([a1, z], axis=1)
        import jax.numpy as jnp

        z = jnp.zeros((b, n - 1) + a1.shape[2:], a1.dtype)
        return jnp.concatenate([a1, z], axis=1)

    on = pad_any(batch["masks"])  # (B, N) with only slot 0 populated
    return {
        "boxes": pad_any(batch["boxes"]),
        "masks": on,
        "text_masks": on,
        "positive_embeddings": pad_any(batch["text_embeddings"]),
        "scribbles": pad_any(batch["scribbles"]),
        "polygons": pad_any(batch["polygons"]),
        "segs": pad_any(batch["segs"]),
        "points": pad_any(batch["points"]),
    }


def prepare_instance_meta(meta: dict, i: int) -> dict:
    """Single-instance meta for a MIS trajectory (utils/input.py:130-144):
    instance phrase doubles as the prompt."""
    return {
        "phrases": [meta["phrases"][i]],
        "locations": [meta["locations"][i]],
        "polygons": [meta["polygons"][i]] if meta.get("polygons") else None,
        "segs": [meta["segs"][i]] if meta.get("segs") is not None else None,
        "scribbles": [meta["scribbles"][i]] if meta.get("scribbles") else None,
        "points": [meta["points"][i]] if meta.get("points") else None,
        "alpha_type": meta.get("alpha_type"),
        "prompt": meta["phrases"][i],
    }
