"""Host-side conditioning geometry: COCO RLE masks, scribble/polygon point
sampling, coordinate rescaling.

Re-implements the reference's helpers without pycocotools/skimage (absent
here):
  * COCO compressed-RLE decode/encode in NumPy
    (reference: pycocotools via decode_item.py:73-76)
  * sample_random_points_from_mask  (decode_item.py:110-140)
  * sample_sparse_points_from_mask  (decode_item.py:218-254) — boundary
    points come from cv2.findContours instead of skimage.find_contours
    (same uniform-boundary-sampling semantics; exact point sets differ)
  * sample_uniform_sparse_points    (decode_item.py:186-216)
  * reorder_scribbles / equally_spaced_sampling_with_replacement
    (decode_item.py:80-107)
  * convert_points, rescale_box/points/scribbles (utils/input.py:152-159,
    inference.py:132-147)

All random sampling takes an explicit np.random.Generator for determinism
(the reference uses global numpy state — a parity-test hazard SURVEY §7
flags)."""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# COCO compressed RLE
# ---------------------------------------------------------------------------


def rle_decode(rle: dict) -> np.ndarray:
    """{'size': [h, w], 'counts': str|bytes|list} -> (h, w, 1) uint8 mask.

    COCO RLE is column-major runs alternating 0/1; the compressed string
    packs run lengths 5 bits at a time (LEB128-style with sign trick and
    delta coding from the second run on)."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, list):  # uncompressed
        runs = np.asarray(counts, dtype=np.int64)
    else:
        if isinstance(counts, str):
            counts = counts.encode("ascii")
        # native C++ fast path (native/dataops.cpp), exact NumPy fallback below
        from instancediffusion_tpu.data._native import rle_decode_native

        nat = rle_decode_native(counts, int(h), int(w))
        if nat is not None:
            return nat[:, :, None]
        runs = []
        i = 0
        prev = 0
        n = len(counts)
        while i < n:
            x = 0
            k = 0
            more = True
            while more:
                c = counts[i] - 48
                x |= (c & 0x1F) << (5 * k)
                more = bool(c & 0x20)
                i += 1
                k += 1
                if not more and (c & 0x10):
                    x |= -1 << (5 * k)
            if len(runs) > 2:
                x += runs[-2]
            runs.append(x)
            prev = x
        runs = np.asarray(runs, dtype=np.int64)
    vals = np.zeros(len(runs), dtype=np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, runs)
    total = h * w
    if flat.size < total:
        flat = np.concatenate([flat, np.zeros(total - flat.size, np.uint8)])
    mask = flat[:total].reshape(w, h).T  # column-major
    return mask[:, :, None]


def rle_encode(mask: np.ndarray) -> dict:
    """(h, w) or (h, w, 1) binary mask -> compressed COCO RLE dict."""
    if mask.ndim == 3:
        mask = mask[:, :, 0]
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).T.reshape(-1)
    # run lengths, starting with a zero-run
    change = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(bounds).tolist()
    if flat[0] == 1:
        runs = [0] + runs
    # delta-code then 5-bit pack
    out = bytearray()
    for i, x in enumerate(runs):
        if i > 2:
            x -= runs[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and not (x == -1 and (c & 0x10))
            if more:
                c |= 0x20
            out.append(c + 48)
    return {"size": [h, w], "counts": out.decode("ascii")}


def decode_to_binary_mask(rle: dict) -> np.ndarray:
    """decodeToBinaryMask (decode_item.py:73-76): -> (h, w, 1) bool."""
    return rle_decode(rle).astype(bool)


# ---------------------------------------------------------------------------
# Point sampling
# ---------------------------------------------------------------------------


def _sort_by_origin_distance(points):
    return sorted(points, key=lambda p: float(np.hypot(p[0], p[1])))


def sample_random_points_from_mask(
    mask: np.ndarray, k: int, rng: np.random.Generator | None = None
) -> list[float]:
    """k random foreground pixels, sorted by distance to (0,0), flattened
    [x1,y1,...] with x=col, y=row (decode_item.py:110-140)."""
    rng = rng or np.random.default_rng()
    m = mask[:, :, 0]
    nz = np.transpose(np.nonzero(m))
    if len(nz) == 0:
        return [0.0] * (k * 2)
    replace = len(nz) < k
    idx = rng.choice(len(nz), k, replace=replace)
    pts = nz[idx]  # (k, 2) as (row, col)
    pts = sorted(pts, key=lambda x: float(np.linalg.norm(x)))
    out: list[float] = []
    for p in pts:
        out.append(float(p[1]))
        out.append(float(p[0]))
    return out


def mask_boundary_points(mask: np.ndarray) -> np.ndarray:
    """All boundary pixels of a binary (H, W) mask as (M, 2) (x, y) float,
    via cv2 contours (replacing skimage.find_contours)."""
    import cv2

    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_LIST, cv2.CHAIN_APPROX_NONE
    )
    if not contours:
        return np.zeros((0, 2), np.float32)
    pts = np.concatenate([c.reshape(-1, 2) for c in contours], axis=0)
    return pts.astype(np.float32)  # already (x, y)


def sample_uniform_sparse_points(
    binary_mask: np.ndarray, k: int, rng: np.random.Generator | None = None
) -> list[tuple[float, float]]:
    """Interior sampling (decode_item.py:186-216): rank foreground pixels by
    distance to the centroid, split into k segments, take each segment's
    middle point. Returns [(x, y), ...]."""
    rng = rng or np.random.default_rng()
    fg = np.argwhere(binary_mask == 1)
    if len(fg) == 0:
        return []
    if len(fg) < k:
        return [
            (float(p[1]), float(p[0]))
            for p in (fg[rng.integers(0, len(fg))] for _ in range(k))
        ]
    center = fg.mean(axis=0)
    order = np.argsort(np.linalg.norm(fg - center, axis=1), kind="stable")
    fg = fg[order]
    per = len(fg) // k
    out = []
    for i in range(k):
        seg = fg[i * per : (i + 1) * per]
        p = seg[len(seg) // 2]
        out.append((float(p[1]), float(p[0])))
    return out


def sample_sparse_points_from_mask(
    mask: np.ndarray, k: int, rng: np.random.Generator | None = None
) -> list[float] | None:
    """Mask-polygon point set (decode_item.py:218-254): k/2 uniformly-spaced
    boundary points + k/2 interior points, sorted by distance to origin,
    flattened [x1,y1,...]. None when the mask has no boundary."""
    n_polygons = k // 2
    m = mask[:, :, 0]
    boundary = mask_boundary_points(m)
    if boundary.shape[0] == 0:
        return None
    idx = np.linspace(0, boundary.shape[0] - 1, n_polygons).astype(int)
    sampled_boundary = [(float(x), float(y)) for x, y in boundary[idx]]
    inside = sample_uniform_sparse_points(m, k - len(sampled_boundary), rng)
    pts = _sort_by_origin_distance(inside + sampled_boundary)
    out: list[float] = []
    for x, y in pts:
        out.append(x)
        out.append(y)
    return out


def equally_spaced_sampling_with_replacement(points_list, sample_size):
    """decode_item.py:80-103."""
    if sample_size <= len(points_list):
        gap = len(points_list) // sample_size
        return [points_list[i * gap] for i in range(sample_size)]
    return [
        points_list[(i * len(points_list)) // sample_size % len(points_list)]
        for i in range(sample_size)
    ]


def reorder_scribbles(scribbles):
    """decode_item.py:105-107: sort by distance to origin, resample to 20."""
    scribbles = _sort_by_origin_distance(scribbles)
    scribbles = equally_spaced_sampling_with_replacement(scribbles, 20)
    return _sort_by_origin_distance(scribbles)


# ---------------------------------------------------------------------------
# Coordinate rescaling (inference.py:132-147, utils/input.py:152-159)
# ---------------------------------------------------------------------------


def rescale_box_xywh(bbox, width, height):
    """xywh pixels -> xyxy in [0,1]."""
    return [
        bbox[0] / width,
        bbox[1] / height,
        (bbox[0] + bbox[2]) / width,
        (bbox[1] + bbox[3]) / height,
    ]


def point_from_box(box01):
    return [(box01[0] + box01[2]) / 2.0, (box01[1] + box01[3]) / 2.0]


def rescale_points(point, width, height):
    return [point[0] / float(width), point[1] / float(height)]


def rescale_scribbles(scribbles, width, height):
    return [[s[0] / float(width), s[1] / float(height)] for s in scribbles]


def convert_points(points, width, height):
    """Flat [x1,y1,...] pixel list -> [0,1]-relative (utils/input.py:152-159)."""
    out = list(points)
    for i in range(len(out)):
        if i % 2 == 0:
            out[i] = min(out[i] / width, 1.0)
        else:
            out[i] = min(out[i] / height, 1.0)
    return out
