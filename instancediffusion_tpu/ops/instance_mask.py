"""Instance attention keep-mask for the gated self-attention (fuser).

Reference semantics (ldm/modules/attention.py:187-255), built on-device:
over the fuser's concatenated sequence [4096 visual tokens | 4*n_objs
grounding tokens | 64 seg tokens] at the 64x64 resolution only:

  * visual <-> visual: token i may attend token j iff they share an
    instance (sum_k m_k[i] m_k[j] >= 1); the diagonal is always kept
    (reference adds 1e-9 on the diagonal, attention.py:250-252)
  * box-token rows (0:n) and polygon-token rows (3n:4n) attend only their
    own instance's visual patches; point/scribble rows attend everything
    (attention.py:243-248)
  * visual -> grounding symmetric; grounding <-> grounding and all seg
    rows/cols unrestricted (init ones, attention.py:207)
  * a sample with all-zero att_masks, or drop_box_mask set, gets NO masking
    (attention.py:200) — handled per-sample so CFG's null half can share the
    batched forward

Output: boolean (B, 1, N, N) keep-mask consumed by ops.attention /
the Pallas flash kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def rasterize_boxes(boxes01: jnp.ndarray, image_size: int = 64) -> jnp.ndarray:
    """(.., n, 4) xyxy in [0,1] -> (.., n, S, S) binary box masks.

    Matches utils/input.py:34-37: rounded pixel bounds, ROWS indexed by x
    and COLS by y (the reference's att_masks[idx][x1:x2, y1:y2] = 1 quirk —
    reproduced for checkpoint compatibility)."""
    s = image_size
    px = jnp.round(boxes01 * s).astype(jnp.int32)
    x1, y1, x2, y2 = px[..., 0], px[..., 1], px[..., 2], px[..., 3]
    r = jnp.arange(s)
    row_in = (r >= x1[..., None]) & (r < x2[..., None])   # (.., n, S)
    col_in = (r >= y1[..., None]) & (r < y2[..., None])
    return (row_in[..., :, None] & col_in[..., None, :]).astype(jnp.float32)


def build_fuser_mask(
    att_masks: jnp.ndarray,        # (B, n_objs, S, S) binary, S*S visual tokens
    drop_box_mask: jnp.ndarray | bool = False,
    seg_tokens: int = 64,
) -> jnp.ndarray:
    b, n, s, _ = att_masks.shape
    wh = s * s
    ntot = wh + 4 * n + seg_tokens
    m = att_masks.reshape(b, n, wh)

    # visual<->visual: share-an-instance predicate + diagonal
    ind = jnp.einsum("bki,bkj->bij", m, m, preferred_element_type=jnp.float32)
    vis = ind >= 1.0
    vis = vis | jnp.eye(wh, dtype=bool)[None]

    inst = m > 0.0  # (B, n, wh)
    ones_rows = jnp.ones_like(inst)
    # rows: [box: restricted, point: open, scribble: open, polygon: restricted]
    grounding_rows = jnp.concatenate([inst, ones_rows, ones_rows, inst], axis=1)

    keep = jnp.ones((b, ntot, ntot), dtype=bool)
    keep = keep.at[:, :wh, :wh].set(vis)
    keep = keep.at[:, wh : wh + 4 * n, :wh].set(grounding_rows)
    keep = keep.at[:, :wh, wh : wh + 4 * n].set(
        jnp.swapaxes(grounding_rows, 1, 2)
    )

    # per-sample disable: all-zero masks (null/CFG half) or drop_box_mask
    has_mask = jnp.sum(m, axis=(1, 2)) > 0.0
    active = jnp.logical_and(has_mask, jnp.logical_not(drop_box_mask))
    keep = jnp.where(active[:, None, None], keep, True)
    return keep[:, None]  # (B, 1, N, N)
