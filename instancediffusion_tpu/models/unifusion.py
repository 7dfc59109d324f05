"""UniFusion grounding tokenizer — fuses CLIP phrase embeddings with
location encodings into grounding tokens.

Re-design of the reference UniFusion
(ldm/modules/diffusionmodules/text_grounding_net.py:7-313):

  * per-modality Fourier encodings: boxes (16 freqs x 2 x 4 = 128-d),
    points (64-d), scribbles (20 pts -> 1280-d), mask polygons
    (256 pts -> 16384-d)
  * instance-mask (seg) branch: stacked binary masks (B, max_objs, 512, 512)
    treated as channels -> 3x3 conv to 3ch -> ConvNeXt-T -> 64 tokens x
    3072 + learned positional embedding
  * each location encoding is concat'd with the 768-d CLIP phrase embedding
    and pushed through its own 3-layer MLP (-> 3072 -> 3072 -> 768); the seg
    branch MLP takes the 3072-d seg tokens alone
  * learned null embeddings replace padded/dropped entries
  * output: concat of [box, point, scribble, polygon] tokens (max_objs each)
    + 64 seg tokens = 4*30+64 = 184 grounding tokens (B, 184, 768)

TPU-first: modality dropout is data (traced booleans), not Python control
flow, so train/test paths share one compiled graph; all embedding math runs
on device inside the jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from instancediffusion_tpu.config import UniFusionConfig
from instancediffusion_tpu.models.convnext import apply_convnext_tiny, init_convnext_tiny
from instancediffusion_tpu.nn import core as nn
from instancediffusion_tpu.ops.schedules import fourier_embed

Params = dict[str, Any]
Array = jnp.ndarray


@dataclass
class ModalityDrops:
    """Which grounding modalities are dropped for this forward.

    Fields may be Python bools (inference — resolved at trace time) or
    traced jnp bool scalars (training dropout). Mirrors the reference's
    drop_{point,box,scribble,polygons,segs} flags
    (text_grounding_net.py:104-213)."""

    drop_point: Any = False
    drop_box: Any = False
    drop_scribble: Any = False
    drop_polygons: Any = False
    drop_segs: Any = False

    @staticmethod
    def test_defaults(cfg: UniFusionConfig) -> "ModalityDrops":
        """reset_dropout_test (text_grounding_net.py:104-116)."""
        return ModalityDrops(
            drop_point=cfg.test_drop_points,
            drop_box=cfg.test_drop_boxes,
            drop_scribble=cfg.test_drop_scribbles,
            drop_polygons=cfg.test_drop_masks,
            drop_segs=cfg.test_drop_masks,
        )

    def resolve_keep_box(self) -> "ModalityDrops":
        """If every modality is dropped, keep boxes
        (text_grounding_net.py:211-213)."""
        all_dropped = jnp.logical_and(
            jnp.logical_and(self.drop_point, self.drop_box),
            jnp.logical_and(
                jnp.logical_and(self.drop_scribble, self.drop_polygons),
                self.drop_segs,
            ),
        )
        drop_box = jnp.logical_and(self.drop_box, jnp.logical_not(all_dropped))
        return ModalityDrops(
            self.drop_point, drop_box, self.drop_scribble,
            self.drop_polygons, self.drop_segs,
        )


def train_modality_drops(key: jax.Array, cfg: UniFusionConfig) -> ModalityDrops:
    """Per-batch training dropout as traced data: 10% independent drop per
    modality, then the reset_dropout_train hierarchy fixups
    (text_grounding_net.py:126-209): masks imply keeping box+point; box
    implies keeping point; 10% point-only; 10% seg-only (boxes+points+segs,
    no scribbles/polygons is unchanged... seg-only keeps box/point/seg)."""
    ks = jax.random.split(key, 6)
    u = lambda i: jax.random.uniform(ks[i]) < 0.1
    drop_box, drop_point, drop_scribble, drop_polygons = u(0), u(1), u(2), u(3)
    drop_segs = drop_polygons

    # hierarchy fixups (reset_dropout_train lines 127-131)
    keep_masks = jnp.logical_not(drop_polygons)
    drop_box = jnp.logical_and(drop_box, jnp.logical_not(keep_masks))
    drop_point = jnp.logical_and(
        drop_point,
        jnp.logical_not(jnp.logical_or(jnp.logical_not(drop_box), keep_masks)),
    )

    # 10% keep-point-only (lines 133-141)
    keep_point_only = jax.random.uniform(ks[4]) < 0.1
    drop_point = jnp.where(keep_point_only, False, drop_point)
    drop_box = jnp.where(keep_point_only, True, drop_box)
    drop_scribble = jnp.where(keep_point_only, True, drop_scribble)
    drop_polygons = jnp.where(keep_point_only, True, drop_polygons)
    drop_segs = jnp.where(keep_point_only, True, drop_segs)

    # 10% keep-seg-only (lines 163-171): box+point+seg kept, scribbles
    # dropped, polygons kept (drop_polygons=False per reference)
    keep_seg_only = jnp.logical_and(
        jax.random.uniform(ks[5]) < 0.1, jnp.logical_not(drop_segs)
    )
    drop_point = jnp.where(keep_seg_only, False, drop_point)
    drop_box = jnp.where(keep_seg_only, False, drop_box)
    drop_scribble = jnp.where(keep_seg_only, True, drop_scribble)
    drop_polygons = jnp.where(keep_seg_only, False, drop_polygons)
    drop_segs = jnp.where(keep_seg_only, False, drop_segs)

    return ModalityDrops(drop_point, drop_box, drop_scribble, drop_polygons, drop_segs)


# ---------------------------------------------------------------------------
# Grounding input bundle (the GroundingNetInput contract,
# grounding_input/text_grounding_tokinzer_input.py:13-94)
# ---------------------------------------------------------------------------


def null_grounding(batch: int, max_objs: int, cfg: UniFusionConfig) -> dict:
    """All-zeros grounding (CFG null / guidance drop). Zero `masks` routes
    every token to the learned null embeddings inside apply_unifusion."""
    z = jnp.zeros
    return {
        "boxes": z((batch, max_objs, 4), jnp.float32),
        "masks": z((batch, max_objs), jnp.float32),
        "text_masks": z((batch, max_objs), jnp.float32),
        "positive_embeddings": z((batch, max_objs, cfg.in_dim), jnp.float32),
        "scribbles": z((batch, max_objs, cfg.n_scribble_points * 2), jnp.float32),
        "polygons": z((batch, max_objs, cfg.n_polygon_points * 2), jnp.float32),
        "segs": z((batch, max_objs, cfg.seg_resize_input, cfg.seg_resize_input), jnp.float32),
        "points": z((batch, max_objs, 2), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_mlp(key, in_dim, mid_dim, out_dim) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "l0": nn.init_linear(ks[0], in_dim, mid_dim),
        "l1": nn.init_linear(ks[1], mid_dim, mid_dim),
        "l2": nn.init_linear(ks[2], mid_dim, out_dim),
    }


def _apply_mlp(p, x):
    x = nn.silu(nn.linear(p["l0"], x))
    x = nn.silu(nn.linear(p["l1"], x))
    return nn.linear(p["l2"], x)


def modality_dims(cfg: UniFusionConfig) -> dict[str, int]:
    return {
        "box": cfg.fourier_freqs * 2 * 4,
        "point": cfg.fourier_freqs * 2 * 2,
        "scribble": cfg.fourier_freqs_polygons * 2 * cfg.n_scribble_points * 2,
        "polygon": cfg.fourier_freqs_polygons * 2 * cfg.n_polygon_points * 2,
        "seg": cfg.convnext_feature_dim,
    }


def init_unifusion(key, cfg: UniFusionConfig) -> Params:
    dims = modality_dims(cfg)
    keys = iter(jax.random.split(key, 16))
    p: Params = {"null_positive": jnp.zeros((cfg.in_dim,), jnp.float32)}
    if cfg.train_add_boxes:
        p["mlp_box"] = _init_mlp(next(keys), cfg.in_dim + dims["box"], cfg.mid_dim, cfg.out_dim)
        p["null_box"] = jnp.zeros((dims["box"],), jnp.float32)
    if cfg.train_add_points:
        p["mlp_point"] = _init_mlp(next(keys), cfg.in_dim + dims["point"], cfg.mid_dim, cfg.out_dim)
        p["null_point"] = jnp.zeros((dims["point"],), jnp.float32)
    if cfg.train_add_scribbles:
        p["mlp_scribble"] = _init_mlp(next(keys), cfg.in_dim + dims["scribble"], cfg.mid_dim, cfg.out_dim)
        p["null_scribble"] = jnp.zeros((dims["scribble"],), jnp.float32)
    if cfg.train_add_masks:
        p["mlp_polygon"] = _init_mlp(next(keys), cfg.in_dim + dims["polygon"], cfg.mid_dim, cfg.out_dim)
        p["null_polygon"] = jnp.zeros((dims["polygon"],), jnp.float32)
        # seg branch (text_grounding_net.py:31-39)
        p["mlp_seg"] = _init_mlp(next(keys), dims["seg"], cfg.mid_dim, cfg.out_dim)
        p["null_seg"] = jnp.zeros((dims["seg"],), jnp.float32)
        p["in_conv"] = nn.init_conv2d(next(keys), cfg.seg_channels, 3, 3)
        p["convnext"] = init_convnext_tiny(
            next(keys), depths=cfg.convnext_depths, dims=cfg.convnext_dims
        )
        p["pos_embedding"] = (
            jax.random.normal(next(keys), (1, cfg.num_seg_tokens, dims["seg"])) * 0.02
        )
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def num_grounding_tokens(cfg: UniFusionConfig, max_objs: int) -> int:
    n = 0
    for flag in (cfg.train_add_boxes, cfg.train_add_points,
                 cfg.train_add_scribbles, cfg.train_add_masks):
        n += max_objs if flag else 0
    if cfg.use_segs:
        n += cfg.num_seg_tokens
    return n


def apply_unifusion(
    params: Params,
    cfg: UniFusionConfig,
    g: dict,
    drops: ModalityDrops,
) -> tuple[Array, Array]:
    """-> (objs (B, G, out_dim), drop_box_mask scalar bool).

    Token order matches the reference concat (text_grounding_net.py:289-298):
    [box, point, scribble, polygon, seg].
    """
    drops = drops.resolve_keep_box()
    boxes = g["boxes"]
    b, n, _ = boxes.shape
    masks = g["masks"][..., None]  # (B, N, 1)
    pos_emb = g["positive_embeddings"]

    # Padded phrases -> learned null (text_grounding_net.py:248)
    pos_emb = pos_emb * masks + (1 - masks) * params["null_positive"]

    dtype = pos_emb.dtype
    tokens = []

    def gate(mask_val, drop_flag):
        # dropped modality => zero mask => null embedding everywhere
        return jnp.where(drop_flag, jnp.zeros_like(mask_val), mask_val)

    if cfg.train_add_boxes:
        emb = fourier_embed(boxes, cfg.fourier_freqs).astype(dtype)
        m = gate(masks, drops.drop_box)
        emb = emb * m + (1 - m) * params["null_box"]
        tokens.append(_apply_mlp(params["mlp_box"], jnp.concatenate([pos_emb, emb], -1)))

    if cfg.train_add_points:
        points = g.get("points")
        if points is None:  # derivable from boxes (text_grounding_net.py:219-220)
            points = (boxes[:, :, :2] + boxes[:, :, 2:]) / 2.0
        emb = fourier_embed(points, cfg.fourier_freqs).astype(dtype)
        m = gate(masks, drops.drop_point)
        emb = emb * m + (1 - m) * params["null_point"]
        tokens.append(_apply_mlp(params["mlp_point"], jnp.concatenate([pos_emb, emb], -1)))

    if cfg.train_add_scribbles:
        scribbles = g["scribbles"]
        emb = fourier_embed(scribbles, cfg.fourier_freqs_polygons).astype(dtype)
        # valid if the instance exists OR the scribble is nonzero
        # (text_grounding_net.py:267)
        m = ((jnp.sum(scribbles, -1, keepdims=True) + masks) > 0).astype(dtype)
        m = gate(m, drops.drop_scribble)
        emb = emb * m + (1 - m) * params["null_scribble"]
        tokens.append(_apply_mlp(params["mlp_scribble"], jnp.concatenate([pos_emb, emb], -1)))

    if cfg.train_add_masks:
        polygons = g["polygons"]
        emb = fourier_embed(polygons, cfg.fourier_freqs_polygons).astype(dtype)
        m = ((jnp.sum(polygons, -1, keepdims=True) + masks) > 0).astype(dtype)
        m = gate(m, drops.drop_polygons)
        emb = emb * m + (1 - m) * params["null_polygon"]
        tokens.append(_apply_mlp(params["mlp_polygon"], jnp.concatenate([pos_emb, emb], -1)))

    if cfg.use_segs:
        segs = g["segs"]  # (B, max_objs, S, S) binary masks as channels
        if segs.shape[-1] != cfg.seg_resize_input:
            segs = nn.resize_nearest(
                segs.transpose(0, 2, 3, 1), cfg.seg_resize_input
            )
        else:
            segs = segs.transpose(0, 2, 3, 1)  # NHWC, C = max_objs(=30)
        feat = nn.conv2d(params["in_conv"], segs.astype(dtype), padding=1)
        feat = apply_convnext_tiny(params["convnext"], feat)  # (B,16,16,768)
        # Reference reshape semantics (text_grounding_net.py:230-231):
        # (B,768,16,16) -> (B, 3072, 64) -> (B, 64, 3072)
        fb, fh, fw, fc = feat.shape
        feat = feat.transpose(0, 3, 1, 2).reshape(fb, -1, cfg.num_seg_tokens)
        feat = feat.transpose(0, 2, 1)  # (B, 64, 3072)
        # batch-level presence: any nonzero seg pixel (text_grounding_net.py:279)
        m = (jnp.sum(g["segs"], axis=(1, 2, 3)) > 0).astype(dtype)[:, None, None]
        m = gate(m, drops.drop_segs)
        seg_emb = feat * m + (1 - m) * params["null_seg"]
        seg_emb = seg_emb + params["pos_embedding"].astype(dtype)
        tokens.append(_apply_mlp(params["mlp_seg"], seg_emb))

    objs = jnp.concatenate(tokens, axis=1)
    drop_box_mask = jnp.logical_and(drops.drop_box, drops.drop_polygons)
    return objs, drop_box_mask
