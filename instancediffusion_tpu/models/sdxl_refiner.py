"""SDXL-Refiner UNet — the cascade's second stage, as a native model family.

The reference delegates refinement to an external pipeline
(`diffusers.StableDiffusionXLImg2ImgPipeline`, inference.py:112-129); this
module implements the refiner UNet itself on the same TPU-native stack as
the SD1.5 backbone (static layer plan, NHWC/HWIO, fused Pallas attention/
FF/norm kernels via the shared builders in models/unet.py).

Architecture (public sgm config `sd_xl_refiner.yaml`, UNetModel section):
384 base channels, channel_mult (1,2,4,4), 2 res blocks/level, depth-4
spatial transformers at ds 2 and 4 (+ middle), head dim 64 (heads vary by
level: 6/12/24), cross-attention context 1280 (OpenCLIP-bigG penultimate
hidden states), and an ADM vector conditioning y of 2560 = 1280-d pooled
text followed by five 256-d Fourier-embedded scalars (orig H/W, crop
top/left, aesthetic score), added to the time embedding through label_emb.
Prediction target: eps.

No fuser / ScaleU / first-conv swap — those are InstanceDiffusion's SD1.5
additions; the refiner is a plain (if large) SDXL UNet.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from instancediffusion_tpu.config import RefinerUNetConfig
from instancediffusion_tpu.nn import core as nn
from instancediffusion_tpu.models.unet import (
    LayerSpec,
    _apply_res_block,
    _apply_spatial_transformer,
    _init_res_block,
    _init_spatial_transformer,
)
from instancediffusion_tpu.ops.schedules import timestep_embedding

Params = dict[str, Any]


def build_refiner_plan(cfg: RefinerUNetConfig):
    """(input_blocks, middle_block, output_blocks) lists of LayerSpec —
    same walk as openaimodel's constructor, minus the fuser machinery."""
    mc = cfg.model_channels
    input_blocks: list[list[LayerSpec]] = [
        [LayerSpec("conv_in", cfg.in_channels, mc)]
    ]
    chans = [mc]
    ch = mc
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [LayerSpec("res", ch, mult * mc)]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                layers.append(LayerSpec("attn", ch, ch, ds))
            input_blocks.append(layers)
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_blocks.append([LayerSpec("down", ch, ch)])
            chans.append(ch)
            ds *= 2

    middle_block = [
        LayerSpec("res", ch, ch),
        LayerSpec("attn", ch, ch, ds),
        LayerSpec("res", ch, ch),
    ]

    output_blocks: list[list[LayerSpec]] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            layers = [LayerSpec("res", ch + ich, mc * mult)]
            ch = mc * mult
            if ds in cfg.attention_resolutions:
                layers.append(LayerSpec("attn", ch, ch, ds))
            if level and i == cfg.num_res_blocks:
                layers.append(LayerSpec("up", ch, ch))
                ds //= 2
            output_blocks.append(layers)

    return input_blocks, middle_block, output_blocks


def init_refiner_unet(key, cfg: RefinerUNetConfig) -> Params:
    input_plan, middle_plan, output_plan = build_refiner_plan(cfg)
    emb_ch = cfg.model_channels * 4
    keys = iter(jax.random.split(key, 8192))

    def init_layer(spec: LayerSpec) -> Params:
        if spec.kind == "conv_in":
            return {"conv": nn.init_conv2d(next(keys), spec.in_ch, spec.out_ch, 3)}
        if spec.kind == "res":
            return _init_res_block(next(keys), spec.in_ch, spec.out_ch, emb_ch)
        if spec.kind == "attn":
            return _init_spatial_transformer(
                next(keys), spec.out_ch, cfg.context_dim,
                cfg.transformer_depth, with_fuser=False,
            )
        if spec.kind in ("down", "up"):
            return {"conv": nn.init_conv2d(next(keys), spec.in_ch, spec.out_ch, 3)}
        raise ValueError(spec.kind)

    return {
        "time_embed": {
            "l1": nn.init_linear(next(keys), cfg.model_channels, emb_ch),
            "l2": nn.init_linear(next(keys), emb_ch, emb_ch),
        },
        # ADM conditioning MLP (openaimodel num_classes="sequential")
        "label_emb": {
            "l1": nn.init_linear(next(keys), cfg.adm_in_channels, emb_ch),
            "l2": nn.init_linear(next(keys), emb_ch, emb_ch),
        },
        "input_blocks": [[init_layer(s) for s in blk] for blk in input_plan],
        "middle_block": [init_layer(s) for s in middle_plan],
        "output_blocks": [[init_layer(s) for s in blk] for blk in output_plan],
        "out": {
            "norm": nn.init_norm(cfg.model_channels),
            "conv": nn.init_conv2d(
                next(keys), cfg.model_channels, cfg.out_channels, 3, zero=True
            ),
        },
    }


def refiner_adm_vector(
    pooled_text: jnp.ndarray,           # (B, 1280)
    orig_size: tuple[int, int] = (1024, 1024),
    crop: tuple[int, int] = (0, 0),
    aesthetic_score: float = 6.0,
) -> jnp.ndarray:
    """ADM vector y (B, 2560) in sgm's GeneralConditioner order: embedder-0
    (pooled OpenCLIP text, 1280) FIRST, then the ConcatTimestepEmbedderND
    outputs — orig H/W, crop top/left, aesthetic score, each Fourier-embedded
    at dim 256 with the same sinusoidal formula as timesteps (SDXL report
    §2.2; negative batches conventionally use aesthetic_score 2.5)."""
    b = pooled_text.shape[0]
    scalars = jnp.asarray(
        [orig_size[0], orig_size[1], crop[0], crop[1], aesthetic_score],
        jnp.float32,
    )
    emb = timestep_embedding(scalars, 256)          # (5, 256)
    emb = jnp.broadcast_to(emb.reshape(1, -1), (b, 5 * 256))
    return jnp.concatenate([pooled_text, emb.astype(pooled_text.dtype)], axis=1)


def apply_refiner_unet(
    params: Params,
    cfg: RefinerUNetConfig,
    x: jnp.ndarray,          # (B, H, W, 4) latent, NHWC
    timesteps: jnp.ndarray,  # (B,)
    context: jnp.ndarray,    # (B, 77, 1280)
    y: jnp.ndarray,          # (B, 2560) ADM vector (refiner_adm_vector)
    attn_impl: str = "auto",
) -> jnp.ndarray:
    """eps-prediction forward."""
    on_cpu = jax.devices()[0].platform == "cpu"
    if attn_impl == "auto":
        attn_impl = "pallas" if (cfg.efficient_attention and not on_cpu) else "xla"

    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = nn.linear(
        params["time_embed"]["l2"],
        nn.silu(nn.linear(params["time_embed"]["l1"], t_emb)),
    )
    emb = emb + nn.linear(
        params["label_emb"]["l2"],
        nn.silu(nn.linear(params["label_emb"]["l1"], y.astype(x.dtype))),
    )

    input_plan, middle_plan, output_plan = build_refiner_plan(cfg)

    def run_layer(spec: LayerSpec, p: Params, h):
        if spec.kind == "conv_in":
            return nn.conv2d(p["conv"], h, padding=1)
        if spec.kind == "res":
            return _apply_res_block(p, h, emb)
        if spec.kind == "attn":
            heads = spec.out_ch // cfg.num_head_channels
            return _apply_spatial_transformer(
                p, h, context.astype(h.dtype), None, heads, 0.0, None,
                attn_impl,
            )
        if spec.kind == "down":
            return nn.conv2d(p["conv"], h, stride=2, padding=1)
        if spec.kind == "up":
            return nn.conv2d(p["conv"], nn.upsample_nearest_2x(h), padding=1)
        raise ValueError(spec.kind)

    hs = []
    h = x
    for specs, ps in zip(input_plan, params["input_blocks"]):
        for spec, p in zip(specs, ps):
            h = run_layer(spec, p, h)
        hs.append(h)

    for spec, p in zip(middle_plan, params["middle_block"]):
        h = run_layer(spec, p, h)

    for specs, ps in zip(output_plan, params["output_blocks"]):
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        for spec, p in zip(specs, ps):
            h = run_layer(spec, p, h)

    h = nn.group_norm(params["out"]["norm"], h, act="silu")
    return nn.conv2d(params["out"]["conv"], h, padding=1)
