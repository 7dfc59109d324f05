"""AutoencoderKL (SD1.5 VAE), TPU-native NHWC functional implementation.

Reference: ldm/models/autoencoder.py:12-37 +
ldm/modules/diffusionmodules/model.py (Encoder :368-460, Decoder :462-570,
ResnetBlock :83-140, AttnBlock :148-202, Down/Upsample :42-80) +
DiagonalGaussianDistribution (ldm/modules/distributions/distributions.py:24-50).

SD1.5 shape: ch 128, ch_mult (1,2,4,4), 2 res blocks, z=4, no per-level
attention (attn_resolutions=()), single mid AttnBlock, scale_factor 0.18215.
encode() returns a *sampled* latent x scale (autoencoder.py:27-31);
decode() divides by scale first. All norms are GroupNorm(32, eps=1e-6) in
fp32; swish nonlinearity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from instancediffusion_tpu.config import VAEConfig
from instancediffusion_tpu.nn import core as nn

Params = dict[str, Any]


def _init_res(key, in_ch, out_ch) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "norm1": nn.init_norm(in_ch),
        "conv1": nn.init_conv2d(ks[0], in_ch, out_ch, 3),
        "norm2": nn.init_norm(out_ch),
        "conv2": nn.init_conv2d(ks[1], out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["nin_shortcut"] = nn.init_conv2d(ks[2], in_ch, out_ch, 1)
    return p


def _apply_res(p, x):
    h = nn.conv2d(p["conv1"], nn.group_norm(p["norm1"], x, eps=1e-6, act="silu"), padding=1)
    h = nn.conv2d(p["conv2"], nn.group_norm(p["norm2"], h, eps=1e-6, act="silu"), padding=1)
    if "nin_shortcut" in p:
        x = nn.conv2d(p["nin_shortcut"], x, padding=0)
    return x + h


def _init_attn(key, ch) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "norm": nn.init_norm(ch),
        "q": nn.init_conv2d(ks[0], ch, ch, 1),
        "k": nn.init_conv2d(ks[1], ch, ch, 1),
        "v": nn.init_conv2d(ks[2], ch, ch, 1),
        "proj_out": nn.init_conv2d(ks[3], ch, ch, 1),
    }


def _apply_attn(p, x):
    """Single-head spatial self-attention (model.py:176-202), fp32 softmax."""
    b, h, w, c = x.shape
    hn = nn.group_norm(p["norm"], x, eps=1e-6)
    q = nn.conv2d(p["q"], hn, padding=0).reshape(b, h * w, c)
    k = nn.conv2d(p["k"], hn, padding=0).reshape(b, h * w, c)
    v = nn.conv2d(p["v"], hn, padding=0).reshape(b, h * w, c)
    sim = jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32)
    sim = sim * (c ** -0.5)
    attn = jax.nn.softmax(sim, axis=-1).astype(x.dtype)
    out = jnp.einsum("bnm,bmc->bnc", attn, v, preferred_element_type=x.dtype)
    out = nn.conv2d(p["proj_out"], out.reshape(b, h, w, c), padding=0)
    return x + out


def _downsample(p, x):
    """stride-2 conv with the reference's asymmetric (0,1,0,1) padding
    (model.py:71-77)."""
    return nn.conv2d(p, x, stride=2, padding=[(0, 1), (0, 1)])


# ---------------------------------------------------------------------------
# Encoder / Decoder
# ---------------------------------------------------------------------------


def init_encoder(key, cfg: VAEConfig) -> Params:
    keys = iter(jax.random.split(key, 256))
    in_ch_mult = (1,) + tuple(cfg.ch_mult)
    p: Params = {"conv_in": nn.init_conv2d(next(keys), cfg.in_channels, cfg.ch, 3)}
    p["down"] = []
    block_in = cfg.ch
    for i_level in range(len(cfg.ch_mult)):
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        level: Params = {"block": []}
        for _ in range(cfg.num_res_blocks):
            level["block"].append(_init_res(next(keys), block_in, block_out))
            block_in = block_out
        if i_level != len(cfg.ch_mult) - 1:
            level["downsample"] = nn.init_conv2d(next(keys), block_in, block_in, 3)
        p["down"].append(level)
    p["mid"] = {
        "block_1": _init_res(next(keys), block_in, block_in),
        "attn_1": _init_attn(next(keys), block_in),
        "block_2": _init_res(next(keys), block_in, block_in),
    }
    out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    p["norm_out"] = nn.init_norm(block_in)
    p["conv_out"] = nn.init_conv2d(next(keys), block_in, out_ch, 3)
    return p


def apply_encoder(p: Params, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    h = nn.conv2d(p["conv_in"], x, padding=1)
    for i_level, level in enumerate(p["down"]):
        for blk in level["block"]:
            h = _apply_res(blk, h)
        if "downsample" in level:
            h = _downsample(level["downsample"], h)
    h = _apply_res(p["mid"]["block_1"], h)
    h = _apply_attn(p["mid"]["attn_1"], h)
    h = _apply_res(p["mid"]["block_2"], h)
    h = nn.group_norm(p["norm_out"], h, eps=1e-6, act="silu")
    return nn.conv2d(p["conv_out"], h, padding=1)


def init_decoder(key, cfg: VAEConfig) -> Params:
    keys = iter(jax.random.split(key, 256))
    block_in = cfg.ch * cfg.ch_mult[-1]
    p: Params = {"conv_in": nn.init_conv2d(next(keys), cfg.z_channels, block_in, 3)}
    p["mid"] = {
        "block_1": _init_res(next(keys), block_in, block_in),
        "attn_1": _init_attn(next(keys), block_in),
        "block_2": _init_res(next(keys), block_in, block_in),
    }
    # built in reversed level order, stored finest-first (model.py:522 insert(0))
    up_rev = []
    for i_level in reversed(range(len(cfg.ch_mult))):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        level: Params = {"block": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["block"].append(_init_res(next(keys), block_in, block_out))
            block_in = block_out
        if i_level != 0:
            level["upsample"] = nn.init_conv2d(next(keys), block_in, block_in, 3)
        up_rev.append(level)
    p["up"] = up_rev[::-1]
    p["norm_out"] = nn.init_norm(block_in)
    p["conv_out"] = nn.init_conv2d(next(keys), block_in, cfg.out_ch, 3)
    return p


def apply_decoder(p: Params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    h = nn.conv2d(p["conv_in"], z, padding=1)
    h = _apply_res(p["mid"]["block_1"], h)
    h = _apply_attn(p["mid"]["attn_1"], h)
    h = _apply_res(p["mid"]["block_2"], h)
    for i_level in reversed(range(len(cfg.ch_mult))):
        level = p["up"][i_level]
        for blk in level["block"]:
            h = _apply_res(blk, h)
        if "upsample" in level:
            h = nn.conv2d(level["upsample"], nn.upsample_nearest_2x(h), padding=1)
    h = nn.group_norm(p["norm_out"], h, eps=1e-6, act="silu")
    return nn.conv2d(p["conv_out"], h, padding=1)


# ---------------------------------------------------------------------------
# AutoencoderKL
# ---------------------------------------------------------------------------


def init_vae(key, cfg: VAEConfig) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "encoder": init_encoder(ks[0], cfg),
        "decoder": init_decoder(ks[1], cfg),
        "quant_conv": nn.init_conv2d(ks[2], 2 * cfg.z_channels, 2 * cfg.embed_dim, 1),
        "post_quant_conv": nn.init_conv2d(ks[3], cfg.embed_dim, cfg.z_channels, 1),
    }


def vae_encode(
    p: Params, cfg: VAEConfig, x: jnp.ndarray, rng: jax.Array
) -> jnp.ndarray:
    """Image (B,H,W,3) in [-1,1] -> sampled scaled latent (B,H/8,W/8,4).

    Matches AutoencoderKL.encode (autoencoder.py:27-31): sample from the
    diagonal Gaussian, multiply by scale_factor."""
    moments = nn.conv2d(p["quant_conv"], apply_encoder(p["encoder"], cfg, x), padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    return z * cfg.scale_factor


def vae_encode_mode(p: Params, cfg: VAEConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Deterministic (mode) encode — used by parity tests and eval."""
    moments = nn.conv2d(p["quant_conv"], apply_encoder(p["encoder"], cfg, x), padding=0)
    mean, _ = jnp.split(moments, 2, axis=-1)
    return mean * cfg.scale_factor


def vae_decode(p: Params, cfg: VAEConfig, z: jnp.ndarray) -> jnp.ndarray:
    """Scaled latent -> image (B,H,W,3) in [-1,1] (autoencoder.py:33-37)."""
    z = z / cfg.scale_factor
    z = nn.conv2d(p["post_quant_conv"], z, padding=0)
    return apply_decoder(p["decoder"], cfg, z)
