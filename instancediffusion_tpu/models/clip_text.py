"""CLIP ViT-L/14 text transformer, TPU-native functional implementation.

Covers both reference uses:
  * FrozenCLIPEmbedder.encode -> last_hidden_state (B, 77, 768), the UNet
    cross-attention context (ldm/modules/encoders/modules.py:144-172)
  * per-instance phrase features -> pooled pre-projection feature, i.e.
    final_layer_norm output at the EOT token position
    (utils/model.py:130-152 `text_model_output.pooler_output`)

Architecture (openai/clip-vit-large-patch14 text tower): 12 layers, d=768,
12 heads, mlp 3072 with quick-GELU, causal attention, learned positional
embeddings over 77 tokens, final LayerNorm. Weights load from an SD
checkpoint (cond_stage_model.*) or a HF state dict via
io/torch_convert.convert_clip_text.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from instancediffusion_tpu.config import TextEncoderConfig
from instancediffusion_tpu.nn import core as nn
from instancediffusion_tpu.ops.attention import multi_head_attention

Params = dict[str, Any]


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _init_layer(key, cfg: TextEncoderConfig) -> Params:
    ks = jax.random.split(key, 6)
    d, m = cfg.hidden_size, cfg.intermediate_size
    return {
        "ln1": nn.init_norm(d),
        "q": nn.init_linear(ks[0], d, d),
        "k": nn.init_linear(ks[1], d, d),
        "v": nn.init_linear(ks[2], d, d),
        "out": nn.init_linear(ks[3], d, d),
        "ln2": nn.init_norm(d),
        "fc1": nn.init_linear(ks[4], d, m),
        "fc2": nn.init_linear(ks[5], m, d),
    }


def init_clip_text(key, cfg) -> Params:
    """cfg: TextEncoderConfig (CLIP-L) or OpenCLIPTextConfig (bigG — adds
    `activation="gelu"` and a `projection_dim` text projection for the
    SDXL-Refiner pooled conditioning)."""
    ks = jax.random.split(key, cfg.num_hidden_layers + 4)
    proj_dim = getattr(cfg, "projection_dim", None)
    out = {
        "token_embedding": jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.hidden_size)
        ) * 0.02,
        "position_embedding": jax.random.normal(
            ks[1], (cfg.max_length, cfg.hidden_size)
        ) * 0.01,
        "layers": [
            _init_layer(ks[2 + i], cfg) for i in range(cfg.num_hidden_layers)
        ],
        "final_ln": nn.init_norm(cfg.hidden_size),
    }
    if proj_dim:
        out["text_projection"] = nn.init_linear(
            ks[-1], cfg.hidden_size, proj_dim, bias=False
        )
    return out


def _attn(p, x, num_heads, mask):
    q = nn.linear({"w": p["q"]["w"], "b": p["q"]["b"]}, x)
    k = nn.linear(p["k"], x)
    v = nn.linear(p["v"], x)
    out = multi_head_attention(q, k, v, num_heads, mask=mask)
    return nn.linear(p["out"], out)


def apply_clip_text(
    params: Params,
    cfg,
    input_ids: jnp.ndarray,          # (B, 77) int32
    attention_mask: jnp.ndarray | None = None,  # (B, 77) 1=valid, optional
) -> dict[str, jnp.ndarray]:
    """-> {last_hidden_state, pooler_output, penultimate_hidden_state
    [, projected_pooled]}.

    pooler_output = final-LN hidden at the EOT position (= argmax of
    input_ids, the highest BPE id being the end-of-text token), matching HF
    CLIPTextModel.pooler_output used by the reference's phrase encoder.
    penultimate_hidden_state = the residual stream after N-1 blocks,
    WITHOUT final LN — OpenCLIP's layer="penultimate" output, the
    SDXL-Refiner cross-attention context. projected_pooled (present when
    the tower has a text_projection) = pooled @ W_proj, the refiner's
    pooled conditioning."""
    b, n = input_ids.shape
    act = quick_gelu if getattr(cfg, "activation", "quick_gelu") == "quick_gelu" else nn.gelu
    x = params["token_embedding"][input_ids] + params["position_embedding"][:n]

    causal = jnp.tril(jnp.ones((n, n), bool))[None, None]  # (1,1,N,N)
    if attention_mask is not None:
        keep = attention_mask[:, None, None, :].astype(bool)  # (B,1,1,N)
        mask = jnp.logical_and(causal, keep)
    else:
        mask = causal

    penultimate = None
    for i, layer in enumerate(params["layers"]):
        if i == len(params["layers"]) - 1:
            penultimate = x
        h = nn.layer_norm(layer["ln1"], x)
        x = x + _attn(layer, h, cfg.num_attention_heads, mask)
        h = nn.layer_norm(layer["ln2"], x)
        x = x + nn.linear(layer["fc2"], act(nn.linear(layer["fc1"], h)))

    x = nn.layer_norm(params["final_ln"], x)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(b), eot]
    out = {
        "last_hidden_state": x,
        "pooler_output": pooled,
        "penultimate_hidden_state": penultimate,
    }
    if "text_projection" in params:
        out["projected_pooled"] = nn.linear(params["text_projection"], pooled)
    return out
