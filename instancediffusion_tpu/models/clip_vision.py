"""CLIP ViT vision tower + projection heads — the image side of the full
CLIPModel the reference uses as (a) the per-instance phrase encoder host
(utils/model.py:12-18 loads the FULL CLIPModel) and (b) the judge for
attribute-binding evaluation (eval/eval_attribute_binding.py:19-60,
image-text similarity + nearest-label accuracy).

ViT-L/14: 14x14 patch conv -> 1024-d, CLS token + learned positions (257),
pre-LN, 24 transformer layers (16 heads, mlp 4096, quick-GELU), post-LN on
the CLS token, linear projection to the 768-d shared space. encode_image /
encode_text mirror open_clip semantics (L2-normalized features).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from instancediffusion_tpu.config import TextEncoderConfig
from instancediffusion_tpu.models.clip_text import apply_clip_text, quick_gelu
from instancediffusion_tpu.nn import core as nn
from instancediffusion_tpu.ops.attention import multi_head_attention

Params = dict[str, Any]

CLIP_IMAGE_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass
class VisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    projection_dim: int = 768

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1


def _init_layer(key, d, m):
    ks = jax.random.split(key, 6)
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


def init_clip_vision(key, cfg: VisionConfig) -> Params:
    ks = jax.random.split(key, cfg.num_hidden_layers + 5)
    d = cfg.hidden_size
    return {
        "patch_embedding": nn.init_conv2d(
            ks[0], 3, d, cfg.patch_size, bias=False
        ),
        "class_embedding": jax.random.normal(ks[1], (d,)) * 0.02,
        "position_embedding": jax.random.normal(
            ks[2], (cfg.num_positions, d)
        ) * 0.02,
        "pre_ln": nn.init_norm(d),
        "layers": [
            _init_layer(ks[3 + i], d, cfg.intermediate_size)
            for i in range(cfg.num_hidden_layers)
        ],
        "post_ln": nn.init_norm(d),
        "visual_projection": nn.init_linear(
            ks[-1], d, cfg.projection_dim, bias=False
        ),
    }


def apply_clip_vision(
    params: Params, cfg: VisionConfig, pixels: jnp.ndarray
) -> dict[str, jnp.ndarray]:
    """pixels: (B, 224, 224, 3) CLIP-normalized. Returns pooled (pre-proj)
    and image_embeds (projected, the shared-space feature)."""
    b = pixels.shape[0]
    x = nn.conv2d(
        params["patch_embedding"], pixels, stride=cfg.patch_size, padding=0
    )
    x = x.reshape(b, -1, cfg.hidden_size)  # (B, 256, D)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype), (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1) + params["position_embedding"].astype(
        x.dtype
    )
    x = nn.layer_norm(params["pre_ln"], x)
    for layer in params["layers"]:
        h = nn.layer_norm(layer["ln1"], x)
        q = nn.linear(layer["q"], h)
        k = nn.linear(layer["k"], h)
        v = nn.linear(layer["v"], h)
        a = multi_head_attention(q, k, v, cfg.num_attention_heads)
        x = x + nn.linear(layer["out"], a)
        h = nn.layer_norm(layer["ln2"], x)
        x = x + nn.linear(layer["fc2"], quick_gelu(nn.linear(layer["fc1"], h)))
    pooled = nn.layer_norm(params["post_ln"], x[:, 0])
    image_embeds = nn.linear(params["visual_projection"], pooled)
    return {"pooler_output": pooled, "image_embeds": image_embeds}


def preprocess_image(image_u8: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 HWC -> CLIP-normalized float32 (resize shorter side + center
    crop, the standard CLIP preprocessing)."""
    import cv2

    h, w = image_u8.shape[:2]
    if h == 0 or w == 0:
        return np.zeros((size, size, 3), np.float32)
    scale = size / min(h, w)
    nh, nw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
    img = cv2.resize(image_u8, (nw, nh), interpolation=cv2.INTER_CUBIC)
    top, left = (nh - size) // 2, (nw - size) // 2
    img = img[top : top + size, left : left + size]
    img = img.astype(np.float32) / 255.0
    return (img - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


class CLIPJudge:
    """encode_image/encode_text pair for the attribute-binding metric
    (evalsuite/attribute_binding.score_image). Uses our JAX CLIP towers;
    weights via io/torch_convert.convert_clip_model from any HF CLIPModel
    state dict."""

    def __init__(self, vision_params, text_params, text_projection,
                 vcfg: VisionConfig | None = None,
                 tcfg: TextEncoderConfig | None = None, tokenizer=None):
        self.vcfg = vcfg or VisionConfig()
        self.tcfg = tcfg or TextEncoderConfig()
        self.vision_params = vision_params
        self.text_params = text_params
        self.text_projection = text_projection
        if tokenizer is None:
            from instancediffusion_tpu.data.tokenizer import CLIPTokenizer

            tokenizer = CLIPTokenizer.load_default()
        self.tokenizer = tokenizer
        self._img_fn = jax.jit(
            lambda p, x: apply_clip_vision(p, self.vcfg, x)["image_embeds"]
        )
        self._txt_fn = jax.jit(
            lambda p, proj, ids: nn.linear(
                proj, apply_clip_text(p, self.tcfg, ids)["pooler_output"]
            )
        )

    def encode_image(self, crop_u8: np.ndarray) -> np.ndarray:
        x = preprocess_image(crop_u8)[None]
        return np.asarray(self._img_fn(self.vision_params, jnp.asarray(x))[0])

    def encode_text(self, text: str) -> np.ndarray:
        ids = self.tokenizer.encode(text)[None]
        return np.asarray(
            self._txt_fn(self.text_params, self.text_projection, jnp.asarray(ids))[0]
        )
