"""ConvNeXt-Tiny feature backbone (seg-mask encoder for UniFusion), NHWC.

Re-implements the reference's headless ConvNeXt
(ldm/modules/diffusionmodules/convnext.py:15-110): stem 4x4/s4 conv +
LayerNorm, 3 downsample (LN + 2x2/s2 conv) stages, blocks of
depthwise-7x7 -> LN -> Linear(4x) -> GELU -> Linear -> layer-scale gamma,
eps 1e-6 everywhere. TPU-native: activations stay channels-last the whole
way (the reference permutes NCHW<->NHWC inside every block; here the layout
is already right, so blocks are pure matmul/VPU chains that XLA fuses).

Depthwise 7x7 runs as a grouped conv (feature_group_count=dim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from instancediffusion_tpu.nn import core as nn

TINY_DEPTHS = (3, 3, 9, 3)
TINY_DIMS = (96, 192, 384, 768)


def _init_block(key, dim: int, layer_scale_init: float = 1e-6):
    ks = jax.random.split(key, 3)
    return {
        # depthwise conv kernel: HWIO with I=1 (feature_group_count=dim)
        "dwconv": {
            "w": jax.random.normal(ks[0], (7, 7, 1, dim)) * 0.02,
            "b": jnp.zeros((dim,)),
        },
        "norm": nn.init_norm(dim),
        "pwconv1": nn.init_linear(ks[1], dim, 4 * dim),
        "pwconv2": nn.init_linear(ks[2], 4 * dim, dim),
        "gamma": jnp.full((dim,), layer_scale_init, jnp.float32),
    }


def _apply_block(p, x):
    inp = x
    dim = x.shape[-1]
    x = nn.conv2d(p["dwconv"], x, padding=3, feature_group_count=dim)
    x = nn.layer_norm(p["norm"], x, eps=1e-6)
    x = nn.linear(p["pwconv1"], x)
    x = nn.gelu(x)
    x = nn.linear(p["pwconv2"], x)
    x = p["gamma"].astype(x.dtype) * x
    return inp + x


def init_convnext_tiny(key, in_chans: int = 3, depths=TINY_DEPTHS, dims=TINY_DIMS):
    """depths/dims default to ConvNeXt-T; overridable so micro test/dryrun
    configs can keep the seg branch at negligible FLOPs (a full -T forward
    is ~35s/step on a 1-core CPU host — measured, __graft_entry__ r3)."""
    keys = iter(jax.random.split(key, 64))
    params = {
        "stem_conv": nn.init_conv2d(next(keys), in_chans, dims[0], 4),
        "stem_norm": nn.init_norm(dims[0]),
        "downsample": [],
        "stages": [],
    }
    for i in range(len(dims) - 1):
        params["downsample"].append(
            {
                "norm": nn.init_norm(dims[i]),
                "conv": nn.init_conv2d(next(keys), dims[i], dims[i + 1], 2),
            }
        )
    for i in range(len(dims)):
        params["stages"].append(
            [_init_block(next(keys), dims[i]) for _ in range(depths[i])]
        )
    return params


def apply_convnext_tiny(params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C_in) -> (B, H/(4*2^n_down), W/(4*2^n_down), dims[-1])."""
    x = nn.conv2d(params["stem_conv"], x, stride=4, padding=0)
    x = nn.layer_norm(params["stem_norm"], x, eps=1e-6)
    for blk in params["stages"][0]:
        x = _apply_block(blk, x)
    for i in range(len(params["downsample"])):
        ds = params["downsample"][i]
        x = nn.layer_norm(ds["norm"], x, eps=1e-6)
        x = nn.conv2d(ds["conv"], x, stride=2, padding=0)
        for blk in params["stages"][i + 1]:
            x = _apply_block(blk, x)
    return x
