"""Minimal functional NN layer library over explicit parameter pytrees.

Design rules (TPU-first):
  * all image tensors are NHWC (channels-last — maps HBM lanes / MXU tiling
    far better than the reference's NCHW); conv kernels are HWIO
  * linear weights are stored (in, out) so `x @ w` hits the MXU directly
    (the torch->jax converter transposes torch's (out, in))
  * normalizations compute in float32 regardless of activation dtype,
    matching the reference's GroupNorm32 (util.py:223-225) under fp16 AMP
  * params are plain nested dicts -> trivially shardable/maskable pytrees

Initializers mirror torch defaults (kaiming-uniform fan-in for linear/conv)
so random-init parity tests against the reference are meaningful after weight
copy; exact init distribution only matters for from-scratch training.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (torch-default kaiming uniform, bias uniform(-1/sqrt(fan),..))
# ---------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _bias_uniform(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True, zero: bool = False) -> Params:
    kw, kb = jax.random.split(key)
    if zero:
        w = jnp.zeros((in_dim, out_dim), jnp.float32)
    else:
        w = _kaiming_uniform(kw, (in_dim, out_dim), in_dim)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32) if zero else _bias_uniform(
            kb, (out_dim,), in_dim
        )
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Conv2D (NHWC x HWIO -> NHWC)
# ---------------------------------------------------------------------------


def init_conv2d(
    key, in_ch: int, out_ch: int, kernel: int, bias: bool = True, zero: bool = False
) -> Params:
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    shape = (kernel, kernel, in_ch, out_ch)
    w = jnp.zeros(shape, jnp.float32) if zero else _kaiming_uniform(kw, shape, fan_in)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_ch,), jnp.float32) if zero else _bias_uniform(
            kb, (out_ch,), fan_in
        )
    return p


def conv2d(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    padding: int | str = "SAME",
    feature_group_count: int = 1,
) -> jnp.ndarray:
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Fused-kernel dispatch switch (trace-time)
#
# Escape hatch: wrap a trace in `no_fused_kernels()` to route norms and the
# GEGLU-FF through plain XLA (debugging, or platforms where the Mosaic
# kernels misbehave). Training does NOT use it — the fused kernels measured
# faster there too (405 vs 424 ms/step, tools/train_bench.py), even though
# their custom VJPs recompute the unfused formula under remat.
# ---------------------------------------------------------------------------

import contextlib

_fused_enabled = [True]


@contextlib.contextmanager
def no_fused_kernels():
    _fused_enabled.append(False)
    try:
        yield
    finally:
        _fused_enabled.pop()


def fused_kernels_enabled() -> bool:
    return _fused_enabled[-1] and jax.devices()[0].platform != "cpu"


# ---------------------------------------------------------------------------
# Norms — float32 internal math, cast back to input dtype
# ---------------------------------------------------------------------------


def init_norm(num_channels: int) -> Params:
    return {
        "scale": jnp.ones((num_channels,), jnp.float32),
        "bias": jnp.zeros((num_channels,), jnp.float32),
    }


def group_norm(
    p: Params, x: jnp.ndarray, num_groups: int = 32, eps: float = 1e-5,
    act: str = "none",
) -> jnp.ndarray:
    """GroupNorm over the last (channel) axis of an NHWC / (B,N,C) tensor,
    with an optionally fused trailing activation (`act="silu"`).

    fp32 statistics regardless of input dtype (GroupNorm32 semantics,
    util.py:223-225). fp32 inputs normalize fully in fp32 (bit-parity with
    the reference); bf16 inputs accumulate stats in fp32 but keep the
    elementwise normalize in bf16, avoiding two full fp32 HBM round-trips
    per norm (~6% of UNet forward time). On TPU the bf16 path runs the
    fused Pallas kernel (kernels/group_norm.py): one stats read + one
    normalize(+silu) read-modify-write instead of 3+ HBM passes."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    b = x.shape[0]
    g = num_groups
    if orig_dtype == jnp.bfloat16 and fused_kernels_enabled():
        from instancediffusion_tpu.kernels.norms import (
            fused_group_norm, group_norm_fits,
        )

        n = int(np.prod(spatial)) if spatial else 1
        if group_norm_fits(n, c, g):
            out = fused_group_norm(
                x.reshape(b, n, c), p["scale"], p["bias"], g, eps, act
            )
            return out.reshape(b, *spatial, c)
    if orig_dtype == jnp.float32:
        xg = x.reshape(b, -1, g, c // g)
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + eps)
        out = xg.reshape(b, *spatial, c)
        out = out * p["scale"] + p["bias"]
        return silu(out) if act == "silu" else out
    xg = x.reshape(b, -1, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(
        jnp.square(xg.astype(jnp.float32)), axis=(1, 3), keepdims=True
    )
    inv = jax.lax.rsqrt(mean2 - jnp.square(mean) + eps)
    # elementwise normalize stays in the input dtype (one rounding step vs
    # the fp32 path; stats above are exact fp32)
    out = (xg - mean.astype(orig_dtype)) * inv.astype(orig_dtype)
    out = out.reshape(b, *spatial, c)
    out = out * p["scale"].astype(orig_dtype) + p["bias"].astype(orig_dtype)
    # Round-4 dead end: for the decoder's concat-width norms just above
    # the Pallas VMEM gate ((4096,960)/(4096,640)/(1024,2560) per row),
    # XLA fuses this normalize chain into the consuming 3x3 conv's
    # operand (add_add_fusion at 5.12 ms vs a 1.84 ms conv roofline in
    # docs/traces/r4_gen). An optimization_barrier here to materialize
    # the normalized tensor measured NEUTRAL on-chip (96.7 vs 96.4
    # ms/fwd B=8) — the extra HBM pass costs what the fusion shape
    # saves — so the fence was removed. See docs/PERF.md round-4 notes.
    return silu(out) if act == "silu" else out


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the channel axis, fp32 math (torch nn.LayerNorm
    semantics). bf16 on TPU runs the fused Pallas kernel
    (kernels/norms.py) — identical fp32 math, one read + one write."""
    if x.dtype == jnp.bfloat16 and fused_kernels_enabled():
        from instancediffusion_tpu.kernels.norms import (
            fused_layer_norm, layer_norm_fits,
        )

        c = x.shape[-1]
        lead = x.shape[:-1]
        n = int(np.prod(lead[1:])) if len(lead) > 1 else 1
        if layer_norm_fits(n, c):
            out = fused_layer_norm(
                x.reshape(lead[0], n, c), p["scale"], p["bias"], eps
            )
            return out.reshape(*lead, c)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf * p["scale"] + p["bias"]
    return xf.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Activations / resampling
# ---------------------------------------------------------------------------


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    # torch nn.GELU / F.gelu default: exact erf formulation
    return jax.nn.gelu(x, approximate=False)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def resize_nearest(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Nearest resize of NHWC (matches F.interpolate mode='nearest')."""
    b, h, w, c = x.shape
    rows = (jnp.arange(size) * (h / size)).astype(jnp.int32)
    cols = (jnp.arange(size) * (w / size)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


# ---------------------------------------------------------------------------
# Pytree helpers
# ---------------------------------------------------------------------------


def tree_cast(params, dtype):
    return jax.tree_util.tree_map(lambda a: a.astype(dtype), params)


def count_params(params) -> int:
    return int(
        sum(np.prod(a.shape) for a in jax.tree_util.tree_leaves(params))
    )
