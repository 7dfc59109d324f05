"""Fused GEGLU feed-forward Pallas kernel.

Every transformer block (and every fuser) runs
    out = (a * gelu(g)) @ w2 + b2,   [a | g] = x @ w1 + b1
(ldm/modules/attention.py FeedForward/GEGLU). Unfused, the (N, 8C)
projection output round-trips HBM — ~170 MB per ds1 layer at B=8 — and
the split/gelu/mul glue shows up as multiply_add fusions (~11 ms/fwd in
docs/traces). This kernel keeps the whole intermediate in VMEM per
row-block: one x read, two MXU matmuls, one out write.

Differentiable via custom VJP that re-derives grads from the unfused
formula (recomputed — no extra residuals).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FF_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)


def _gelu(x):
    # tanh-approximated gelu: Mosaic lowers neither erfc nor erf (the
    # exact torch-default formulation), and the tanh form's max error
    # (~1e-3 relative) is below bf16 resolution (~8e-3), so the kernel
    # stays numerically within the bf16 noise of the reference
    c = (2.0 / jnp.pi) ** 0.5
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _ff_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]                                     # (bn, C) bf16
    h = jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)                # (bn, 2*inner)
    inner = h.shape[1] // 2
    h = h.astype(x.dtype)
    a = h[:, :inner]
    g = h[:, inner:]
    ag = a * _gelu(g)
    out = jax.lax.dot_general(
        ag, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _ff_unfused(x, w1, b1, w2, b2):
    dt = x.dtype
    h = jnp.dot(x, w1.astype(dt), preferred_element_type=dt) + b1.astype(dt)
    a, g = jnp.split(h, 2, axis=-1)
    ag = a * _gelu(g)
    return jnp.dot(ag, w2.astype(dt), preferred_element_type=dt) + b2.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_ff_geglu(
    x: jnp.ndarray,    # (B, N, C)
    w1: jnp.ndarray,   # (C, 2*inner)
    b1: jnp.ndarray,   # (2*inner,)
    w2: jnp.ndarray,   # (inner, C)
    b2: jnp.ndarray,   # (C,)
    interpret: bool = False,
) -> jnp.ndarray:
    b, n, c = x.shape
    two_inner = w1.shape[1]
    block_n = n if n <= 512 else 512
    dt = x.dtype
    return pl.pallas_call(
        _ff_kernel,
        grid=(b, n // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, two_inner), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_inner), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((two_inner // 2, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dt),
        compiler_params=_FF_PARAMS,
        interpret=interpret,
    )(
        x, w1.astype(dt), b1.reshape(1, -1).astype(dt),
        w2.astype(dt), b2.reshape(1, -1).astype(dt),
    )


def _ff_fwd(x, w1, b1, w2, b2, interpret):
    return fused_ff_geglu(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _ff_bwd(interpret, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_ff_unfused, x, w1, b1, w2, b2)
    return vjp(g)


fused_ff_geglu.defvjp(_ff_fwd, _ff_bwd)


def ff_fits(n: int, c: int, inner: int) -> bool:
    """One row-block's intermediates + both weights must fit VMEM."""
    vmem = 512 * 2 * inner * 6 + c * 2 * inner * 2 + inner * c * 2
    return (n <= 512 or n % 512 == 0) and vmem < 40 * 1024 * 1024
