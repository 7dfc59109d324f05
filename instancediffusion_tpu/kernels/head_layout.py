"""Fused projection <-> head-layout kernels (Pallas/Mosaic).

Why this file exists: at ds1 the UNet's attention heads are 40-channel
(8 heads x 40 = 320), and 40-column groups can never be 128-lane aligned,
so XLA materializes physical relayout copies between the q/k/v projection
outputs (B, N, H*c) and the flash kernels' (B, H, N, c) operands — and a
mirror copy merging the attention output back for to_out. Measured: ~6.4
ms/fwd of pure `copy` ops at B=8 (docs/traces/r3b — 24 distinct
(8, 4096/4608, 8, 40) transposes at ~3x the HBM-bandwidth floor), the
single largest non-roofline residual in docs/PERF.md's round-3 table.

The fix: do the head split/merge INSIDE the projection kernels, where the
relayout is a VMEM-register shuffle on one (block_n, H*c) tile at a time,
overlapped with the projection matmuls — instead of a standalone
21 MB HBM round-trip per tensor per layer.

  proj_split(x, [w...])  = [split_heads(x @ w) for w]   -> (B, H, Mpad, c)
  merge_proj(o, w, b)    = merge_heads(o) @ w + b       -> (B, N, Cout)

Both kernels read/write every operand in its NATURAL layout (x and the
merged output are contiguous (rows, channels); the per-head arrays are
contiguous (head, rows, c) exactly as the flash kernels consume them), so
no XLA copy can appear on either side. The projection dots contract over
the full C_in with H*c-wide outputs — full MXU utilization, unlike a
per-head (C_in, 40) dot (40/128 output lanes) or a per-head to_out partial
sum (40-deep contraction). The reference counterpart is the torch
`rearrange(..., '(b h) n d -> b n (h d)')` glue around SDPA
(ldm/modules/attention.py:134-144), which CUDA hides in TensorCore-epilogue
fusions; Mosaic needs it written as a kernel.

The two in-kernel relayout strategies (benchmarked on v5e via
tools/kernel_bench.py before wiring into the model; see docs/PERF.md):
  * "reshape":  y.reshape(bn, H, c).transpose(1, 0, 2) — one Mosaic
                sublane/lane shuffle per tile
  * "slice":    per-head 40-column lane slices — H small shuffles
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# A/B switches for the in-kernel relayout strategy (tools/fwd_bench.py):
# models/unet._apply_mha passes these as the variants it uses.
SPLIT_VARIANT = os.environ.get("IDTPU_HEADS_SPLIT", "reshape")
MERGE_VARIANT = os.environ.get("IDTPU_HEADS_MERGE", "reshape")


def _proj_split_kernel(
    x_ref, *refs, n_out: int, num_heads: int, head_c: int, block_n: int,
    seq_len: int, variant: str,
):
    w_refs, out_refs = refs[:n_out], refs[n_out:]
    xb = x_ref[0]  # (block_n, C_in)
    # zero the sequence-pad tail so downstream kernels can treat padded
    # rows as real zeros (NaN-free v-padding for the flash sv matmul);
    # statically skipped when the sequence is block-aligned (every ds1
    # shape in practice)
    row_ok = None
    if seq_len % block_n != 0:
        row = pl.program_id(1) * block_n + jax.lax.broadcasted_iota(
            jnp.int32, (block_n, 1), 0
        )
        row_ok = row < seq_len
    for j in range(n_out):
        y = jax.lax.dot_general(
            xb, w_refs[j][...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if row_ok is not None:
            y = jnp.where(row_ok, y, 0.0)
        y = y.astype(out_refs[j].dtype)
        if variant == "reshape":
            out_refs[j][0] = y.reshape(block_n, num_heads, head_c).transpose(
                1, 0, 2
            )
        else:
            for h in range(num_heads):
                out_refs[j][0, h] = y[:, h * head_c:(h + 1) * head_c]


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_n", "seq_pad", "variant", "interpret"),
)
def proj_split(
    x: jnp.ndarray,              # (B, M, C_in)
    weights: tuple,              # each (C_in, H*c), bias-free (SD q/k/v)
    num_heads: int,
    *,
    block_n: int = 512,
    seq_pad: int | None = None,  # pad M to this (flash block multiple)
    variant: str = "reshape",
    interpret: bool = False,
):
    """[split_heads(x @ w) for w in weights], head-split in-kernel.

    Returns a list of (B, H, Mpad, c) arrays, Mpad = seq_pad or
    ceil(M, block_n); rows >= M are zeroed. Scale folding (1/sqrt(c) into
    the q weight) is the caller's job, as on the existing pallas path."""
    b, m, c_in = x.shape
    n_out = len(weights)
    inner = weights[0].shape[1]
    assert all(w.shape == (c_in, inner) for w in weights)
    head_c = inner // num_heads
    mpad = seq_pad if seq_pad is not None else _ceil_to(m, block_n)
    assert mpad % block_n == 0 and mpad >= m
    grid = (b, mpad // block_n)

    w_spec = pl.BlockSpec(
        (c_in, inner), lambda bi, nb: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _proj_split_kernel, n_out=n_out, num_heads=num_heads,
            head_c=head_c, block_n=block_n, seq_len=m, variant=variant,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, c_in), lambda bi, nb: (bi, nb, 0),
                         memory_space=pltpu.VMEM),
        ] + [w_spec] * n_out,
        out_specs=[
            pl.BlockSpec((1, num_heads, block_n, head_c),
                         lambda bi, nb: (bi, 0, nb, 0),
                         memory_space=pltpu.VMEM)
        ] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct((b, num_heads, mpad, head_c), x.dtype)
        ] * n_out,
        interpret=interpret,
    )(x, *weights)
    return out


def _merge_proj_kernel(
    o_ref, w_ref, b_ref, out_ref, *, num_heads: int, head_c: int,
    block_n: int, variant: str,
):
    ob = o_ref[0]  # (H, block_n, c)
    if variant == "dot_per_head":
        # per-head partial products, summed in f32: sublane-sliced weight
        # rows (40 = 5x8, free) but a 40-deep contraction (40/128 MXU)
        acc = jnp.zeros((block_n, w_ref.shape[1]), jnp.float32)
        for h in range(num_heads):
            acc += jax.lax.dot_general(
                ob[h], w_ref[h * head_c:(h + 1) * head_c, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        # assemble (block_n, H*c) in VMEM (the mirror of proj_split's
        # shuffle), then one full-width dot
        y = ob.transpose(1, 0, 2).reshape(block_n, num_heads * head_c)
        acc = jax.lax.dot_general(
            y, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if b_ref is not None:
        acc = acc + b_ref[...].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "variant", "interpret"),
)
def merge_proj(
    o: jnp.ndarray,                 # (B, H, Npad, c) attention output
    w: jnp.ndarray,                 # (H*c, C_out)
    bias: jnp.ndarray | None = None,  # (C_out,)
    *,
    block_n: int = 512,
    variant: str = "reshape",
    interpret: bool = False,
) -> jnp.ndarray:
    """merge_heads(o) @ w + bias without the HBM transpose: (B, Npad, C_out).
    The caller slices [:, :n] if it padded the sequence (row slices are
    free)."""
    b, h, npad, c = o.shape
    assert npad % block_n == 0, (npad, block_n)
    assert w.shape[0] == h * c
    c_out = w.shape[1]
    grid = (b, npad // block_n)
    args = [o, w]
    in_specs = [
        pl.BlockSpec((1, h, block_n, c), lambda bi, nb: (bi, 0, nb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h * c, c_out), lambda bi, nb: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        args.append(bias.reshape(1, c_out))
        in_specs.append(
            pl.BlockSpec((1, c_out), lambda bi, nb: (0, 0),
                         memory_space=pltpu.VMEM)
        )

    def kern(o_ref, w_ref, *rest):
        b_ref = rest[0] if bias is not None else None
        out_ref = rest[-1]
        _merge_proj_kernel(
            o_ref, w_ref, b_ref, out_ref, num_heads=h, head_c=c,
            block_n=block_n, variant=variant,
        )

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_n, c_out),
                               lambda bi, nb: (bi, nb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, c_out), o.dtype),
        interpret=interpret,
    )(*args)
