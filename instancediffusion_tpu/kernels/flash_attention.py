"""Fused flash attention for TPU (Pallas/Mosaic).

The framework's "native" attention layer — replaces the reference's
delegation to torch SDPA flash kernels (ldm/modules/attention.py:134-144,
257-267). Online-softmax tiling: the (N x M) score matrix never
materializes in HBM; per-block running max/denominator live in VMEM
scratch.

Covers the three attention shapes in the UNet (SURVEY §5.7):
  * self-attention over visual tokens (N = M up to 64x64 = 4096)
  * cross-attention to 77 text tokens (M = 77, padded to 128)
  * gated self-attention over [visual | grounding] tokens (N = 4280),
    with the instance mask expressed as PER-TOKEN LABELS evaluated
    in-kernel (see instance mask encoding below) instead of the
    reference's materialized (B,1,N,N) float mask (attention.py:200-255)

Instance-mask label encoding (ops/instance_mask.py semantics, kernel form):
  each token carries (bits: int32, open: int32) where
    visual token:          bits = OR of (1<<k) over instances k covering it
    box/polygon g-token k: bits = GROUNDING_BIT | (1<<k)
    point/scribble/seg:    open = 1 (attends / attended by everything)
    grounding tokens all:  bits |= GROUNDING_BIT (g<->g unrestricted)
  keep(i,j) = open_i | open_j | (bits_i & bits_j) != 0 | i == j
  which reproduces: visual<->visual only within a shared instance (+diag),
  restricted grounding rows/cols limited to their instance's pixels,
  open rows/cols and grounding<->grounding unmasked.

Grid: (batch*heads, num_q_blocks); the K/M loop runs inside the kernel so
the running softmax state stays in registers/VMEM. Head dim is padded to
the 128-lane MXU width (SD1.5 head dims are 40/80/160).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUNDING_BIT = 1 << 30
NEG_INF = -1e9


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(
    q_ref, k_ref, v_ref, out_ref, *, block_k: int, seq_k: int, scale: float,
    kv_len: int,
):
    """Single (q-block x full-K) flash pass. Refs are (1, block_q, d) /
    (1, seq_k_padded, d) in VMEM.

    Matmuls run at the input dtype (bf16 -> full MXU rate) with fp32
    accumulation; only softmax state is fp32."""
    q = q_ref[0]  # input dtype (bf16 on TPU)
    block_q, d = q.shape
    num_kb = seq_k // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k) fp32
        # mask out K padding
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(col < kv_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _flash_kernel_labeled(
    bits_q_ref, open_q_ref, bits_k_ref, open_k_ref,
    q_ref, k_ref, v_ref, out_ref,
    *, block_k: int, seq_k: int, scale: float, kv_len: int, block_q: int,
):
    """Flash pass with the instance-mask predicate evaluated in-kernel from
    per-token labels. Label refs are (1, N) int32 rows in VMEM."""
    qb = pl.program_id(1)
    q = q_ref[0]  # input dtype; matmuls accumulate fp32
    d = q.shape[1]
    num_kb = seq_k // block_k

    bq = bits_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
    oq = open_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
    row = qb * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        bk = bits_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
        ok = open_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        keep = (
            (oq > 0)
            | (ok > 0)
            | ((bq & bk) != 0)
            | (row == col)
        ) & (col < kv_len)
        s = jnp.where(keep, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jnp.ndarray,   # (B, H, N, C)
    k: jnp.ndarray,   # (B, H, M, C)
    v: jnp.ndarray,   # (B, H, M, C)
    mask: jnp.ndarray | None = None,        # unsupported here; use labels
    labels: tuple | None = None,            # (bits (B,N), open (B,N)) int32
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention. For instance masking pass `labels`; a dense `mask`
    falls back to the XLA path (kept for API parity)."""
    if mask is not None:
        from instancediffusion_tpu.ops.attention import sdpa_xla

        return sdpa_xla(q, k, v, mask=mask)

    b, h, n, c = q.shape
    m = k.shape[2]
    scale = 1.0 / math.sqrt(c)

    # pad: head dim to 128 lanes, sequences to block multiples
    cp = _ceil_to(c, 128)
    npad = _ceil_to(n, block_q)
    mpad = _ceil_to(m, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, npad - n), (0, cp - c)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, mpad - m), (0, cp - c)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, mpad - m), (0, cp - c)))
    qp = qp.reshape(b * h, npad, cp)
    kp = kp.reshape(b * h, mpad, cp)
    vp = vp.reshape(b * h, mpad, cp)

    grid = (b * h, npad // block_q)

    if labels is None:
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel, block_k=block_k, seq_k=mpad, scale=scale,
                kv_len=m,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, npad, cp), q.dtype),
            interpret=interpret,
        )(qp, kp, vp)
    else:
        bits, open_ = labels  # (B, N) int32 each; N == M (self-attn only)
        assert n == m, "labels imply self-attention"
        bits_p = jnp.pad(bits, ((0, 0), (0, npad - n)))
        open_p = jnp.pad(open_, ((0, 0), (0, npad - n)))
        # expand over heads
        bits_p = jnp.repeat(bits_p, h, axis=0)
        open_p = jnp.repeat(open_p, h, axis=0)
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel_labeled, block_k=block_k, seq_k=mpad,
                scale=scale, kv_len=m, block_q=block_q,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, npad), lambda bh, qb: (bh, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad), lambda bh, qb: (bh, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad), lambda bh, qb: (bh, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad), lambda bh, qb: (bh, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, npad, cp), q.dtype),
            interpret=interpret,
        )(bits_p, open_p, bits_p, open_p, qp, kp, vp)

    out = out.reshape(b, h, npad, cp)[:, :, :n, :c]
    return out


def instance_labels(
    att_masks: jnp.ndarray, n_objs: int, seg_tokens: int = 64
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, n_objs, S, S) binary box/instance rasters -> per-token
    (bits, open) labels over [S*S visual | 4*n_objs grounding | seg] tokens
    for the labeled flash kernel. See module docstring for the encoding."""
    b, n, s, _ = att_masks.shape
    wh = s * s
    masks = att_masks.reshape(b, n, wh) > 0
    powers = (1 << jnp.arange(n, dtype=jnp.int32))[None, :, None]
    vis_bits = jnp.sum(
        jnp.where(masks, powers, 0), axis=1, dtype=jnp.int32
    )  # OR == sum: instance bits are disjoint powers of two
    vis_open = jnp.zeros((b, wh), jnp.int32)

    inst_bits = (1 << jnp.arange(n, dtype=jnp.int32)) | GROUNDING_BIT
    inst_bits = jnp.broadcast_to(inst_bits, (b, n))
    g_open_block = jnp.ones((b, n), jnp.int32)
    g_closed_block = jnp.zeros((b, n), jnp.int32)
    gb = jnp.full((b, n), GROUNDING_BIT, jnp.int32)
    # token order [box, point, scribble, polygon] (attention.py:244-248:
    # box+polygon restricted, point+scribble open)
    g_bits = jnp.concatenate([inst_bits, gb, gb, inst_bits], axis=1)
    g_open = jnp.concatenate(
        [g_closed_block, g_open_block, g_open_block, g_closed_block], axis=1
    )

    seg_bits = jnp.full((b, seg_tokens), GROUNDING_BIT, jnp.int32)
    seg_open = jnp.ones((b, seg_tokens), jnp.int32)

    bits = jnp.concatenate([vis_bits, g_bits, seg_bits], axis=1)
    open_ = jnp.concatenate([vis_open, g_open, seg_open], axis=1)

    # samples with no mask at all are unmasked (attention.py:200)
    has_mask = jnp.any(masks, axis=(1, 2))
    open_ = jnp.where(has_mask[:, None], open_, 1)
    return bits, open_
