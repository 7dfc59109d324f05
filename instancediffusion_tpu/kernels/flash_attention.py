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


# ---------------------------------------------------------------------------
# Backward pass (custom VJP) — unmasked self/cross attention for training.
#
# Standard flash backward: recompute scores blockwise using the saved
# softmax statistics (m, l folded into `lse`), accumulate
#   dv += p^T dout
#   dp  = dout v^T
#   ds  = p * (dp - delta)        with delta = rowsum(dout * out)
#   dq += ds k * scale ;  dk += ds^T q * scale
# dq uses a q-block grid (inner loop over K); dk/dv use a k-block grid
# (inner loop over Q) so every accumulation stays block-local in VMEM.
# ---------------------------------------------------------------------------


def _fwd_with_stats_kernel(
    q_ref, k_ref, v_ref, out_ref, lse_ref, *, block_k, seq_k, scale, kv_len
):
    q = q_ref[0]
    block_q, d = q.shape
    num_kb = seq_k // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
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

    acc = jnp.zeros((block_q, q.shape[1]), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k, seq_k, scale, kv_len,
):
    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    block_q, d = q.shape
    num_kb = seq_k // block_k

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(col < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, block_q, seq_q, scale, kv_len, q_len,
):
    k = k_ref[0]
    v = v_ref[0]
    block_k, d = k.shape
    kb = pl.program_id(1)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    num_qb = seq_q // block_q

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(col < kv_len, s, NEG_INF)
        row = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0
        )
        p = jnp.where(row < q_len, jnp.exp(s - lse), 0.0)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _keep_predicate(bq, oq, bk, ok, row, col, kv_len):
    """The shared instance-mask keep predicate (see module docstring)."""
    return (
        (oq > 0) | (ok > 0) | ((bq & bk) != 0) | (row == col)
    ) & (col < kv_len)


def _fwd_with_stats_labeled_kernel(
    bits_q_ref, open_q_ref, bits_k_ref, open_k_ref,
    q_ref, k_ref, v_ref, out_ref, lse_ref,
    *, block_k, seq_k, scale, kv_len, block_q,
):
    qb = pl.program_id(1)
    q = q_ref[0]
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
        s = jnp.where(_keep_predicate(bq, oq, bk, ok, row, col, kv_len),
                      s, NEG_INF)
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

    acc = jnp.zeros((block_q, q.shape[1]), jnp.float32)
    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _bwd_dq_labeled_kernel(
    bits_q_ref, open_q_ref, bits_k_ref, open_k_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k, seq_k, scale, kv_len, block_q,
):
    qb = pl.program_id(1)
    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    d = q.shape[1]
    num_kb = seq_k // block_k
    bq = bits_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
    oq = open_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
    row = qb * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def body(kb, dq):
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
        s = jnp.where(_keep_predicate(bq, oq, bk, ok, row, col, kv_len),
                      s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jax.lax.fori_loop(0, num_kb, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_labeled_kernel(
    bits_q_ref, open_q_ref, bits_k_ref, open_k_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, block_q, seq_q, scale, kv_len, q_len, block_k,
):
    k = k_ref[0]
    v = v_ref[0]
    d = k.shape[1]
    kb = pl.program_id(1)
    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    bk = bits_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
    ok = open_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
    num_qb = seq_q // block_q

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        bq = bits_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
        oq = open_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        row = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        s = jnp.where(_keep_predicate(bq, oq, bk, ok, row, col, kv_len),
                      s, NEG_INF)
        p = jnp.where(row < q_len, jnp.exp(s - lse), 0.0)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk, dv

    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def flash_attention_trainable(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    block_q: int = 512, block_k: int = 512, interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused attention (B,H,N,C)x(B,H,M,C) — forward matches
    flash_attention(labels=None); backward is the flash recomputation
    (dq/dkv kernels above). For the training path (attn_impl='pallas')."""
    out, _ = _flash_fwd(q, k, v, block_q, block_k, interpret)
    return out


def _flash_fwd(q, k, v, block_q, block_k, interpret):
    b, h, n, c = q.shape
    m = k.shape[2]
    scale = 1.0 / math.sqrt(c)
    cp = _ceil_to(c, 128)
    npad = _ceil_to(n, block_q)
    mpad = _ceil_to(m, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, npad - n), (0, cp - c))).reshape(
        b * h, npad, cp
    )
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, mpad - m), (0, cp - c))).reshape(
        b * h, mpad, cp
    )
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, mpad - m), (0, cp - c))).reshape(
        b * h, mpad, cp
    )
    grid = (b * h, npad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_with_stats_kernel, block_k=block_k, seq_k=mpad, scale=scale,
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
        out_specs=(
            pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, npad, cp), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, npad), jnp.float32),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    out_full = out.reshape(b, h, npad, cp)[:, :, :n, :c]
    return out_full, (qp, kp, vp, out, lse, (b, h, n, m, c, cp, npad, mpad))


def _flash_fwd_rule(q, k, v, block_q, block_k, interpret):
    out, res = _flash_fwd(q, k, v, block_q, block_k, interpret)
    return out, res


def _flash_bwd_rule(block_q, block_k, interpret, res, g):
    qp, kp, vp, outp, lse, dims = res
    b, h, n, m, c, cp, npad, mpad = dims
    scale = 1.0 / math.sqrt(c)
    gp = jnp.pad(
        g, ((0, 0), (0, 0), (0, npad - n), (0, cp - c))
    ).reshape(b * h, npad, cp)
    # delta = rowsum(dout * out) (fp32)
    delta = jnp.sum(
        gp.astype(jnp.float32) * outp.astype(jnp.float32), axis=-1
    )[:, None, :]

    grid_q = (b * h, npad // block_q)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, block_k=block_k, seq_k=mpad, scale=scale, kv_len=m
        ),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, cp), lambda bh, qb: (bh, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, npad, cp), qp.dtype),
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta)

    grid_k = (b * h, mpad // block_k)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, block_q=block_q, seq_q=npad, scale=scale,
            kv_len=m, q_len=n,
        ),
        grid=grid_k,
        in_specs=[
            pl.BlockSpec((1, npad, cp), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cp), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cp), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, cp), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, cp), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cp), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, mpad, cp), kp.dtype),
            jax.ShapeDtypeStruct((b * h, mpad, cp), vp.dtype),
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta)

    dq = dq.reshape(b, h, npad, cp)[:, :, :n, :c]
    dk = dk.reshape(b, h, mpad, cp)[:, :, :m, :c]
    dv = dv.reshape(b, h, mpad, cp)[:, :, :m, :c]
    return dq, dk, dv


flash_attention_trainable.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# ---------------------------------------------------------------------------
# Labeled (instance-masked) differentiable attention — the masked-attention
# TRAINING path (use_masked_att). Forward matches flash_attention(labels=...);
# backward applies the same in-kernel keep predicate during the flash
# recomputation, so no (B,1,N,N) mask ever materializes.
# ---------------------------------------------------------------------------


def _pad_labels(bits, open_, npad, h):
    n = bits.shape[1]
    bits_p = jnp.repeat(jnp.pad(bits, ((0, 0), (0, npad - n))), h, axis=0)
    open_p = jnp.repeat(jnp.pad(open_, ((0, 0), (0, npad - n))), h, axis=0)
    return bits_p, open_p


def _flash_fwd_labeled(q, k, v, bits, open_, block_q, block_k, interpret):
    b, h, n, c = q.shape
    m = k.shape[2]
    assert n == m, "labels imply self-attention"
    scale = 1.0 / math.sqrt(c)
    cp = _ceil_to(c, 128)
    npad = _ceil_to(n, block_q)
    mpad = _ceil_to(m, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, npad - n), (0, cp - c))).reshape(
        b * h, npad, cp
    )
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, mpad - m), (0, cp - c))).reshape(
        b * h, mpad, cp
    )
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, mpad - m), (0, cp - c))).reshape(
        b * h, mpad, cp
    )
    bits_p, open_p = _pad_labels(bits, open_, max(npad, mpad), h)
    grid = (b * h, npad // block_q)
    lbl_spec = pl.BlockSpec((1, max(npad, mpad)), lambda bh, qb: (bh, 0),
                            memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_with_stats_labeled_kernel, block_k=block_k, seq_k=mpad,
            scale=scale, kv_len=m, block_q=block_q,
        ),
        grid=grid,
        in_specs=[
            lbl_spec, lbl_spec, lbl_spec, lbl_spec,
            pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, npad, cp), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, npad), jnp.float32),
        ),
        interpret=interpret,
    )(bits_p, open_p, bits_p, open_p, qp, kp, vp)
    out_full = out.reshape(b, h, npad, cp)[:, :, :n, :c]
    res = (qp, kp, vp, out, lse, bits_p, open_p,
           (b, h, n, m, c, cp, npad, mpad))
    return out_full, res


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_trainable_labeled(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bits: jnp.ndarray, open_: jnp.ndarray,
    block_q: int = 512, block_k: int = 512, interpret: bool = False,
) -> jnp.ndarray:
    out, _ = _flash_fwd_labeled(q, k, v, bits, open_, block_q, block_k,
                                interpret)
    return out


def _flash_fwd_labeled_rule(q, k, v, bits, open_, block_q, block_k, interpret):
    return _flash_fwd_labeled(q, k, v, bits, open_, block_q, block_k, interpret)


def _flash_bwd_labeled_rule(block_q, block_k, interpret, res, g):
    qp, kp, vp, outp, lse, bits_p, open_p, dims = res
    b, h, n, m, c, cp, npad, mpad = dims
    scale = 1.0 / math.sqrt(c)
    gp = jnp.pad(
        g, ((0, 0), (0, 0), (0, npad - n), (0, cp - c))
    ).reshape(b * h, npad, cp)
    delta = jnp.sum(
        gp.astype(jnp.float32) * outp.astype(jnp.float32), axis=-1
    )[:, None, :]
    lbl_len = bits_p.shape[1]
    lbl_spec = pl.BlockSpec((1, lbl_len), lambda bh, blk: (bh, 0),
                            memory_space=pltpu.VMEM)

    grid_q = (b * h, npad // block_q)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_labeled_kernel, block_k=block_k, seq_k=mpad, scale=scale,
            kv_len=m, block_q=block_q,
        ),
        grid=grid_q,
        in_specs=[
            lbl_spec, lbl_spec, lbl_spec, lbl_spec,
            pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, cp), lambda bh, qb: (bh, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, npad, cp), qp.dtype),
        interpret=interpret,
    )(bits_p, open_p, bits_p, open_p, qp, kp, vp, gp, lse, delta)

    grid_k = (b * h, mpad // block_k)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_labeled_kernel, block_q=block_q, seq_q=npad, scale=scale,
            kv_len=m, q_len=n, block_k=block_k,
        ),
        grid=grid_k,
        in_specs=[
            lbl_spec, lbl_spec, lbl_spec, lbl_spec,
            pl.BlockSpec((1, npad, cp), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cp), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cp), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, cp), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, cp), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cp), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, mpad, cp), kp.dtype),
            jax.ShapeDtypeStruct((b * h, mpad, cp), vp.dtype),
        ),
        interpret=interpret,
    )(bits_p, open_p, bits_p, open_p, qp, kp, vp, gp, lse, delta)

    dq = dq.reshape(b, h, npad, cp)[:, :, :n, :c]
    dk = dk.reshape(b, h, mpad, cp)[:, :, :m, :c]
    dv = dv.reshape(b, h, mpad, cp)[:, :, :m, :c]
    import numpy as _np

    # labels are integer inputs: their cotangent type is float0
    f0 = _np.zeros((b, n), jax.dtypes.float0)
    return dq, dk, dv, f0, f0


flash_attention_trainable_labeled.defvjp(
    _flash_fwd_labeled_rule, _flash_bwd_labeled_rule
)


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
