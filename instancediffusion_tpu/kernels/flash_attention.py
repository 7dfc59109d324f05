"""Fused flash attention for TPU (Pallas/Mosaic).

The framework's "native" attention layer — replaces the reference's
delegation to torch SDPA flash kernels (ldm/modules/attention.py:134-144,
257-267). Online-softmax tiling: the (N x M) score matrix never
materializes in HBM; per-block running max/denominator live in VMEM
scratch.

Covers the three attention shapes in the UNet (SURVEY §5.7):
  * self-attention over visual tokens (N = M up to 64x64 = 4096)
  * cross-attention to 77 text tokens (M = 77, padded to one k-block)
  * gated self-attention over [visual | grounding] tokens (M = 4280),
    with the instance mask expressed as PER-TOKEN LABELS evaluated
    in-kernel (see instance mask encoding below) instead of the
    reference's materialized (B,1,N,N) float mask (attention.py:200-255)

Kernel design (all choices measured on a v5e chip — tools/kernel_bench.py):
  * head dim stays UNPADDED in HBM (40/80/160); Mosaic pads tiles in VMEM.
    Padding to 128 lanes in HBM cost ~5 ms/fwd of pure pad copies.
  * softmax scale folded into q once (N*d mults) instead of per score
    block (N*M)
  * python-unrolled k loop (fori_loop serializes Mosaic's pipeline;
    unrolling bought ~22% on the dominant 4096-token shape)
  * k-padding mask applied ONLY on the tail k-block that actually
    straddles kv_len; full blocks skip the iota/compare/select entirely
  * fp32 softmax state, bf16 matmul inputs with fp32 accumulation

Instance-mask label encoding (ops/instance_mask.py semantics, kernel form):
  each token carries (bits: int32, open: int32) where
    visual token:          bits = OR of (1<<k) over instances k covering it
    box/polygon g-token k: bits = GROUNDING_BIT | (1<<k)
    point/scribble/seg:    open = 1 (attends / attended by everything)
    grounding tokens all:  bits |= GROUNDING_BIT (g<->g unrestricted)
  keep(i,j) = open_i | open_j | (bits_i & bits_j) != 0 | i == j
  which reproduces: visual<->visual only within a shared instance (+diag),
  restricted grounding rows/cols limited to their instance's pixels,
  open rows/cols and grounding<->grounding unmasked. Labels index SEQUENCE
  positions, so q may cover just the first N rows of the M-token sequence
  (the fuser discards grounding-token outputs, attention.py:309 `[:, :N]`).

Grid: (batch*heads, num_q_blocks); the K/M loop runs inside the kernel so
the running softmax state stays in registers/VMEM.
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

# the packed kernels keep whole-sequence k/v blocks resident plus a
# partially-unrolled softmax pipeline; the default 16M scoped-vmem budget
# is ~1M short inside the full model graph (fine standalone). 32M of the
# chip's 128M VMEM leaves room for the surrounding model buffers (64M
# starved them: "Used 128.05M of 128.00M").
_PACKED_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_blocks(n: int, m: int, block_q: int, block_k: int):
    """Clamp block sizes for short sequences (cross-attn M=77, low-res
    levels N=256) so padding never exceeds one tile."""
    bq = min(block_q, _ceil_to(n, 8))
    bk = min(block_k, _ceil_to(m, 128))
    return bq, bk


def aligned_kv_len(n: int, m: int, block_q: int = 512, block_k: int = 512):
    """kv length at which `_prep_qkv`'s k/v pads become no-ops. Callers
    that assemble kv by concatenation (the gatedSA fuser: visual tokens +
    grounding tokens) can pad the SMALL concat operand up front so the
    whole-kv pad copies (~2.2 ms/fwd of pure HBM traffic at ds1,
    docs/traces/r3) never materialize; pass the true length as `kv_len`."""
    _, bk = _pick_blocks(n, m, block_q, block_k)
    return _ceil_to(m, bk)


# ---------------------------------------------------------------------------
# Forward kernels
# ---------------------------------------------------------------------------


def _softmax_step(q, k, v, s_extra_mask, carry):
    """One online-softmax accumulation step. s_extra_mask: None or a bool
    (block_q, block_k) keep-mask already combined with kv-padding."""
    acc, m_prev, l_prev = carry
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if s_extra_mask is not None:
        s = jnp.where(s_extra_mask, s, NEG_INF)
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


def _flash_kernel(
    q_ref, k_ref, v_ref, out_ref, lse_ref=None, *,
    block_k: int, seq_k: int, kv_len: int, with_lse: bool = False,
):
    """(q-block x full-K) flash pass; scale pre-folded into q. The kv-pad
    mask runs only on the tail block that straddles kv_len."""
    q = q_ref[0]
    block_q, d = q.shape
    num_kb = seq_k // block_k

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_prev = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_prev = jnp.zeros((block_q, 1), jnp.float32)
    carry = (acc, m_prev, l_prev)
    for kb in range(num_kb):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        if (kb + 1) * block_k > kv_len:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = col < kv_len
        else:
            mask = None
        carry = _softmax_step(q, k, v, mask, carry)
    acc, m, l = carry
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)
    if with_lse:
        lse_ref[0, 0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _flash_kernel_labeled(
    bits_q_ref, open_q_ref, bits_k_ref, open_k_ref,
    q_ref, k_ref, v_ref, out_ref, lse_ref=None,
    *, block_k: int, seq_k: int, kv_len: int, block_q: int,
    with_lse: bool = False,
):
    """Flash pass with the instance-mask predicate evaluated in-kernel from
    per-token labels. Label refs are (1, seq) int32 rows in VMEM."""
    qb = pl.program_id(1)
    q = q_ref[0]
    d = q.shape[1]
    num_kb = seq_k // block_k

    bq = bits_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
    oq = open_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
    row = qb * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_prev = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_prev = jnp.zeros((block_q, 1), jnp.float32)
    carry = (acc, m_prev, l_prev)
    for kb in range(num_kb):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        bk = bits_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
        ok = open_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        keep = (oq > 0) | (ok > 0) | ((bq & bk) != 0) | (row == col)
        if (kb + 1) * block_k > kv_len:
            keep = keep & (col < kv_len)
        carry = _softmax_step(q, k, v, keep, carry)
    acc, m, l = carry
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)
    if with_lse:
        lse_ref[0, 0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]


def _prep_qkv(q, k, v, block_q, block_k, scale):
    """(B,H,N,C) -> padded (B*H, npad, C) with scale folded into q
    (scale=None: caller already folded it, e.g. into the to_q weight).
    Head dim is NOT padded (Mosaic handles minor dims equal to the full
    array dim); only sequence axes pad to block multiples."""
    b, h, n, c = q.shape
    m = k.shape[2]
    npad = _ceil_to(n, block_q)
    mpad = _ceil_to(m, block_k)
    if scale is not None:
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, npad - n), (0, 0))).reshape(
        b * h, npad, c
    )
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, mpad - m), (0, 0))).reshape(
        b * h, mpad, c
    )
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, mpad - m), (0, 0))).reshape(
        b * h, mpad, c
    )
    return qp, kp, vp, npad, mpad


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "pre_scaled", "kv_len"),
)
def flash_attention(
    q: jnp.ndarray,   # (B, H, N, C)
    k: jnp.ndarray,   # (B, H, M, C)
    v: jnp.ndarray,   # (B, H, M, C)
    mask: jnp.ndarray | None = None,        # unsupported here; use labels
    labels: tuple | None = None,            # (bits (B,M), open (B,M)) int32
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    pre_scaled: bool = False,
    kv_len: int | None = None,
) -> jnp.ndarray:
    """Fused attention. For instance masking pass `labels` (indexed by
    SEQUENCE position over the M k-tokens; q covers the first N positions);
    a dense `mask` falls back to the XLA path (kept for API parity).
    `kv_len`: true kv length when the caller pre-padded k/v to a block
    multiple (see `aligned_kv_len`); rows >= kv_len are masked out."""
    if mask is not None:
        from instancediffusion_tpu.ops.attention import sdpa_xla

        return sdpa_xla(q, k, v, mask=mask, pre_scaled=pre_scaled)

    b, h, n, c = q.shape
    m = k.shape[2]
    true_m = m if kv_len is None else kv_len
    scale = None if pre_scaled else 1.0 / math.sqrt(c)
    block_q, block_k = _pick_blocks(n, m, block_q, block_k)
    qp, kp, vp, npad, mpad = _prep_qkv(q, k, v, block_q, block_k, scale)
    grid = (b * h, npad // block_q)

    if labels is None:
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel, block_k=block_k, seq_k=mpad, kv_len=true_m,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, c), lambda bh, qb: (bh, qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad, c), lambda bh, qb: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad, c), lambda bh, qb: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, c), lambda bh, qb: (bh, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, npad, c), q.dtype),
            interpret=interpret,
        )(qp, kp, vp)
    else:
        bits, open_ = labels  # (B, M) int32, sequence-position indexed
        assert bits.shape[1] in (m, true_m), "labels must cover the k sequence"
        lbl_len = max(npad, mpad)
        bits_p, open_p = _pad_labels(bits, open_, lbl_len, h)
        lbl_spec = pl.BlockSpec((1, lbl_len), lambda bh, qb: (bh, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel_labeled, block_k=block_k, seq_k=mpad,
                kv_len=true_m, block_q=block_q,
            ),
            grid=grid,
            in_specs=[
                lbl_spec, lbl_spec, lbl_spec, lbl_spec,
                pl.BlockSpec((1, block_q, c), lambda bh, qb: (bh, qb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad, c), lambda bh, qb: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mpad, c), lambda bh, qb: (bh, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, c), lambda bh, qb: (bh, qb, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, npad, c), q.dtype),
            interpret=interpret,
        )(bits_p, open_p, bits_p, open_p, qp, kp, vp)

    return out.reshape(b, h, npad, c)[:, :, :n, :]


def _pad_labels(bits, open_, seq_pad, h):
    n = bits.shape[1]
    bits_p = jnp.repeat(jnp.pad(bits, ((0, 0), (0, seq_pad - n))), h, axis=0)
    open_p = jnp.repeat(jnp.pad(open_, ((0, 0), (0, seq_pad - n))), h, axis=0)
    return bits_p, open_p


# ---------------------------------------------------------------------------
# Packed-layout forward: q/k/v stay (B, N, H*c) — the projection's natural
# output — and heads are sliced INSIDE the kernel. Avoids the XLA head-split
# transpose whose (…, c=40)-minor physical retiling cost ~38 ms/fwd of
# bitcast-copies around every pallas call (docs/traces/r2b). The grid is
# (batch, q-blocks); k/v for the whole sequence live once in VMEM per batch
# row and all H heads reuse them.
# ---------------------------------------------------------------------------


def _packed_head_pass(
    q, k_ref, v_ref, h, c, block_k, kv_len, tail_keep, keeps=None,
    unroll: int = 4,
):
    """Online-softmax over the k sequence for ONE head of the packed
    layout. Full k-blocks run under a fori_loop (bounded Mosaic stack —
    a fully unrolled heads x kblocks body blew the 16M scoped-vmem
    limit), the straddling tail block is peeled off statically so full
    blocks skip masking entirely. `keeps`: optional (num_kb, bq, bk)
    stacked keep-masks (instance labels), dynamically indexed."""
    block_q = q.shape[0]
    num_full = kv_len // block_k
    has_tail = kv_len % block_k != 0

    acc = jnp.zeros((block_q, c), jnp.float32)
    m_prev = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_prev = jnp.zeros((block_q, 1), jnp.float32)

    def step(kb, carry):
        k = k_ref[0, pl.ds(kb * block_k, block_k), h * c:(h + 1) * c]
        v = v_ref[0, pl.ds(kb * block_k, block_k), h * c:(h + 1) * c]
        mask = None
        if keeps is not None:
            mask = jax.lax.dynamic_index_in_dim(keeps, kb, 0, False)
        return _softmax_step(q, k, v, mask, carry)

    # manual partial unroll (Mosaic's fori lowering only does 1 or full;
    # a full heads x kblocks unroll needs a ~50M scoped stack, which
    # starves the rest of the model's VMEM — and measures no faster)
    uf = unroll if num_full % unroll == 0 else (2 if num_full % 2 == 0 else 1)

    def body(i, carry):
        for j in range(uf):
            carry = step(i * uf + j, carry)
        return carry

    carry = jax.lax.fori_loop(
        0, num_full // uf, body, (acc, m_prev, l_prev)
    )
    if has_tail:
        kb = num_full
        k = k_ref[0, pl.ds(kb * block_k, block_k), h * c:(h + 1) * c]
        v = v_ref[0, pl.ds(kb * block_k, block_k), h * c:(h + 1) * c]
        mask = tail_keep
        carry = _softmax_step(q, k, v, mask, carry)
    return carry


def _flash_kernel_packed(
    q_ref, k_ref, v_ref, out_ref, lse_ref=None, *,
    num_heads: int, block_k: int, seq_k: int, kv_len: int,
    with_lse: bool = False,
):
    qa = q_ref[0]            # (block_q, H*c), scale pre-folded
    block_q, hc = qa.shape
    c = hc // num_heads

    if kv_len % block_k != 0:
        col = (kv_len // block_k) * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        tail_keep = col < kv_len
    else:
        tail_keep = None

    outs = []
    for h in range(num_heads):
        q = qa[:, h * c:(h + 1) * c]
        acc, m, l = _packed_head_pass(
            q, k_ref, v_ref, h, c, block_k, kv_len, tail_keep
        )
        outs.append((acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype))
        if with_lse:
            lse_ref[0, h] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]
    out_ref[0] = jnp.concatenate(outs, axis=1)


def _flash_kernel_packed_labeled(
    bits_ref, open_ref, q_ref, k_ref, v_ref, out_ref, lse_ref=None, *,
    num_heads: int, block_k: int, seq_k: int, kv_len: int, block_q: int,
    with_lse: bool = False,
):
    """Packed layout + in-kernel instance-mask predicate. Labels are
    (1, seq) int32 rows shared by every head (they index SEQUENCE
    positions, so no per-head replication is needed). Keep-masks are
    head-independent: built once per k-block (static 128-aligned label
    slices), stacked, and dynamically indexed inside each head's loop."""
    qb = pl.program_id(1)
    qa = q_ref[0]
    _, hc = qa.shape
    c = hc // num_heads
    num_full = kv_len // block_k
    has_tail = kv_len % block_k != 0

    bq = bits_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
    oq = open_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
    row = qb * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def block_keep(kb):
        bk = bits_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
        ok = open_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
        col = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        keep = (oq > 0) | (ok > 0) | ((bq & bk) != 0) | (row == col)
        if (kb + 1) * block_k > kv_len:
            keep = keep & (col < kv_len)
        return keep

    keeps = (
        jnp.stack([block_keep(kb) for kb in range(num_full)])
        if num_full else None
    )
    tail_keep = block_keep(num_full) if has_tail else None

    outs = []
    for h in range(num_heads):
        q = qa[:, h * c:(h + 1) * c]
        acc, m, l = _packed_head_pass(
            q, k_ref, v_ref, h, c, block_k, kv_len, tail_keep, keeps=keeps
        )
        outs.append((acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype))
        if with_lse:
            lse_ref[0, h] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, 0]
    out_ref[0] = jnp.concatenate(outs, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_q", "block_k", "interpret",
                     "pre_scaled", "kv_len"),
)
def flash_attention_packed(
    q: jnp.ndarray,   # (B, N, H*c)
    k: jnp.ndarray,   # (B, M, H*c)
    v: jnp.ndarray,   # (B, M, H*c)
    num_heads: int = 8,
    labels: tuple | None = None,   # (bits (B,M), open (B,M)) int32
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    pre_scaled: bool = False,
    kv_len: int | None = None,
) -> jnp.ndarray:
    """Fused multi-head attention on projection-layout tensors: heads are
    split in-kernel, so no (B,H,N,c) array — and none of its physical
    retiling — ever exists. `pre_scaled`: the caller already folded
    1/sqrt(c) into q (e.g. into the to_q weight — saves a whole-q pass).
    `kv_len`: true kv length for pre-padded k/v (see `aligned_kv_len`)."""
    b, n, hc = q.shape
    m = k.shape[1]
    true_m = m if kv_len is None else kv_len
    c = hc // num_heads
    scale = 1.0 / math.sqrt(c)
    block_q, block_k = _pick_blocks(n, m, block_q, block_k)
    npad = _ceil_to(n, block_q)
    mpad = _ceil_to(m, block_k)
    qp = q if pre_scaled else (q.astype(jnp.float32) * scale).astype(q.dtype)
    qp = jnp.pad(qp, ((0, 0), (0, npad - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, mpad - m), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, mpad - m), (0, 0)))
    grid = (b, npad // block_q)

    qkv_specs = [
        pl.BlockSpec((1, block_q, hc), lambda bi, qb: (bi, qb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, mpad, hc), lambda bi, qb: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, mpad, hc), lambda bi, qb: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, block_q, hc), lambda bi, qb: (bi, qb, 0),
                            memory_space=pltpu.VMEM)
    if labels is None:
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel_packed, num_heads=num_heads,
                block_k=block_k, seq_k=mpad, kv_len=true_m,
            ),
            grid=grid, in_specs=qkv_specs, out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, npad, hc), q.dtype),
            compiler_params=_PACKED_PARAMS,
            interpret=interpret,
        )(qp, kp, vp)
    else:
        bits, open_ = labels
        assert bits.shape[1] in (m, true_m), "labels must cover the k sequence"
        lbl_len = max(npad, mpad)
        bits_p = jnp.pad(bits, ((0, 0), (0, lbl_len - bits.shape[1])))
        open_p = jnp.pad(open_, ((0, 0), (0, lbl_len - open_.shape[1])))
        lbl_spec = pl.BlockSpec((1, lbl_len), lambda bi, qb: (bi, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(
                _flash_kernel_packed_labeled, num_heads=num_heads,
                block_k=block_k, seq_k=mpad, kv_len=true_m, block_q=block_q,
            ),
            grid=grid, in_specs=[lbl_spec, lbl_spec] + qkv_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, npad, hc), q.dtype),
            compiler_params=_PACKED_PARAMS,
            interpret=interpret,
        )(bits_p, open_p, qp, kp, vp)
    return out[:, :n, :]


# ---------------------------------------------------------------------------
# Backward pass (custom VJP) for training.
#
# Standard flash backward: recompute scores blockwise using the saved
# softmax statistics (m, l folded into `lse`), accumulate
#   dv += p^T dout
#   dp  = dout v^T
#   ds  = p * (dp - delta)        with delta = rowsum(dout * out)
#   dq += ds k * scale ;  dk += ds^T q * scale
# The kernels work on SCALED q (qs = q * scale), so s = qs k^T directly,
# dk = ds^T qs (the scale folds in for free), and dq needs one final
# * scale on the (block_q, d) accumulator.
# dq uses a q-block grid (inner loop over K); dk/dv use a k-block grid
# (inner loop over Q) so every accumulation stays block-local in VMEM.
# ---------------------------------------------------------------------------


def _fwd_with_stats(q, k, v, labels, block_q, block_k, interpret):
    b, h, n, c = q.shape
    m = k.shape[2]
    scale = 1.0 / math.sqrt(c)
    block_q, block_k = _pick_blocks(n, m, block_q, block_k)
    qp, kp, vp, npad, mpad = _prep_qkv(q, k, v, block_q, block_k, scale)
    grid = (b * h, npad // block_q)
    qkv_specs = [
        pl.BlockSpec((1, block_q, c), lambda bh, qb: (bh, qb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, mpad, c), lambda bh, qb: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, mpad, c), lambda bh, qb: (bh, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, block_q, c), lambda bh, qb: (bh, qb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((b * h, npad, c), q.dtype),
        jax.ShapeDtypeStruct((b * h, 1, npad), jnp.float32),
    )
    if labels is None:
        out, lse = pl.pallas_call(
            functools.partial(
                _flash_kernel, block_k=block_k, seq_k=mpad, kv_len=m,
                with_lse=True,
            ),
            grid=grid, in_specs=qkv_specs, out_specs=out_specs,
            out_shape=out_shape, interpret=interpret,
        )(qp, kp, vp)
        lbl = None
    else:
        bits, open_ = labels
        lbl_len = max(npad, mpad)
        bits_p, open_p = _pad_labels(bits, open_, lbl_len, h)
        lbl_spec = pl.BlockSpec((1, lbl_len), lambda bh, qb: (bh, 0),
                                memory_space=pltpu.VMEM)
        out, lse = pl.pallas_call(
            functools.partial(
                _flash_kernel_labeled, block_k=block_k, seq_k=mpad,
                kv_len=m, block_q=block_q, with_lse=True,
            ),
            grid=grid, in_specs=[lbl_spec] * 4 + qkv_specs,
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
        )(bits_p, open_p, bits_p, open_p, qp, kp, vp)
        lbl = (bits_p, open_p)
    dims = (b, h, n, m, c, npad, mpad, block_q, block_k)
    out_full = out.reshape(b, h, npad, c)[:, :, :n, :]
    return out_full, (qp, kp, vp, out, lse, lbl, dims)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, block_k, seq_k, scale, kv_len,
    labeled=False, bits_q_ref=None, open_q_ref=None, bits_k_ref=None,
    open_k_ref=None, block_q=None,
):
    q = q_ref[0]  # already scaled
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    bq_sz, d = q.shape
    num_kb = seq_k // block_k
    if labeled:
        qb = pl.program_id(1)
        bq = bits_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
        oq = open_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
        row = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )

    dq = jnp.zeros((bq_sz, d), jnp.float32)
    for kb in range(num_kb):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        keep = None
        if labeled:
            bk = bits_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
            ok = open_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq_sz, block_k), 1
            )
            keep = (oq > 0) | (ok > 0) | ((bq & bk) != 0) | (row == col)
            if (kb + 1) * block_k > kv_len:
                keep = keep & (col < kv_len)
        elif (kb + 1) * block_k > kv_len:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq_sz, block_k), 1
            )
            keep = col < kv_len
        if keep is not None:
            s = jnp.where(keep, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq = dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, block_q, seq_q, kv_len, q_len, block_k,
    labeled=False, bits_q_ref=None, open_q_ref=None, bits_k_ref=None,
    open_k_ref=None,
):
    k = k_ref[0]
    v = v_ref[0]
    bk_sz, d = k.shape
    kb = pl.program_id(1)
    col = kb * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )
    # kb is the (traced) grid index here, so whether THIS block straddles
    # kv_len can't be a python branch; apply the pad mask on every block
    # when any k-padding exists at all (static)
    mask_tail = kv_len % block_k != 0
    if labeled:
        bkl = bits_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
        okl = open_k_ref[0, pl.ds(kb * block_k, block_k)].reshape(1, block_k)
    num_qb = seq_q // block_q

    dk = jnp.zeros((bk_sz, d), jnp.float32)
    dv = jnp.zeros((bk_sz, d), jnp.float32)
    for qb in range(num_qb):
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]  # scaled
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        keep = None
        if labeled:
            bq = bits_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
            oq = open_q_ref[0, pl.ds(qb * block_q, block_q)].reshape(block_q, 1)
            row = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            keep = (oq > 0) | (okl > 0) | ((bq & bkl) != 0) | (row == col)
            if mask_tail:
                keep = keep & (col < kv_len)
        elif mask_tail:
            keep = col < kv_len
        if keep is not None:
            s = jnp.where(keep, s, NEG_INF)
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
        ds = p * (dp - delta)
        # dk = ds^T (q*scale) — scale already folded into q
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(res, g, block_q, block_k, interpret):
    qp, kp, vp, outp, lse, lbl, dims = res
    b, h, n, m, c, npad, mpad, block_q, block_k = dims
    scale = 1.0 / math.sqrt(c)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, npad - n), (0, 0))).reshape(
        b * h, npad, c
    )
    delta = jnp.sum(
        gp.astype(jnp.float32) * outp.astype(jnp.float32), axis=-1
    )[:, None, :]

    labeled = lbl is not None
    lbl_specs = []
    lbl_args = []
    if labeled:
        bits_p, open_p = lbl
        lbl_len = bits_p.shape[1]
        lbl_spec = pl.BlockSpec((1, lbl_len), lambda bh, blk: (bh, 0),
                                memory_space=pltpu.VMEM)
        lbl_specs = [lbl_spec] * 4
        lbl_args = [bits_p, open_p, bits_p, open_p]

    def dq_kernel(*refs, **kw):
        if labeled:
            (bq, oq, bk, ok, q, k, v, do, lse_r, delta_r, dq_r) = refs
            _bwd_dq_kernel(
                q, k, v, do, lse_r, delta_r, dq_r, labeled=True,
                bits_q_ref=bq, open_q_ref=oq, bits_k_ref=bk, open_k_ref=ok,
                **kw,
            )
        else:
            _bwd_dq_kernel(*refs, **kw)

    grid_q = (b * h, npad // block_q)
    dq = pl.pallas_call(
        functools.partial(
            dq_kernel, block_k=block_k, seq_k=mpad, scale=scale, kv_len=m,
            block_q=block_q,
        ),
        grid=grid_q,
        in_specs=lbl_specs + [
            pl.BlockSpec((1, block_q, c), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, c), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, c), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, c), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qb: (bh, 0, qb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, c), lambda bh, qb: (bh, qb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, npad, c), qp.dtype),
        interpret=interpret,
    )(*lbl_args, qp, kp, vp, gp, lse, delta)

    def dkv_kernel(*refs, **kw):
        if labeled:
            (bq, oq, bk, ok, q, k, v, do, lse_r, delta_r, dk_r, dv_r) = refs
            _bwd_dkv_kernel(
                q, k, v, do, lse_r, delta_r, dk_r, dv_r, labeled=True,
                bits_q_ref=bq, open_q_ref=oq, bits_k_ref=bk, open_k_ref=ok,
                **kw,
            )
        else:
            _bwd_dkv_kernel(*refs, **kw)

    grid_k = (b * h, mpad // block_k)
    dk, dv = pl.pallas_call(
        functools.partial(
            dkv_kernel, block_q=block_q, seq_q=npad, kv_len=m, q_len=n,
            block_k=block_k,
        ),
        grid=grid_k,
        in_specs=lbl_specs + [
            pl.BlockSpec((1, npad, c), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, c), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda bh, kb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, c), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, c), lambda bh, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, mpad, c), kp.dtype),
            jax.ShapeDtypeStruct((b * h, mpad, c), vp.dtype),
        ),
        interpret=interpret,
    )(*lbl_args, qp, kp, vp, gp, lse, delta)

    dq = dq.reshape(b, h, npad, c)[:, :, :n, :]
    dk = dk.reshape(b, h, mpad, c)[:, :, :m, :]
    dv = dv.reshape(b, h, mpad, c)[:, :, :m, :]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_trainable(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    block_q: int = 512, block_k: int = 512, interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused attention (B,H,N,C)x(B,H,M,C) — forward matches
    flash_attention(labels=None); backward is the flash recomputation."""
    out, _ = _fwd_with_stats(q, k, v, None, block_q, block_k, interpret)
    return out


def _fat_fwd(q, k, v, block_q, block_k, interpret):
    return _fwd_with_stats(q, k, v, None, block_q, block_k, interpret)


def _fat_bwd(block_q, block_k, interpret, res, g):
    return _flash_bwd(res, g, block_q, block_k, interpret)


flash_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_trainable_labeled(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    bits: jnp.ndarray, open_: jnp.ndarray,
    block_q: int = 512, block_k: int = 512, interpret: bool = False,
) -> jnp.ndarray:
    """Instance-masked differentiable attention — the masked-attention
    TRAINING path (use_masked_att). Labels index sequence positions over
    the M k-tokens; the backward re-applies the in-kernel keep predicate,
    so no (B,1,N,M) mask ever materializes."""
    out, _ = _fwd_with_stats(
        q, k, v, (bits, open_), block_q, block_k, interpret
    )
    return out


def _fatl_fwd(q, k, v, bits, open_, block_q, block_k, interpret):
    return _fwd_with_stats(q, k, v, (bits, open_), block_q, block_k, interpret)


def _fatl_bwd(block_q, block_k, interpret, res, g):
    import numpy as _np

    dq, dk, dv = _flash_bwd(res, g, block_q, block_k, interpret)
    b, h, n, m = res[6][0], res[6][1], res[6][2], res[6][3]
    # labels are integer inputs: their cotangent type is float0
    f0 = _np.zeros((b, m), jax.dtypes.float0)
    return dq, dk, dv, f0, f0


flash_attention_trainable_labeled.defvjp(_fatl_fwd, _fatl_bwd)


# ---------------------------------------------------------------------------
# Instance-mask labels
# ---------------------------------------------------------------------------


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
