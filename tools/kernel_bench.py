"""Flash-attention kernel experiments on the real TPU.

Times variants of the fused attention at the benchmark's dominant shapes
(ds=1 self-attn B8 H8 N4096 d40; fuser N4280) to pick kernel parameters
with data instead of guesses. Results feed kernels/flash_attention.py.

Run: python tools/kernel_bench.py
"""


from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import functools
import math
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
LOG2E = math.log2(math.e)


def _ceil_to(x, m):
    return (x + m - 1) // m * m


# --- variant kernel: scale folded into q, optional kv-pad mask, exp2 -------


def _kernel_v2(q_ref, k_ref, v_ref, out_ref, *, block_k, seq_k, kv_len,
               use_exp2, mask_pad):
    q = q_ref[0]
    block_q, d = q.shape
    num_kb = seq_k // block_k

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if mask_pad:
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(col < kv_len, s, NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        if use_exp2:
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
        else:
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
    jax.jit,
    static_argnames=("block_q", "block_k", "use_exp2", "pad_in_hbm"),
)
def flash_v2(q, k, v, block_q=512, block_k=512, use_exp2=True,
             pad_in_hbm=True):
    b, h, n, c = q.shape
    m = k.shape[2]
    scale = 1.0 / math.sqrt(c)
    if use_exp2:
        scale = scale * LOG2E
    cp = _ceil_to(c, 128) if pad_in_hbm else c
    npad = _ceil_to(n, block_q)
    mpad = _ceil_to(m, block_k)
    # scale folded into q (N*d mults instead of N*M per block)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
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
    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, block_k=block_k, seq_k=mpad, kv_len=m,
            use_exp2=use_exp2, mask_pad=(mpad != m),
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
        out_specs=pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, npad, cp), q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, npad, cp)[:, :, :n, :c]


# --- variant: no transpose — inputs stay (B, N, H, C), grid picks (b, h) ---


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "use_exp2")
)
def flash_v3_nhsplit(q, k, v, block_q=512, block_k=512, use_exp2=True):
    """q,k,v: (B, N, H*C) — the pre-head-split layout straight from the
    projection. Head split happens in the BlockSpec index map; no transpose
    or reshape copies in HBM. d padded in HBM (lane dim must be the packed
    head slice)."""
    b, n, hc = q.shape
    m = k.shape[1]
    h = 8
    c = hc // h
    scale = 1.0 / math.sqrt(c)
    if use_exp2:
        scale = scale * LOG2E
    cp = _ceil_to(c, 128)
    npad = _ceil_to(n, block_q)
    mpad = _ceil_to(m, block_k)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)

    def pad4(x, seq_pad):
        x = x.reshape(b, -1, h, c)
        return jnp.pad(
            x, ((0, 0), (0, seq_pad - x.shape[1]), (0, 0), (0, cp - c))
        )

    qp = pad4(q, npad)   # (B, npad, H, cp)
    kp = pad4(k, mpad)
    vp = pad4(v, mpad)
    grid = (b * h, npad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _kernel_v2, block_k=block_k, seq_k=mpad, kv_len=m,
            use_exp2=use_exp2, mask_pad=(mpad != m),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 1, cp),
                         lambda bh, qb: (bh // h, qb, bh % h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, 1, cp),
                         lambda bh, qb: (bh // h, 0, bh % h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, 1, cp),
                         lambda bh, qb: (bh // h, 0, bh % h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 1, cp),
                               lambda bh, qb: (bh // h, qb, bh % h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, npad, h, cp), q.dtype),
    )(qp, kp, vp)
    return out[:, :n, :, :c].reshape(b, n, hc)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.time() - t0) / iters * 1e3


def main():
    from instancediffusion_tpu.kernels.flash_attention import flash_attention

    shapes = [
        ("ds1-self", 8, 8, 4096, 4096, 40),
        ("ds1-fuser", 8, 8, 4280, 4280, 40),
        ("ds2-self", 8, 8, 1024, 1024, 80),
    ]
    for name, b, h, n, m, c in shapes:
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, (b, h, n, c), jnp.bfloat16)
        k = jax.random.normal(kq, (b, h, m, c), jnp.bfloat16)
        v = jax.random.normal(kq, (b, h, m, c), jnp.bfloat16)
        base = timeit(flash_attention, q, k, v)
        print(f"{name}: baseline {base:.2f} ms")
        for bq, bk in ((512, 512), (1024, 512), (512, 1024), (1024, 1024),
                       (2048, 512), (256, 512), (512, 256)):
            for e2 in (True, False):
                try:
                    t = timeit(
                        functools.partial(
                            flash_v2, block_q=bq, block_k=bk, use_exp2=e2
                        ),
                        q, k, v,
                    )
                    print(f"  v2 bq{bq} bk{bk} exp2={int(e2)}: {t:.2f} ms")
                except Exception as ex:
                    print(f"  v2 bq{bq} bk{bk} exp2={int(e2)}: FAIL "
                          f"{type(ex).__name__} {str(ex)[:80]}")
        # numeric check
        ref = flash_attention(q, k, v)
        got = flash_v2(q, k, v)
        import numpy as np

        err = float(
            jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
        )
        print(f"  v2 max|err| vs baseline: {err:.4f}")

        # layout variant from (B, N, H*C)
        q2 = q.transpose(0, 2, 1, 3).reshape(b, n, h * c)
        k2 = k.transpose(0, 2, 1, 3).reshape(b, m, h * c)
        v2 = v.transpose(0, 2, 1, 3).reshape(b, m, h * c)
        if h == 8:
            try:
                t = timeit(flash_v3_nhsplit, q2, k2, v2)
                print(f"  v3 no-transpose (from BNHC): {t:.2f} ms")
                got3 = flash_v3_nhsplit(q2, k2, v2)
                got3 = got3.reshape(b, n, h, c).transpose(0, 2, 1, 3)
                err = float(jnp.max(jnp.abs(
                    ref.astype(jnp.float32) - got3.astype(jnp.float32))))
                print(f"  v3 max|err|: {err:.4f}")
            except Exception as ex:
                print(f"  v3 FAIL {type(ex).__name__} {str(ex)[:120]}")


if __name__ == "__main__" and not __import__("os").environ.get("ROUND2"):
    main()


# --- round 2 experiments: unrolled k-loop, giant q-block ------------------


def _kernel_v4(q_ref, k_ref, v_ref, out_ref, *, block_k, seq_k, unroll):
    """No pad-mask, scale pre-folded, python-unrolled k loop."""
    q = q_ref[0]
    block_q, d = q.shape
    num_kb = seq_k // block_k

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_prev = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l_prev = jnp.zeros((block_q, 1), jnp.float32)

    def step(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc2 = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc2, m_new, l_new

    if unroll:
        carry = (acc, m_prev, l_prev)
        for kb in range(num_kb):
            carry = step(kb, carry)
        acc, m, l = carry
    else:
        acc, m, l = jax.lax.fori_loop(0, num_kb, step, (acc, m_prev, l_prev))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "unroll")
)
def flash_v4(q, k, v, block_q=512, block_k=512, unroll=True):
    b, h, n, c = q.shape
    m = k.shape[2]
    scale = 1.0 / math.sqrt(c)
    cp = _ceil_to(c, 128)
    npad = _ceil_to(n, block_q)
    mpad = _ceil_to(m, block_k)
    assert mpad == m, "v4 requires exact k multiples"
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, npad - n), (0, cp - c))).reshape(
        b * h, npad, cp
    )
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, cp - c))).reshape(b * h, m, cp)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, cp - c))).reshape(b * h, m, cp)
    grid = (b * h, npad // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel_v4, block_k=block_k, seq_k=mpad,
                          unroll=unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mpad, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, npad, cp), q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, npad, cp)[:, :, :n, :c]


def _kernel_v5(q_ref, k_ref, v_ref, out_ref, *, block_k, seq_k):
    """Single-pass: whole K in VMEM, s for the full row block computed as
    one matmul, one exp pass, no running max (full-row max)."""
    q = q_ref[0]
    block_q, d = q.shape
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def flash_v5(q, k, v, block_q=512):
    b, h, n, c = q.shape
    m = k.shape[2]
    scale = 1.0 / math.sqrt(c)
    cp = _ceil_to(c, 128)
    npad = _ceil_to(n, block_q)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, npad - n), (0, cp - c))).reshape(
        b * h, npad, cp
    )
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, cp - c))).reshape(b * h, m, cp)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, cp - c))).reshape(b * h, m, cp)
    grid = (b * h, npad // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel_v5, block_k=m, seq_k=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, cp), lambda bh, qb: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, cp), lambda bh, qb: (bh, qb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, npad, cp), q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, npad, cp)[:, :, :n, :c]


def main2():
    from instancediffusion_tpu.kernels.flash_attention import flash_attention
    import numpy as np

    for name, b, h, n, m, c in (
        ("ds1-self", 8, 8, 4096, 4096, 40),
        ("ds2-self", 8, 8, 1024, 1024, 80),
    ):
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(kq, (b, h, n, c), jnp.bfloat16)
        k = jax.random.normal(kq, (b, h, m, c), jnp.bfloat16)
        v = jax.random.normal(kq, (b, h, m, c), jnp.bfloat16)
        ref = flash_attention(q, k, v)
        print(f"{name}: baseline {timeit(flash_attention, q, k, v):.2f} ms")
        for bq, bk, un in ((512, 512, True), (512, 1024, True),
                           (1024, 1024, True), (512, 2048, True),
                           (512, 4096 if n == 4096 else 1024, True)):
            try:
                f = functools.partial(flash_v4, block_q=bq, block_k=bk, unroll=un)
                t = timeit(f, q, k, v)
                err = float(jnp.max(jnp.abs(
                    ref.astype(jnp.float32) - f(q, k, v).astype(jnp.float32))))
                print(f"  v4 bq{bq} bk{bk} unroll: {t:.2f} ms err {err:.4f}")
            except Exception as ex:
                print(f"  v4 bq{bq} bk{bk}: FAIL {str(ex)[:90]}")
        for bq in (256, 512, 1024):
            try:
                f = functools.partial(flash_v5, block_q=bq)
                t = timeit(f, q, k, v)
                err = float(jnp.max(jnp.abs(
                    ref.astype(jnp.float32) - f(q, k, v).astype(jnp.float32))))
                print(f"  v5 single-pass bq{bq}: {t:.2f} ms err {err:.4f}")
            except Exception as ex:
                print(f"  v5 bq{bq}: FAIL {str(ex)[:90]}")


if __name__ == "__main__" and __import__("os").environ.get("ROUND2"):
    main2()
