"""Microbench: fused proj+head-split/merge kernels vs the XLA formula at
the real ds1 shapes (B = CFG batch, N = 4096 visual / 4608 fuser kv,
H = 8, c = 40, C = 320).

The XLA side times dot + explicit transpose-to-(B,H,N,c) — the exact
producer/consumer pattern around the flash kernels that docs/traces/r3b
shows as ~6.4 ms/fwd of copy ops.

CAVEAT (docs/PERF.md "axon link"): the remote link costs ~1.9 ms per
dispatched call, so the absolute numbers here are overhead-dominated for
sub-2ms ops; only large A-B deltas are meaningful. The DECISIVE metric is
tools/fwd_bench.py --fused-proj (full forward, 90+ ms) plus a device
trace (tools/profile_bench.py) for per-op attribution.

python tools/head_layout_bench.py [B]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import sys
import time

import jax
import jax.numpy as jnp

from instancediffusion_tpu.pipeline import _enable_compilation_cache

_enable_compilation_cache()

from instancediffusion_tpu.kernels.head_layout import merge_proj, proj_split


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h, c, cin = 8, 40, 320
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    for n in (4096, 4608):
        x = jax.random.normal(ks[0], (b, n, cin), jnp.bfloat16)
        wq, wk, wv = (
            jax.random.normal(ks[i + 1], (cin, cin), jnp.bfloat16)
            for i in range(3)
        )
        wo = jax.random.normal(ks[4], (cin, cin), jnp.bfloat16)
        bo = jax.random.normal(ks[5], (cin,), jnp.bfloat16)
        o = jax.random.normal(ks[6], (b, h, n, c), jnp.bfloat16)

        @jax.jit
        def xla_split(x, wq, wk, wv):
            outs = []
            for w in (wq, wk, wv):
                y = x @ w
                outs.append(
                    y.reshape(b, n, h, c).transpose(0, 2, 1, 3)
                )
            return outs

        @jax.jit
        def xla_merge(o, wo, bo):
            y = o.transpose(0, 2, 1, 3).reshape(b, n, h * c)
            return y @ wo + bo

        t_x = timeit(xla_split, x, wq, wk, wv)
        print(f"N={n} XLA   qkv-split: {t_x:.3f} ms")
        for var in ("reshape", "slice"):
            t = timeit(
                lambda x, *w: proj_split(x, w, h, variant=var), x, wq, wk, wv
            )
            print(f"N={n} fused qkv-split [{var}]: {t:.3f} ms")
        t_x = timeit(xla_merge, o, wo, bo)
        print(f"N={n} XLA   merge+out: {t_x:.3f} ms")
        for var in ("reshape", "dot_per_head"):
            t = timeit(
                lambda o, w, bb: merge_proj(o, w, bb, variant=var), o, wo, bo
            )
            print(f"N={n} fused merge+out [{var}]: {t:.3f} ms")


if __name__ == "__main__":
    main()
