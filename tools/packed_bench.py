"""Time the packed-layout flash kernel against split-heads + per-head
kernel + merge (what the model actually pays, including XLA's physical
retiling of the (B,H,N,40) arrays) on the benchmark's dominant shapes.

Run on the real TPU: python tools/packed_bench.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import time

import jax
import jax.numpy as jnp

from instancediffusion_tpu.kernels.flash_attention import (
    flash_attention, flash_attention_packed,
)
from instancediffusion_tpu.ops.attention import _merge_heads, _split_heads


def timeit(fn, *args, n=20):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.time() - t0) / n * 1e3


def main():
    b, h, c = 8, 8, 40
    for name, n, m in [("self ds1", 4096, 4096), ("fuser ds1", 4096, 4280),
                       ("self ds2", 1024, 1024)]:
        cc = c if n == 4096 else 80
        hc = h * cc
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, n, hc), jnp.bfloat16)
        k = jax.random.normal(key, (b, m, hc), jnp.bfloat16)
        v = jax.random.normal(key, (b, m, hc), jnp.bfloat16)

        split = jax.jit(
            lambda q, k, v: _merge_heads(
                flash_attention(
                    _split_heads(q, h), _split_heads(k, h), _split_heads(v, h)
                )
            )
        )
        packed = jax.jit(
            lambda q, k, v: flash_attention_packed(q, k, v, h)
        )
        t_split = timeit(split, q, k, v)
        t_packed = timeit(packed, q, k, v)
        print(f"{name:10s} split+kernel+merge {t_split:6.2f} ms   "
              f"packed {t_packed:6.2f} ms")


if __name__ == "__main__":
    main()
