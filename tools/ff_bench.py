"""GEGLU FF: fused kernel (block sizes) vs unfused XLA, bench shapes.
The r2 trace shows the ds1 FF custom calls at ~30-40 TF/s effective — far
under both the MXU and what XLA does for bare matmul chains; find out
whether block size or the kernel itself is the limiter.

python tools/ff_bench.py   (real TPU)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import time

import jax
import jax.numpy as jnp

from instancediffusion_tpu.pipeline import _enable_compilation_cache

_enable_compilation_cache()

from instancediffusion_tpu.kernels import geglu_ff


def timeit(fn, *args, n=30):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.time() - t0) / n * 1e3


def main():
    for name, b, n, c in [("ds1", 8, 4096, 320), ("ds2", 8, 1024, 640),
                          ("fuser-ff ds1", 8, 4096, 320)]:
        inner = 4 * c
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        x = jax.random.normal(ks[0], (b, n, c), jnp.bfloat16)
        w1 = jax.random.normal(ks[1], (c, 2 * inner), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((2 * inner,), jnp.bfloat16)
        w2 = jax.random.normal(ks[2], (inner, c), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((c,), jnp.bfloat16)

        flops = 2 * b * n * c * 2 * inner + 2 * b * n * inner * c

        t_x = timeit(jax.jit(geglu_ff._ff_unfused), x, w1, b1, w2, b2)
        line = f"{name}: xla {t_x:.2f} ms ({flops/t_x/1e9:.0f} TF/s)"
        for blk in (256, 512, 1024):
            if n % blk:
                continue
            orig = geglu_ff.fused_ff_geglu
            def fused(x, w1, b1, w2, b2, _blk=blk):
                import functools
                # re-dispatch with a chosen block by shadowing block pick
                bsz, nn_, cc = x.shape
                from jax.experimental import pallas as pl
                from jax.experimental.pallas import tpu as pltpu
                two_inner = w1.shape[1]
                dt = x.dtype
                return pl.pallas_call(
                    geglu_ff._ff_kernel,
                    grid=(bsz, nn_ // _blk),
                    in_specs=[
                        pl.BlockSpec((1, _blk, cc), lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((cc, two_inner), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, two_inner), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((two_inner // 2, cc), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, cc), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((1, _blk, cc), lambda i, j: (i, j, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((bsz, nn_, cc), dt),
                    compiler_params=geglu_ff._FF_PARAMS,
                )(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
            t_f = timeit(jax.jit(fused), x, w1, b1, w2, b2)
            line += f"   blk{blk} {t_f:.2f} ms ({flops/t_f/1e9:.0f} TF/s)"
        print(line)


if __name__ == "__main__":
    main()
