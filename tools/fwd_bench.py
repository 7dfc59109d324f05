"""Time ONE full UNet forward (B = CFG batch) on the real TPU, with
switchable attention paths — the unit the 50-step bench multiplies.

python tools/fwd_bench.py [--packed64]   (default: split-heads, the measured winner)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import sys
import time

import jax
import jax.numpy as jnp

from instancediffusion_tpu.pipeline import _enable_compilation_cache

_enable_compilation_cache()

from instancediffusion_tpu.config import UNetConfig
from instancediffusion_tpu.models import unet, unifusion


def main():
    if "--packed64" in sys.argv:
        unet.PACKED64 = True
        tag = "packed64"
    elif "--fused-proj" in sys.argv:
        from instancediffusion_tpu.kernels import head_layout

        unet.FUSED_PROJ = True
        tag = (f"fused-proj (split={head_layout.SPLIT_VARIANT}, "
               f"merge={head_layout.MERGE_VARIANT})")
    else:
        tag = "split-heads (default)"

    cfg = UNetConfig()
    params = jax.jit(lambda k: unet.init_unet(k, cfg))(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    b = 8
    x = jnp.zeros((b, 64, 64, 4), jnp.bfloat16)
    t = jnp.array([500] * b, jnp.int32)
    ctx = jnp.zeros((b, 77, 768), jnp.bfloat16)
    g = unifusion.null_grounding(b, cfg.max_objs, cfg.grounding_tokenizer)

    @jax.jit
    def fwd(params, x, t, ctx, objs):
        return unet.apply_unet(params, cfg, x, t, ctx, None, gate_scale=1.0,
                               precomputed_objs=objs)

    objs = jax.jit(
        lambda p, g: unifusion.apply_unifusion(
            p["position_net"], cfg.grounding_tokenizer, g,
            unifusion.ModalityDrops.test_defaults(cfg.grounding_tokenizer),
        )[0]
    )(params, g)

    t0 = time.time()
    out = fwd(params, x, t, ctx, objs)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"compile+run: {time.time() - t0:.1f}s")
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = fwd(params, x, t, ctx, objs)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / n * 1e3
    print(f"{tag}: {dt:.1f} ms/fwd (B={b})")


if __name__ == "__main__":
    main()
