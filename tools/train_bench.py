"""Time the full-config training step on the real TPU (the 10.4 samples/s
number in README/PERF.md). Also the training-path validation that the
fused-kernel custom VJPs (FF/norm) compile and run through Mosaic — the
interpret-mode tests only check math.

Run: python tools/train_bench.py [batch]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from instancediffusion_tpu.config import Config
    from instancediffusion_tpu.ops.schedules import make_diffusion_schedule
    from instancediffusion_tpu.train.optimizer import make_optimizer
    from instancediffusion_tpu.train.train_step import (
        cast_frozen_bf16, init_train_state, make_train_step,
    )

    cfg = Config()
    state = init_train_state(cfg)
    tx = make_optimizer(params=state.unet_params)
    state = state._replace(opt_state=jax.jit(tx.init)(state.unet_params))
    state = cast_frozen_bf16(state)
    step_fn = jax.jit(
        make_train_step(cfg, make_diffusion_schedule(), tx),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    g = cfg.model.grounding_tokenizer
    n_seg = g.num_seg_tokens
    b = batch
    batch_data = {
        "image": jnp.asarray(rng.standard_normal((b, 512, 512, 3)), jnp.float32),
        "caption_ids": jnp.asarray(
            rng.integers(0, 49408, (b, 77)), jnp.int32
        ),
        "boxes": jnp.asarray(rng.uniform(0, 1, (b, 30, 4)), jnp.float32),
        "masks": jnp.ones((b, 30), jnp.float32),
        "text_masks": jnp.ones((b, 30), jnp.float32),
        "image_masks": jnp.zeros((b, 30), jnp.float32),
        "text_embeddings": jnp.asarray(
            rng.standard_normal((b, 30, 768)), jnp.float32
        ),
        "image_embeddings": jnp.zeros((b, 30, 768), jnp.float32),
        "points": jnp.asarray(rng.uniform(0, 1, (b, 30, 2)), jnp.float32),
        "scribbles": jnp.asarray(
            rng.uniform(0, 1, (b, 30, g.n_scribble_points * 2)), jnp.float32
        ),
        "polygons": jnp.asarray(
            rng.uniform(0, 1, (b, 30, g.n_polygon_points * 2)), jnp.float32
        ),
        "segs": jnp.zeros((b, 30, g.seg_resize_input, g.seg_resize_input),
                          jnp.float32),
    }

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, metrics = step_fn(state, batch_data, key)
    l0 = float(metrics["loss"])
    print(f"compile+first step: {time.time()-t0:.0f}s loss={l0:.4f}",
          file=sys.stderr)

    n = 10
    t0 = time.time()
    for i in range(n):
        state, metrics = step_fn(state, batch_data, jax.random.fold_in(key, i))
    l = float(metrics["loss"])
    dt = (time.time() - t0) / n
    print(f"train step: {dt*1e3:.1f} ms/step  "
          f"{batch/dt:.2f} samples/s/chip  loss={l:.4f}")


if __name__ == "__main__":
    main()
