"""Jitted training step (the reference's run_one_step, trainer.py:151-184),
data-parallel over a jax.sharding.Mesh.

Per step (all on device, one compiled program):
  1. z = VAE.encode(image) — sampled latent x 0.18215 (trainer.py:153)
  2. context = CLIP(caption ids) last_hidden_state (trainer.py:156)
  3. t ~ Uniform{0..999} (trainer.py:157-159), eps ~ N(0,1)
  4. x_t = q_sample(z, t, eps)
  5. 10% full grounding drop for CFG training (openaimodel.py:489-491)
     + UniFusion per-modality dropout (text_grounding_net.py:189-209),
     both as traced bernoullis — one compiled graph for all draws
  6. eps_hat = UNet(x_t, t, context, grounding); loss = MSE(eps_hat, eps)
  7. AdamW on the trainable mask; grads sync via the psum XLA inserts for
     the batch-sharded loss (the DDP allreduce equivalent, trainer.py:55-57)

bf16 activations / fp32 params & optimizer state (reference fp16 AMP +
GradScaler; bf16 needs no loss scaling — the NaN-skip guard is kept).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from instancediffusion_tpu.config import Config
from instancediffusion_tpu.models import clip_text, unet, unifusion, vae
from instancediffusion_tpu.ops.schedules import DiffusionSchedule
from instancediffusion_tpu.train.optimizer import init_ema, update_ema


class TrainState(NamedTuple):
    step: jnp.ndarray
    unet_params: Any
    ema_params: Any          # trainable-subset EMA (same tree as unet_params)
    opt_state: Any
    vae_params: Any          # frozen
    clip_params: Any         # frozen


def make_train_step(cfg: Config, diffusion: DiffusionSchedule, tx,
                    compute_dtype=jnp.bfloat16):
    sqrt_ac = jnp.asarray(diffusion.sqrt_alphas_cumprod)
    sqrt_1mac = jnp.asarray(diffusion.sqrt_one_minus_alphas_cumprod)
    gcfg = cfg.model.grounding_tokenizer
    ema_rate = cfg.train.ema_rate

    def loss_fn(unet_params, state: TrainState, batch, rng):
        rngs = jax.random.split(rng, 8)
        image = batch["image"].astype(compute_dtype)          # (B,H,W,3)
        b = image.shape[0]

        # 1-2: frozen encoders
        z = vae.vae_encode(
            state.vae_params, cfg.autoencoder, image, rngs[0]
        ).astype(jnp.float32)
        # caption dropout happens dataset-side: decode sets caption="" with
        # prob 1-prob_use_caption (decode_item.py:762-763) and the collate
        # tokenizes "", so dropped rows get CLIP("")'s SOT/EOT embedding —
        # exactly what the reference trains on (trainer.py:156). No masking
        # here: zeroing the context would break CFG-training parity.
        context = clip_text.apply_clip_text(
            state.clip_params, cfg.text_encoder, batch["caption_ids"]
        )["last_hidden_state"].astype(compute_dtype)

        # 3-4: forward noising
        t = jnp.minimum(
            (jax.random.uniform(rngs[1], (b,)) * 1000).astype(jnp.int32), 999
        )
        noise = jax.random.normal(rngs[2], z.shape, jnp.float32)
        x_t = (
            sqrt_ac[t][:, None, None, None] * z
            + sqrt_1mac[t][:, None, None, None] * noise
        ).astype(compute_dtype)

        # 5: grounding + dropout
        grounding = {
            "boxes": batch["boxes"],
            "masks": batch["masks"],
            "text_masks": batch.get("text_masks", batch["masks"]),
            "positive_embeddings": batch["text_embeddings"],
            "scribbles": batch["scribbles"],
            "polygons": batch["polygons"],
            "segs": batch["segs"],
            "points": batch["points"],
        }
        drop_all = jax.random.uniform(rngs[3]) < 0.1
        grounding = jax.tree_util.tree_map(
            lambda a: jnp.where(drop_all, jnp.zeros_like(a), a), grounding
        )
        drops = unifusion.train_modality_drops(rngs[4], gcfg)

        # masked instance attention (use_masked_att): per-token labels built
        # on-device from the box rasters; under drop_all the rasters are
        # zero, which instance_labels maps to "no masking" (attention.py:200)
        fuser_mask = None
        if cfg.model.use_masked_att:
            from instancediffusion_tpu.kernels.flash_attention import (
                instance_labels,
            )
            from instancediffusion_tpu.ops.instance_mask import rasterize_boxes

            rasters = rasterize_boxes(grounding["boxes"], cfg.model.image_size)
            rasters = rasters * grounding["masks"][..., None, None]
            fuser_mask = instance_labels(
                rasters, cfg.model.max_objs, gcfg.num_seg_tokens
            )

        # fused norm/FF kernels stay ON here: measured 405 ms/step with
        # them vs 424 ms/step through the XLA paths (their recompute-based
        # VJPs cost an extra FF forward under remat, but the fused forward
        # replay is cheaper than the unfused one by more than that)
        eps_hat = unet.apply_unet(
            unet_params, cfg.model, x_t, t, context, grounding,
            gate_scale=1.0, drops=drops, fuser_mask=fuser_mask,
            remat=cfg.train.gradient_checkpointing and cfg.model.use_checkpoint,
            # fused flash attention with custom VJP on TPU, XLA on CPU
            attn_impl="auto_train",
        )
        loss = jnp.mean(
            (eps_hat.astype(jnp.float32) - noise) ** 2
        )
        return loss

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.unet_params, state, batch, rng
        )
        # NaN-skip (trainer.py:86-113): the reference skips optimizer,
        # scheduler AND EMA wholesale on a non-finite loss (only iter_idx
        # advances). Select old-vs-new on every updated tree so Adam
        # moments / schedule counter / EMA are untouched on a skip.
        ok = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.unet_params)
        unet_params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.unet_params, updates
        )
        ema_params = update_ema(state.ema_params, unet_params, ema_rate)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new, old
        )
        return (
            TrainState(
                state.step + 1,
                keep(unet_params, state.unet_params),
                keep(ema_params, state.ema_params),
                keep(opt_state, state.opt_state),
                state.vae_params, state.clip_params,
            ),
            {"loss": loss, "skipped": ~ok},
        )

    return train_step


def cast_frozen_bf16(state: TrainState) -> TrainState:
    """Mixed-precision storage policy (the fp16-AMP analogue): fp32 master
    weights ONLY for trainable parameters; the frozen SD backbone, VAE and
    CLIP are stored bf16 (they never receive updates). Halves ~5.6GB of
    frozen fp32 weights — needed to fit full-config training in 16GB HBM."""
    from instancediffusion_tpu.train.optimizer import trainable_mask

    mask = trainable_mask(state.unet_params)
    unet_params = jax.tree_util.tree_map(
        lambda p, m: p if m else p.astype(jnp.bfloat16),
        state.unet_params, mask,
    )
    bf16 = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), t
    )
    return state._replace(
        unet_params=unet_params,
        vae_params=bf16(state.vae_params),
        clip_params=bf16(state.clip_params),
    )


def init_train_state(cfg: Config, tx=None, seed: int = 0) -> TrainState:
    """tx=None leaves opt_state unset — build the (param-masked) optimizer
    from the returned params and call `tx.init` then; initializing with an
    UNMASKED optimizer would transiently allocate Adam moments for all
    ~1.2B params (9.8GB) and OOM the chip."""
    k = jax.random.PRNGKey(seed)
    ku, kv, kc = jax.random.split(k, 3)
    unet_params = jax.jit(lambda k: unet.init_unet(k, cfg.model))(ku)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        unet_params=unet_params,
        ema_params=init_ema(unet_params),
        opt_state=tx.init(unet_params) if tx is not None else None,
        vae_params=jax.jit(lambda k: vae.init_vae(k, cfg.autoencoder))(kv),
        clip_params=jax.jit(
            lambda k: clip_text.init_clip_text(k, cfg.text_encoder)
        )(kc),
    )
