"""End-to-end InstanceDiffusion pipeline: demo meta -> images.

The TPU-native equivalent of the reference's inference driver
(inference.py:38-130): CLIP-encode prompt/phrases, build grounding tensors,
run PLMS (or MIS) under ONE jit with CFG batched 2x, VAE-decode.

Everything between the starting noise and the decoded image executes as a
single compiled XLA program per (shape, steps, mis) signature: the 50-step
scan, per-step gate schedule, null-grounding CFG branch, UniFusion, and the
VAE decoder.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from instancediffusion_tpu.config import Config, apply_test_preset
from instancediffusion_tpu.data.grounding_input import (
    prepare_grounding,
    prepare_instance_meta,
)
from instancediffusion_tpu.models import clip_text, unet, unifusion, vae
from instancediffusion_tpu.ops.schedules import make_diffusion_schedule
from instancediffusion_tpu.samplers import mis as mis_mod
from instancediffusion_tpu.samplers.plms import (
    build_cfg_model_fn,
    make_plms_schedule,
    plms_sample,
)


@dataclass
class PipelineParams:
    unet: Any
    vae: Any
    clip: Any


class InstanceDiffusionPipeline:
    def __init__(self, cfg: Config, params: PipelineParams, tokenizer=None):
        self.cfg = cfg
        self.params = params
        if tokenizer is None:
            from instancediffusion_tpu.data.tokenizer import CLIPTokenizer

            tokenizer = CLIPTokenizer.load_default()
        self.tokenizer = tokenizer
        self.diffusion = make_diffusion_schedule(
            cfg.diffusion.beta_schedule, cfg.diffusion.timesteps,
            cfg.diffusion.linear_start, cfg.diffusion.linear_end,
        )
        self._encode_text = jax.jit(
            lambda ids: clip_text.apply_clip_text(
                self.params.clip, cfg.text_encoder, ids
            )
        )

    # -- constructors --------------------------------------------------------

    @classmethod
    def random_init(cls, cfg: Config, seed: int = 0) -> "InstanceDiffusionPipeline":
        k = jax.random.PRNGKey(seed)
        ku, kv, kc = jax.random.split(k, 3)
        params = PipelineParams(
            unet=unet.init_unet(ku, cfg.model),
            vae=vae.init_vae(kv, cfg.autoencoder),
            clip=clip_text.init_clip_text(kc, cfg.text_encoder),
        )
        return cls(cfg, params)

    @classmethod
    def from_checkpoint(
        cls, path: str, cfg: Config | None = None, preset: str | None = None
    ) -> "InstanceDiffusionPipeline":
        from instancediffusion_tpu.io import checkpoint as ckpt_io

        cfg = cfg or Config()
        if preset:
            cfg = apply_test_preset(cfg, preset)
        params = ckpt_io.load_pipeline_params(path, cfg)
        return cls(cfg, params)

    # -- text ---------------------------------------------------------------

    def encode_prompt(self, prompts: list[str]) -> jnp.ndarray:
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        return self._encode_text(jnp.asarray(ids))["last_hidden_state"]

    def encode_phrases(self, phrases: list[str]) -> list[np.ndarray]:
        ids = np.stack([self.tokenizer.encode(p) for p in phrases])
        pooled = self._encode_text(jnp.asarray(ids))["pooler_output"]
        return [np.asarray(pooled[i]) for i in range(len(phrases))]

    # -- sampling ------------------------------------------------------------

    def _apply_eps(self, x, t, context, grounding, gate):
        mcfg = self.cfg.model
        return unet.apply_unet(
            self.params.unet, mcfg, x, t, context, grounding, gate_scale=gate,
        )

    def generate(
        self,
        meta: dict,
        num_images: int | None = None,
        steps: int | None = None,
        guidance_scale: float | None = None,
        alpha: float | None = None,
        mis: float | None = None,
        seed: int | None = None,
        negative_prompt: str | None = None,
        compute_dtype=jnp.bfloat16,
    ) -> np.ndarray:
        """meta: demo dict with prompt/phrases/locations[/points/scribbles/
        polygons/segs]. Returns (num_images, 512, 512, 3) uint8."""
        scfg = self.cfg.sampler
        num_images = num_images or scfg.num_images
        steps = steps or scfg.steps
        gs = scfg.guidance_scale if guidance_scale is None else guidance_scale
        alpha = scfg.alpha if alpha is None else alpha
        mis = scfg.mis if mis is None else mis
        seed = scfg.seed if seed is None else seed
        neg = scfg.negative_prompt if negative_prompt is None else negative_prompt
        mcfg = self.cfg.model
        alpha_type = meta.get("alpha_type", [alpha, 0.0, 1 - alpha])

        sched = make_plms_schedule(self.diffusion, steps, alpha_type)

        # text conditioning
        context = self.encode_prompt([meta["prompt"]] * num_images)
        uc = self.encode_prompt([neg] * num_images)
        phrase_emb = self.encode_phrases(meta["phrases"])

        g_np = prepare_grounding(
            meta, phrase_emb, batch=num_images, max_objs=mcfg.max_objs,
            in_dim=mcfg.grounding_tokenizer.in_dim,
        )
        grounding = {k: jnp.asarray(v) for k, v in g_np.items()}
        null_g = unifusion.null_grounding(
            num_images, mcfg.max_objs, mcfg.grounding_tokenizer
        )

        context = context.astype(compute_dtype)
        uc = uc.astype(compute_dtype)

        rng = jax.random.PRNGKey(seed)
        x_init = jax.random.normal(
            rng, (num_images, mcfg.image_size, mcfg.image_size, mcfg.in_channels)
        ).astype(compute_dtype)

        num_traj = 1 + len(meta["phrases"]) if mis > 0 else 1

        if num_traj > 1 and int(steps * mis) > 0:
            # per-instance trajectory conditioning (inference.py:83-88)
            inst_groundings = [grounding]
            inst_contexts = [context]
            for i in range(len(meta["phrases"])):
                im = prepare_instance_meta(meta, i)
                ig = prepare_grounding(
                    im, [phrase_emb[i]], batch=num_images,
                    max_objs=mcfg.max_objs,
                    in_dim=mcfg.grounding_tokenizer.in_dim,
                )
                inst_groundings.append({k: jnp.asarray(v) for k, v in ig.items()})
                inst_contexts.append(
                    self.encode_prompt([im["prompt"]] * num_images).astype(
                        compute_dtype
                    )
                )
            g_stack = mis_mod.stack_groundings(inst_groundings)
            ctx_stack = jnp.concatenate(inst_contexts, axis=0)
            uc_stack = jnp.tile(uc, (num_traj, 1, 1))
            null_stack = unifusion.null_grounding(
                num_traj * num_images, mcfg.max_objs, mcfg.grounding_tokenizer
            )

            traj_fn = build_cfg_model_fn(
                self._apply_eps, ctx_stack, uc_stack, g_stack, null_stack, gs
            )
            global_fn = build_cfg_model_fn(
                self._apply_eps, context, uc, grounding, null_g, gs
            )

            @jax.jit
            def sample_fn(x_init):
                z = mis_mod.mis_sample(
                    traj_fn, global_fn, sched, x_init, num_traj, mis
                )
                return vae.vae_decode(
                    self.params.vae, self.cfg.autoencoder, z.astype(jnp.float32)
                )

        else:
            model_fn = build_cfg_model_fn(
                self._apply_eps, context, uc, grounding, null_g, gs
            )

            @jax.jit
            def sample_fn(x_init):
                z = plms_sample(model_fn, sched, x_init)
                return vae.vae_decode(
                    self.params.vae, self.cfg.autoencoder, z.astype(jnp.float32)
                )

        images = sample_fn(x_init)
        images = np.asarray(jnp.clip(images, -1, 1) * 0.5 + 0.5)
        return (images * 255).astype(np.uint8)
