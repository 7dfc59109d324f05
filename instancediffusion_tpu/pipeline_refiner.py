"""SDXL-Refiner img2img pipeline — the native cascade second stage.

Replaces the reference's external `diffusers.StableDiffusionXLImg2ImgPipeline`
call (inference.py:112-129): encode the stage-1 image, noise it to
`strength` of the schedule, denoise with the refiner UNet under CFG, and
decode. One jitted XLA program per (batch, steps, strength) signature.

Conditioning follows the SDXL report: cross-attention over OpenCLIP-bigG
penultimate hidden states; ADM vector = Fourier(orig size, crop,
aesthetic score) + projected pooled text; the negative CFG branch uses
aesthetic score 2.5 vs the positive 6.0.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from instancediffusion_tpu.config import (
    OpenCLIPTextConfig, RefinerUNetConfig, VAEConfig,
)
from instancediffusion_tpu.data.tokenizer import CLIPTokenizer
from instancediffusion_tpu.models import clip_text, vae
from instancediffusion_tpu.models.sdxl_refiner import (
    apply_refiner_unet, init_refiner_unet, refiner_adm_vector,
)
from instancediffusion_tpu.ops.schedules import make_diffusion_schedule
from instancediffusion_tpu.samplers.ddim import ddim_sample, make_ddim_schedule


@dataclass
class RefinerParams:
    unet: dict
    vae: dict
    text: dict


def _slice_schedule(sched, keep: int):
    """Keep the last `keep` (lowest-noise) entries of a reversed DDIM
    schedule — diffusers img2img timestep slicing."""
    sl = slice(sched.num_steps - keep, None)
    return type(sched)(
        ts=sched.ts[sl], a_t=sched.a_t[sl], a_prev=sched.a_prev[sl],
        sqrt_one_minus_a_t=sched.sqrt_one_minus_a_t[sl],
        sigmas=sched.sigmas[sl], gates=sched.gates[sl],
    )


class SDXLRefinerPipeline:
    """img2img refinement. SDXL's VAE shares the SD architecture with
    scale_factor 0.13025."""

    def __init__(
        self,
        params: RefinerParams,
        unet_cfg: RefinerUNetConfig | None = None,
        text_cfg: OpenCLIPTextConfig | None = None,
        vae_cfg: VAEConfig | None = None,
        tokenizer: CLIPTokenizer | None = None,
    ):
        self.cfg = unet_cfg or RefinerUNetConfig()
        self.text_cfg = text_cfg or OpenCLIPTextConfig()
        self.vae_cfg = vae_cfg or VAEConfig(scale_factor=0.13025)
        self.params = params
        self.tokenizer = tokenizer or CLIPTokenizer.load_default()
        self.diffusion = make_diffusion_schedule()
        self._fns: dict = {}
        self._encode_jit = jax.jit(
            lambda p, ids: clip_text.apply_clip_text(p, self.text_cfg, ids)
        )

    # -- constructors -------------------------------------------------------

    @classmethod
    def random_init(cls, seed: int = 0, param_dtype=jnp.bfloat16,
                    unet_cfg: RefinerUNetConfig | None = None):
        unet_cfg = unet_cfg or RefinerUNetConfig()
        text_cfg = OpenCLIPTextConfig()
        vae_cfg = VAEConfig(scale_factor=0.13025)
        ku, kv, kt = jax.random.split(jax.random.PRNGKey(seed), 3)
        params = RefinerParams(
            unet=jax.jit(lambda k: init_refiner_unet(k, unet_cfg))(ku),
            vae=jax.jit(lambda k: vae.init_vae(k, vae_cfg))(kv),
            text=jax.jit(lambda k: clip_text.init_clip_text(k, text_cfg))(kt),
        )
        if param_dtype is not None:
            params = RefinerParams(
                unet=jax.tree_util.tree_map(lambda a: a.astype(param_dtype), params.unet),
                vae=jax.tree_util.tree_map(lambda a: a.astype(param_dtype), params.vae),
                text=jax.tree_util.tree_map(lambda a: a.astype(param_dtype), params.text),
            )
        return cls(params, unet_cfg, text_cfg, vae_cfg)

    @classmethod
    def from_checkpoint(cls, path: str):
        """Load `sd_xl_refiner_1.0.safetensors` (or a torch .ckpt of the
        same sgm layout) through io/torch_convert."""
        from instancediffusion_tpu.io import torch_convert as tc

        sd = tc.load_torch_checkpoint(path)
        parts = tc.split_refiner_ckpt(sd)
        unet_cfg = RefinerUNetConfig()
        text_cfg = OpenCLIPTextConfig()
        vae_cfg = VAEConfig(scale_factor=0.13025)
        params = RefinerParams(
            unet=jax.tree_util.tree_map(
                jnp.asarray, tc.convert_refiner_unet(parts["unet"], unet_cfg)
            ),
            vae=jax.tree_util.tree_map(
                jnp.asarray, tc.convert_vae(parts["vae"], vae_cfg)
            ),
            text=jax.tree_util.tree_map(
                jnp.asarray, tc.convert_openclip_text(parts["text"], text_cfg)
            ),
        )
        return cls(params, unet_cfg, text_cfg, vae_cfg)

    # -- conditioning -------------------------------------------------------

    def _encode(self, prompts: list[str]):
        if getattr(self.tokenizer, "is_fallback", False):
            self.tokenizer.require_real("refiner prompt encoding")
        ids = jnp.asarray(
            np.stack([self.tokenizer.encode(p) for p in prompts])
        )
        out = self._encode_jit(self.params.text, ids)
        return out["penultimate_hidden_state"], out["projected_pooled"]

    # -- sampling -----------------------------------------------------------

    def _sample_fn(self, steps: int, keep: int, gs: float):
        key = (steps, keep, gs)
        if key in self._fns:
            return self._fns[key]

        cfg, vcfg = self.cfg, self.vae_cfg

        @functools.partial(jax.jit, donate_argnums=())
        def run(uparams, vparams, sched, images, ctx, y, noise):
            z = vae.vae_encode_mode(vparams, vcfg, images.astype(jnp.bfloat16))
            a0 = sched.a_t[0]
            x = (
                jnp.sqrt(a0) * z.astype(jnp.float32)
                + jnp.sqrt(1.0 - a0) * noise
            )

            def model_fn(xt, t, gate):
                del gate
                b = xt.shape[0]
                x2 = jnp.concatenate([xt, xt]).astype(jnp.bfloat16)
                t2 = jnp.concatenate([t, t])
                eps = apply_refiner_unet(uparams, cfg, x2, t2, ctx, y)
                e_u, e_c = eps[:b], eps[b:]
                return e_u + gs * (e_c - e_u)

            x0 = ddim_sample(model_fn, sched, x)
            img = vae.vae_decode(vparams, vcfg, x0.astype(jnp.bfloat16))
            return jnp.clip(img.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

        self._fns[key] = run
        return run

    def refine(
        self,
        images: np.ndarray,          # (B, H, W, 3) float in [0, 1]
        prompt: str,
        negative_prompt: str = "",
        strength: float = 0.35,
        steps: int = 20,
        guidance_scale: float = 5.0,
        aesthetic_score: float = 6.0,
        negative_aesthetic_score: float = 2.5,
        seed: int = 0,
    ) -> np.ndarray:
        """Reference cascade defaults: strength=cascade_strength, 20 steps
        (inference.py:118)."""
        b, h, w, _ = images.shape
        keep = max(1, min(int(steps * strength), steps))
        sched = _slice_schedule(
            make_ddim_schedule(self.diffusion, steps), keep
        )

        ctx_c, pool_c = self._encode([prompt] * b)
        ctx_u, pool_u = self._encode([negative_prompt] * b)
        ctx = jnp.concatenate([ctx_u, ctx_c]).astype(jnp.bfloat16)
        y = jnp.concatenate([
            refiner_adm_vector(pool_u, (h, w), (0, 0),
                               negative_aesthetic_score),
            refiner_adm_vector(pool_c, (h, w), (0, 0), aesthetic_score),
        ]).astype(jnp.bfloat16)

        x_img = jnp.asarray(images, jnp.float32) * 2.0 - 1.0
        noise = jax.random.normal(
            jax.random.PRNGKey(seed), (b, h // 8, w // 8, 4), jnp.float32
        )
        run = self._sample_fn(steps, keep, float(guidance_scale))
        out = run(self.params.unet, self.params.vae, sched, x_img, ctx, y, noise)
        return np.asarray(out)
