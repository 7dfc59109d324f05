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
from instancediffusion_tpu.samplers import ddim as ddim_mod
from instancediffusion_tpu.samplers import dpm as dpm_mod
from instancediffusion_tpu.samplers import mis as mis_mod
from instancediffusion_tpu.samplers.plms import (
    gate_runs, make_plms_schedule, plms_sample,
)


_CACHE_SET = False


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the 50-step sampler graph takes
    minutes to compile; cache hits make process restarts near-instant."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    _CACHE_SET = True
    import os

    cache_dir = os.environ.get(
        "IDTPU_COMPILE_CACHE", os.path.expanduser("~/.cache/idtpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


@dataclass
class PipelineParams:
    unet: Any
    vae: Any
    clip: Any


class PendingImages:
    """Handle returned by generate(..., block=False): the whole sampling
    program is already ENQUEUED on the device (JAX dispatch is async), and
    nothing in generate() blocked on a device read — so the caller can
    prepare + dispatch the NEXT batch while this one computes
    (double-buffering; the r4 itemization measured 295 ms image fetch +
    63 ms encode/prep sitting serially after each 9.1 s program — all of it
    hides behind the next batch's device time)."""

    def __init__(self, device_images, timings: dict):
        self.device_images = device_images
        self.timings = timings

    def fetch(self) -> np.ndarray:
        """Block until the program finishes and return uint8 numpy images."""
        import time as _time

        t0 = _time.perf_counter()
        out = np.asarray(self.device_images)
        self.timings["fetch"] = _time.perf_counter() - t0
        return out


def cast_pipeline_params(params: "PipelineParams", dtype) -> "PipelineParams":
    """bf16 inference weights: halves HBM footprint + weight-load bandwidth
    (the reference's fp16-AMP analogue; norm math still runs fp32)."""
    cast = lambda t: jax.tree_util.tree_map(lambda a: a.astype(dtype), t)
    return PipelineParams(
        unet=cast(params.unet), vae=cast(params.vae), clip=cast(params.clip)
    )


class InstanceDiffusionPipeline:
    def __init__(self, cfg: Config, params: PipelineParams, tokenizer=None):
        self.cfg = cfg
        self.params = params
        # per-phase host wall seconds of the last generate()/generate_batch()
        # (serving diagnostics + PERF.md attribution); {} until the first call
        self.last_timings: dict = {}
        if tokenizer is None:
            from instancediffusion_tpu.data.tokenizer import CLIPTokenizer

            tokenizer = CLIPTokenizer.load_default()
        self.tokenizer = tokenizer
        _enable_compilation_cache()
        self.diffusion = make_diffusion_schedule(
            cfg.diffusion.beta_schedule, cfg.diffusion.timesteps,
            cfg.diffusion.linear_start, cfg.diffusion.linear_end,
        )
        self._encode_text_jit = jax.jit(
            lambda clip_params, ids: clip_text.apply_clip_text(
                clip_params, cfg.text_encoder, ids
            )
        )

    # -- constructors --------------------------------------------------------

    @classmethod
    def random_init(
        cls, cfg: Config, seed: int = 0, param_dtype=jnp.bfloat16
    ) -> "InstanceDiffusionPipeline":
        k = jax.random.PRNGKey(seed)
        ku, kv, kc = jax.random.split(k, 3)
        # jit the init: eager per-op dispatch is pathologically slow over a
        # remote-device tunnel (thousands of tiny RNG ops)
        params = PipelineParams(
            unet=jax.jit(lambda k: unet.init_unet(k, cfg.model))(ku),
            vae=jax.jit(lambda k: vae.init_vae(k, cfg.autoencoder))(kv),
            clip=jax.jit(lambda k: clip_text.init_clip_text(k, cfg.text_encoder))(kc),
        )
        if param_dtype is not None:
            params = cast_pipeline_params(params, param_dtype)
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

    def load_lora(self, path: str, scale: float = 1.0,
                  include_text_encoder: bool = True) -> dict:
        """Merge a community SD1.5 LoRA (kohya / diffusers-PEFT formats)
        into the frozen backbone weights (io/lora.py). Merged at load time
        — zero serving overhead, composes with instance conditioning.
        Returns merge stats; raises on base-model shape mismatch."""
        from instancediffusion_tpu.io import lora as lora_io

        sd = lora_io.load_lora_file(path)
        stats = lora_io.merge_lora(
            self.params.unet, sd, scale=scale,
            clip_params=self.params.clip if include_text_encoder else None,
        )
        # params were mutated in place: drop mesh-replicated copies keyed
        # by object identity so generate_batch(mesh=...) re-replicates
        self._replicated_params = None
        return stats

    # -- text ---------------------------------------------------------------

    _warned_fallback = False

    def _check_tokenizer(self):
        if getattr(self.tokenizer, "is_fallback", False):
            # refuses unless IDTPU_ALLOW_HASH_TOKENIZER=1 (VERDICT r3 #4:
            # real generations must never silently use meaningless ids)
            self.tokenizer.require_real("prompt encoding")
            if not self._warned_fallback:
                type(self)._warned_fallback = True
                import warnings

                warnings.warn(
                    "tokenizer is the deterministic hash fallback "
                    "(IDTPU_ALLOW_HASH_TOKENIZER=1): token ids are "
                    "semantically meaningless; compute cost is identical.",
                    stacklevel=3,
                )

    def encode_prompt(self, prompts: list[str]) -> jnp.ndarray:
        self._check_tokenizer()
        ids = np.stack([self.tokenizer.encode(p) for p in prompts])
        return self._encode_text_jit(self.params.clip, jnp.asarray(ids))[
            "last_hidden_state"
        ]

    def encode_phrases(self, phrases: list[str]) -> list[np.ndarray]:
        ids = np.stack([self.tokenizer.encode(p) for p in phrases])
        pooled = self._encode_text_jit(self.params.clip, jnp.asarray(ids))[
            "pooler_output"
        ]
        return [np.asarray(pooled[i]) for i in range(len(phrases))]

    @staticmethod
    def _to_device_grounding(g_np: dict, batch: int) -> dict:
        """Host grounding -> device, skipping the transfer for all-zero
        tensors (the 512x512x max_objs segs array is ~125MB/batch over a
        remote-device link; zeros are created on-device instead)."""
        out = {}
        for k, v in g_np.items():
            if v.size > 1_000_000 and not np.any(v):
                out[k] = jnp.zeros(v.shape, v.dtype)
            else:
                out[k] = jnp.asarray(v)
        return out

    # -- sampling ------------------------------------------------------------
    #
    # Everything large (params, conditioning, schedule) is a jit ARGUMENT —
    # closure-captured arrays would be inlined as XLA constants, blowing the
    # program size (the axon remote-compile tunnel rejects GB-scale bodies).
    # Jitted sample fns are cached per static signature.

    def _make_sample_fn(self, gs: float, num_traj: int, mis_step: int,
                        static_gates: tuple | None = None,
                        tp_mesh=None,
                        compute_dtype=jnp.bfloat16,
                        sampler: str = "plms",
                        img2img_start: int | None = None):
        cfg = self.cfg
        gcfg = cfg.model.grounding_tokenizer
        drops = unifusion.ModalityDrops.test_defaults(gcfg)

        # tensor-parallel serving (parallel/tp.py): heads/FF columns shard
        # over tp_mesh's 'model' axis inside the sampling scan; the GEGLU
        # column interleave is applied once per conditioning, outside the
        # scan. None = plain single-program forward.
        if tp_mesh is not None:
            from instancediffusion_tpu.parallel import tp as tp_mod
            tp_size = tp_mesh.shape.get("model", 1)

        def unet_fwd(unet_params, x, t, ctx, objs, gate, labels):
            if tp_mesh is None:
                return unet.apply_unet(
                    unet_params, cfg.model, x, t, ctx, None, gate_scale=gate,
                    precomputed_objs=objs, fuser_mask=labels,
                )
            return tp_mod.tp_apply_unet(
                tp_mesh, cfg.model, unet_params, x, t, ctx, objs,
                gate_scale=gate, fuser_mask=labels, pre_shuffled=True,
            )

        # instance attention masking (reference use_masked_att; the mask is
        # built from box rasters, utils/input.py:34-37 + attention.py:187-255)
        # — only meaningful when boxes/masks aren't dropped by the preset
        masking = (
            cfg.model.use_masked_att
            and not (gcfg.test_drop_boxes and gcfg.test_drop_masks)
        )

        def build_labels(grounding):
            from instancediffusion_tpu.kernels.flash_attention import (
                instance_labels,
            )
            from instancediffusion_tpu.ops.instance_mask import rasterize_boxes

            rasters = rasterize_boxes(grounding["boxes"], cfg.model.image_size)
            rasters = rasters * grounding["masks"][..., None, None]
            return instance_labels(
                rasters, cfg.model.max_objs, gcfg.num_seg_tokens
            )

        def make_cfg_fn(unet_params, context, uc, grounding, null_g):
            """CFG as one batched 2x forward over precomputed grounding
            tokens — UniFusion (incl. the ConvNeXt seg encoder) runs ONCE
            per sampling run, not per scan step: grounding tokens are
            timestep-invariant (vs openaimodel.py:494 recomputing them in
            every forward). Instance-mask labels are likewise precomputed."""
            objs_c, _ = unifusion.apply_unifusion(
                unet_params["position_net"], gcfg, grounding, drops
            )
            if tp_mesh is not None:
                unet_params = tp_mod.shuffle_ffn_params(unet_params, tp_size)
            if uc is None or gs == 1:
                ctx = context
                labels = build_labels(grounding) if masking else None

                def model_fn(x, t, gate):
                    return unet_fwd(
                        unet_params, x.astype(compute_dtype), t, ctx, objs_c,
                        gate, labels,
                    )

                return model_fn

            objs_u, _ = unifusion.apply_unifusion(
                unet_params["position_net"], gcfg, null_g, drops
            )
            objs2 = jnp.concatenate([objs_c, objs_u], axis=0)
            ctx2 = jnp.concatenate([context, uc], axis=0)
            if masking:
                g2 = {
                    "boxes": jnp.concatenate(
                        [grounding["boxes"], null_g["boxes"]], axis=0
                    ),
                    "masks": jnp.concatenate(
                        [grounding["masks"], null_g["masks"]], axis=0
                    ),
                }
                labels2 = build_labels(g2)  # null half -> open (unmasked)
            else:
                labels2 = None

            def model_fn(x, t, gate):
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                eps2 = unet_fwd(
                    unet_params, x2.astype(compute_dtype), t2, ctx2, objs2,
                    gate, labels2,
                )
                e_cond, e_uncond = jnp.split(eps2, 2, axis=0)
                return e_uncond + gs * (e_cond - e_uncond)

            return model_fn

        def sample_fn(unet_params, vae_params, sched, cond, x_init):
            # In-graph conditioning expansion (r4 itemization: every eager
            # device op over the remote link costs a round trip; ~1s/batch
            # of the measured wall was host/link glue). generate() passes
            # COMPACT conditioning — (1, ...) text rows and batch-1
            # grounding (all images share one meta) — broadcast to the
            # batch here, inside the one compiled program. generate_batch
            # passes full-size (b, ...) arrays, which pass through. The
            # CFG null grounding is all-zeros with static shapes: built
            # in-graph (XLA broadcasts a scalar 0 — the eager 251MB segs
            # zeros buffer per call is gone).
            b = x_init.shape[0]

            def expand(a, n=b):
                a = a.astype(compute_dtype)
                if a.shape[0] == 1 and n != 1:
                    return jnp.broadcast_to(a, (n,) + a.shape[1:])
                return a

            def expand_g(g, n=b):
                return {
                    k: (
                        jnp.broadcast_to(v, (n,) + v.shape[1:])
                        if v.shape[0] == 1 and n != 1 else v
                    )
                    for k, v in g.items()
                }

            def inject(g, idx):
                # scatter the device-resident pooled phrase rows into the
                # grounding's positive_embeddings by slot index (-1 = none).
                # The host built the grounding with DEFER_EMBEDDING markers
                # (text_masks set, embedding zero), so the whole conditioning
                # path runs without a single host<-device read — the
                # prerequisite for enqueueing batch N+1 while N computes.
                pooled = cond["pooled"].astype(g["positive_embeddings"].dtype)
                safe = jnp.clip(idx, 0, pooled.shape[0] - 1)
                emb = jnp.where((idx >= 0)[..., None], pooled[safe], 0.0)
                g = dict(g)
                g["positive_embeddings"] = emb
                return g

            context = expand(cond["context"])
            uc = expand(cond["uc"]) if cond.get("uc") is not None else None
            g0 = cond["grounding"]
            if "pooled" in cond:
                g0 = inject(g0, cond["emb_idx"])
            grounding = expand_g(g0)
            null_g = unifusion.null_grounding(b, cfg.model.max_objs, gcfg)
            global_fn = make_cfg_fn(unet_params, context, uc, grounding,
                                    null_g)
            if img2img_start is not None:
                # x_init is the INPUT IMAGE (B,H,W,3) in [-1,1]: encode,
                # forward-noise to the start step's DDIM alpha, resume the
                # PLMS schedule mid-way (the diffusers img2img recipe; the
                # refiner family does the same via schedule slicing,
                # pipeline_refiner._slice_schedule)
                enc_rng, noise_rng = cond["i2i_rng"]
                z0 = vae.vae_encode(
                    vae_params, cfg.autoencoder,
                    x_init.astype(compute_dtype), enc_rng,
                ).astype(jnp.float32)
                a0 = sched.a_t[img2img_start]
                x = (jnp.sqrt(a0) * z0
                     + jnp.sqrt(1.0 - a0)
                     * jax.random.normal(noise_rng, z0.shape, jnp.float32))
                from instancediffusion_tpu.samplers.plms import plms_steps

                z, _, _ = plms_steps(
                    global_fn, sched, x, img2img_start, sched.num_steps,
                    static_gates=static_gates,
                )
            elif num_traj > 1 and mis_step > 0:
                # trajectory-major stacks: rows [j*b, (j+1)*b) hold
                # trajectory j. generate() passes compact per-trajectory
                # rows (ctx_rows (num_traj,77,D), g_rows (num_traj,...)),
                # repeated to the batch in-graph; generate_batch passes
                # full (num_traj*b, ...) stacks.
                if "ctx_rows" in cond:
                    ctx_stack = jnp.repeat(
                        cond["ctx_rows"].astype(compute_dtype), b, axis=0
                    )
                    g_rows = cond["g_rows"]
                    if "pooled" in cond:
                        g_rows = inject(g_rows, cond["emb_idx_rows"])
                    g_stack = jax.tree_util.tree_map(
                        lambda a: jnp.repeat(a, b, axis=0), g_rows
                    )
                else:
                    ctx_stack = expand(cond["ctx_stack"], num_traj * b)
                    g_stack = expand_g(cond["g_stack"], num_traj * b)
                uc_stack = jnp.tile(uc, (num_traj, 1, 1))
                null_stack = unifusion.null_grounding(
                    num_traj * b, cfg.model.max_objs, gcfg
                )
                traj_fn = make_cfg_fn(
                    unet_params, ctx_stack, uc_stack, g_stack, null_stack
                )
                z = mis_mod.mis_sample(
                    traj_fn, global_fn, sched, x_init, num_traj,
                    mis_step=mis_step,
                    traj_weights=cond.get("traj_weights"),
                    static_gates=static_gates,
                )
            elif sampler == "dpm":
                # DPM-Solver++(2M) serving fast path (samplers/dpm.py):
                # same UNet/CFG/gate semantics, ~2.5x fewer steps for
                # comparable quality — NOT the reference eval protocol
                z = dpm_mod.dpm_sample(global_fn, sched, x_init,
                                       static_gates=static_gates)
            elif sampler == "ddim":
                z = ddim_mod.ddim_sample(global_fn, sched, x_init)
            else:
                z = plms_sample(global_fn, sched, x_init,
                                static_gates=static_gates)
            # decode in compute_dtype (bf16 by default, like every other
            # matmul in the pipeline; fp32-range so no fp16-style VAE
            # overflow, and the output is about to be quantized to 8 bits
            # anyway — pass compute_dtype=jnp.float32 for exact reference
            # decode numerics). Measured: fp32 decode was 246 ms per 8
            # images on v5e (docs/traces/r3_gen), the only fp32 matmul
            # family left in the generate path.
            img = vae.vae_decode(
                vae_params, cfg.autoencoder, z.astype(compute_dtype)
            )
            # quantize ON DEVICE: [-1,1] -> uint8 in fp32 math, floor to
            # match the reference's numpy-astype truncation
            # (inference.py:174-176). Only ~6MB of uint8 crosses the
            # remote link per 8 images instead of ~25MB fp32 + five host
            # numpy passes.
            img = jnp.clip(img.astype(jnp.float32), -1.0, 1.0) * 0.5 + 0.5
            return jnp.floor(img * 255.0).astype(jnp.uint8)

        return jax.jit(sample_fn)

    _sample_cache: dict = None

    def _make_schedule(self, sampler: str, steps: int, alpha_type):
        if sampler == "dpm":
            return dpm_mod.make_dpm_schedule(self.diffusion, steps, alpha_type)
        if sampler == "ddim":
            return ddim_mod.make_ddim_schedule(self.diffusion, steps, alpha_type)
        if sampler == "plms":
            return make_plms_schedule(self.diffusion, steps, alpha_type)
        raise ValueError(
            f"unknown sampler {sampler!r} — expected 'plms' (reference "
            "protocol), 'dpm' (DPM-Solver++(2M) fast serving), or 'ddim'"
        )

    _aot = None

    def enable_aot(self, directory: str, save: bool = True) -> None:
        """Opt into the jax.export AOT program cache (aot.py): sample
        programs load from / save to `directory` as StableHLO blobs, so a
        process restart skips re-tracing and backend-compiles a pre-lowered
        module (~7 min restart-to-first-image vs ~10-12; docs/PERF.md r5
        cold-start section). Call before the first generate()."""
        from instancediffusion_tpu.aot import AOTProgramCache

        self._aot = AOTProgramCache(directory, save=save)
        self._sample_cache = {}  # re-wrap variants built before opt-in

    def _get_sample_fn(self, key):
        if self._sample_cache is None:
            self._sample_cache = {}
        if key not in self._sample_cache:
            fn = self._make_sample_fn(*key)
            # AOT covers single-device programs; key[4] is tp_mesh — sharded
            # blobs would pin a device topology (see aot.py docstring)
            if self._aot is not None and key[4] is None:
                fn = self._aot.wrap(key, fn)
            self._sample_cache[key] = fn
        return self._sample_cache[key]

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
        sampler: str | None = None,
        block: bool = True,
        initial_latents: np.ndarray | None = None,
    ) -> np.ndarray | PendingImages:
        """meta: demo dict with prompt/phrases/locations[/points/scribbles/
        polygons/segs]. Returns (num_images, 512, 512, 3) uint8.

        sampler: 'plms' (default — the reference protocol), 'dpm'
        (DPM-Solver++(2M): ~2.5x fewer steps for comparable quality; pass
        steps=20), or 'ddim'. MIS is a PLMS construction
        (plms_instance.py) — non-plms samplers require mis == 0.

        block=False returns a PendingImages handle instead of fetching:
        the program is enqueued (generate() never reads device memory —
        pooled phrase embeddings are scattered into the grounding INSIDE
        the jitted program), so callers can dispatch batch N+1 while N
        computes and hide all host prep + image fetch behind device time."""
        import time as _time

        scfg = self.cfg.sampler
        num_images = num_images or scfg.num_images
        steps = steps or scfg.steps
        gs = scfg.guidance_scale if guidance_scale is None else guidance_scale
        alpha = scfg.alpha if alpha is None else alpha
        seed = scfg.seed if seed is None else seed
        neg = scfg.negative_prompt if negative_prompt is None else negative_prompt
        sampler = scfg.sampler if sampler is None else sampler
        if mis is None:
            # config-default MIS only applies where it can run: an explicit
            # non-PLMS sampler choice beats the config's mis fraction
            mis = scfg.mis if sampler == "plms" else 0.0
        elif sampler != "plms" and mis > 0:
            raise ValueError(
                f"sampler={sampler!r} does not support MIS (a PLMS "
                "trajectory construction) — pass mis=0.0"
            )
        mcfg = self.cfg.model
        alpha_type = meta.get("alpha_type", [alpha, 0.0, 1 - alpha])

        timings: dict = {}
        t0 = _time.perf_counter()
        sched = self._make_schedule(sampler, steps, alpha_type)
        timings["schedule_host"] = _time.perf_counter() - t0

        # text conditioning — ONE batched encode dispatch for prompt +
        # negative + phrases. MIS per-instance prompts ARE the phrases
        # (prepare_instance_meta sets prompt=phrases[i], utils/input.py:
        # 130-144), so their context rows are reused instead of re-encoded.
        # The pooled phrase embeddings NEVER come back to host: they stay
        # device-side in cond["pooled"] and sample_fn scatters them into
        # positive_embeddings in-graph, so nothing below blocks on the
        # device and block=False callers get true async dispatch.
        t0 = _time.perf_counter()
        k = len(meta["phrases"])
        mis_step = int(steps * mis) if (mis > 0 and k > 0) else 0
        want_mis = mis_step > 0
        num_traj = 1 + k if want_mis else 1
        texts = [meta["prompt"], neg] + list(meta["phrases"])
        self._check_tokenizer()
        ids = np.stack([self.tokenizer.encode(t) for t in texts])
        enc = self._encode_text_jit(self.params.clip, jnp.asarray(ids))
        last = enc["last_hidden_state"]
        # context/uc stay on device as (1, 77, D) rows — sample_fn
        # broadcasts to the batch in-graph
        context, uc = last[0:1], last[1:2]
        timings["text_encode"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        # batch-1 grounding: all images share the meta, so transfer one row
        # and broadcast on device (the old batch=8 transfer moved ~1MB of
        # mostly-zero polygons/embeddings per call at ~17MB/s link speed)
        from instancediffusion_tpu.data.grounding_input import DEFER_EMBEDDING

        g_np = prepare_grounding(
            meta, [DEFER_EMBEDDING] * k, batch=1, max_objs=mcfg.max_objs,
            in_dim=mcfg.grounding_tokenizer.in_dim,
        )
        grounding = self._to_device_grounding(g_np, 1)
        cond = {
            "context": context,
            "uc": uc,
            "grounding": grounding,
        }
        if k:
            n_slots = min(len(meta["locations"]), k, mcfg.max_objs)
            emb_idx = np.full((1, mcfg.max_objs), -1, np.int32)
            emb_idx[0, :n_slots] = np.arange(n_slots)
            cond["pooled"] = enc["pooler_output"][2:2 + k]
            cond["emb_idx"] = jnp.asarray(emb_idx)
        timings["grounding_prep"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        if initial_latents is not None:
            # caller-provided starting noise (NHWC) — reproducibility hooks
            # and cross-framework parity runs (the reference's
            # starting_noise arg, inference.py:38,76)
            x_init = jnp.asarray(initial_latents).astype(compute_dtype)
            if x_init.shape != (num_images, mcfg.image_size,
                                mcfg.image_size, mcfg.in_channels):
                raise ValueError(
                    f"initial_latents shape {x_init.shape} != "
                    f"({num_images}, {mcfg.image_size}, {mcfg.image_size}, "
                    f"{mcfg.in_channels})"
                )
        else:
            rng = jax.random.PRNGKey(seed)
            x_init = jax.random.normal(
                rng,
                (num_images, mcfg.image_size, mcfg.image_size, mcfg.in_channels),
            ).astype(compute_dtype)
        timings["x_init"] = _time.perf_counter() - t0

        if want_mis:
            # compact per-trajectory rows (batch=1 each), stacked on HOST
            # and transferred once; sample_fn injects embeddings and repeats
            # to the batch in-graph (trajectory-major). Trajectory j+1 is
            # instance j alone (inference.py:83-88): its context row is the
            # phrase row and its grounding has the instance in slot 0.
            t0 = _time.perf_counter()
            rows = [g_np]
            idx_rows = [emb_idx]
            for i in range(k):
                im = prepare_instance_meta(meta, i)
                rows.append(
                    prepare_grounding(
                        im, [DEFER_EMBEDDING], batch=1,
                        max_objs=mcfg.max_objs,
                        in_dim=mcfg.grounding_tokenizer.in_dim,
                    )
                )
                row_idx = np.full((1, mcfg.max_objs), -1, np.int32)
                row_idx[0, 0] = i
                idx_rows.append(row_idx)
            stack_np = {
                key: np.concatenate([r[key] for r in rows], axis=0)
                for key in rows[0]
            }
            cond["g_rows"] = self._to_device_grounding(stack_np, num_traj)
            cond["emb_idx_rows"] = jnp.asarray(
                np.concatenate(idx_rows, axis=0)
            )
            cond["ctx_rows"] = jnp.concatenate(
                [last[0:1], last[2:2 + k]], axis=0
            )
            timings["mis_prep"] = _time.perf_counter() - t0

        static_gates = None if sampler == "ddim" else gate_runs(sched.gates)
        key = (gs, num_traj, mis_step, static_gates, None, compute_dtype,
               sampler)
        # jax.jit traces+compiles lazily at the first CALL: when this static
        # signature is new, the dispatch below includes minutes of XLA — so
        # it is attributed to 'trace_compile', never to 'sample_dispatch'
        # (warm numbers stay meaningful for itemization/serving diagnostics)
        cold = self._sample_cache is None or key not in self._sample_cache
        sample_fn = self._get_sample_fn(key)
        t0 = _time.perf_counter()
        images = sample_fn(
            self.params.unet, self.params.vae, sched, cond, x_init
        )
        timings["trace_compile" if cold else "sample_dispatch"] = (
            _time.perf_counter() - t0
        )
        # per-phase host wall seconds of the last generate() — serving
        # diagnostics + the PERF.md overhead attribution (VERDICT r3 #2)
        self.last_timings = timings
        if not block:
            return PendingImages(images, timings)
        t0 = _time.perf_counter()
        images.block_until_ready()
        timings["sample_device"] = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        out = np.asarray(images)  # uint8, quantized on device
        timings["fetch"] = _time.perf_counter() - t0
        return out

    def img2img(
        self,
        image: np.ndarray,
        meta: dict,
        strength: float = 0.5,
        num_images: int | None = None,
        steps: int | None = None,
        guidance_scale: float | None = None,
        alpha: float | None = None,
        seed: int | None = None,
        negative_prompt: str | None = None,
        compute_dtype=jnp.bfloat16,
    ) -> np.ndarray:
        """Instance-conditioned image editing: noise the input image to
        `strength` of the schedule and denoise the rest under the meta's
        prompt + per-instance conditioning. PLMS only (the reference's
        sampler); everything (VAE encode, q_sample, resumed PLMS scan,
        decode) runs in one jitted program.

        image: (H,W,3) or (B,H,W,3) uint8 (or float in [-1,1]) at the
        model resolution. Returns (num_images, H, W, 3) uint8."""
        scfg = self.cfg.sampler
        num_images = num_images or scfg.num_images
        steps = steps or scfg.steps
        gs = scfg.guidance_scale if guidance_scale is None else guidance_scale
        alpha = scfg.alpha if alpha is None else alpha
        seed = scfg.seed if seed is None else seed
        neg = scfg.negative_prompt if negative_prompt is None else negative_prompt
        if not 0.0 < strength <= 1.0:
            raise ValueError(f"strength must be in (0, 1], got {strength}")
        keep = max(1, min(int(steps * strength), steps))
        start = steps - keep
        mcfg = self.cfg.model
        alpha_type = meta.get("alpha_type", [alpha, 0.0, 1 - alpha])
        sched = make_plms_schedule(self.diffusion, steps, alpha_type)

        img = np.asarray(image)
        if img.ndim == 3:
            img = img[None]
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 127.5 - 1.0
        expect_hw = mcfg.image_size * (
            2 ** (len(self.cfg.autoencoder.ch_mult) - 1)
        )
        if img.shape[1:3] != (expect_hw, expect_hw):
            raise ValueError(
                f"image must be {expect_hw}x{expect_hw} at this config, "
                f"got {img.shape[1:3]}"
            )
        if img.shape[0] == 1 and num_images > 1:
            img = np.repeat(img, num_images, axis=0)
        if img.shape[0] != num_images:
            raise ValueError(f"got {img.shape[0]} images for num_images="
                             f"{num_images}")

        context = self.encode_prompt([meta["prompt"]] * num_images)
        uc = self.encode_prompt([neg] * num_images)
        phrase_emb = self.encode_phrases(meta["phrases"])
        g_np = prepare_grounding(
            meta, phrase_emb, batch=num_images, max_objs=mcfg.max_objs,
            in_dim=mcfg.grounding_tokenizer.in_dim,
        )
        cond = {
            "context": context,
            "uc": uc,
            "grounding": self._to_device_grounding(g_np, num_images),
            "i2i_rng": jax.random.split(jax.random.PRNGKey(seed), 2),
        }
        sample_fn = self._get_sample_fn(
            (gs, 1, 0, gate_runs(sched.gates), None, compute_dtype,
             "plms", start)
        )
        images = sample_fn(
            self.params.unet, self.params.vae, sched, cond,
            jnp.asarray(img),
        )
        return np.asarray(images)

    # -- batched eval sampling -------------------------------------------------

    _replicated_params = None

    def generate_batch(
        self,
        metas: list[dict],
        steps: int | None = None,
        guidance_scale: float | None = None,
        alpha: float | None = None,
        seeds: list[int] | None = None,
        negative_prompt: str | None = None,
        mesh=None,
        mis: float | None = None,
        compute_dtype=jnp.bfloat16,
        sampler: str | None = None,
    ) -> np.ndarray:
        """ONE image per meta, all metas stacked on the batch axis of a
        single sampling program — the grounding tensors are fixed-shape
        (max_objs-padded), so heterogeneous metas batch structurally.

        With `mesh` (a jax.sharding.Mesh), the batch shards over the 'data'
        axis and params replicate: this is the BASELINE-mandated replacement
        for the reference's --num_jobs process splitting
        (eval_local.py:173-177). len(metas) should be a multiple of the
        mesh's data size; it is padded (and trimmed after) otherwise.

        mis > 0 (the test_mask protocol, eval_local.py:79): every image is
        padded to a STATIC trajectory count (1 + max k_i over the batch,
        rounded up to a multiple of 4 to bound compile variants, capped at
        max_objs); padding trajectories denoise under null conditioning and
        are excluded from the merge mean via a weight vector, so images
        with different instance counts still share one compiled program.
        Returns (len(metas), 512, 512, 3) uint8."""
        scfg = self.cfg.sampler
        steps = steps or scfg.steps
        gs = scfg.guidance_scale if guidance_scale is None else guidance_scale
        alpha = scfg.alpha if alpha is None else alpha
        neg = scfg.negative_prompt if negative_prompt is None else negative_prompt
        sampler = scfg.sampler if sampler is None else sampler
        if mis is None:
            # explicit non-PLMS sampler choice beats the config-default mis
            mis = scfg.mis if sampler == "plms" else 0.0
        if sampler != "plms" and mis > 0:
            raise ValueError(
                f"sampler={sampler!r} does not support MIS (a PLMS "
                "trajectory construction) — pass mis=0.0"
            )
        mcfg = self.cfg.model
        n_meta = len(metas)
        if n_meta == 0:
            raise ValueError("generate_batch needs at least one meta")
        if seeds is None:
            seeds = list(range(n_meta))

        pad_to = 1
        if mesh is not None:
            pad_to = mesh.shape.get("data", 1)
        b = (n_meta + pad_to - 1) // pad_to * pad_to
        metas = metas + [metas[-1]] * (b - n_meta)
        seeds = list(seeds) + [seeds[-1]] * (b - n_meta)

        sched = self._make_schedule(
            sampler, steps, [alpha, 0.0, 1.0 - alpha]
        )

        # MIS trajectory-count padding is decided up front so the single
        # batched text encode below can include the per-instance prompts
        num_traj, mis_step = 1, 0
        if mis > 0 and max(len(m["phrases"]) for m in metas) > 0:
            k_pad = min(
                mcfg.max_objs,
                -(-max(len(m["phrases"]) for m in metas) // 4) * 4,
            )
            num_traj = 1 + k_pad
            mis_step = int(steps * mis)

        # ONE batched text-encode dispatch for every prompt / the negative /
        # all phrases (MIS instance prompts reuse the phrase rows; the old
        # path cost 2 + len(metas) [+ num_traj] round trips over the link)
        import time as _time

        timings: dict = {}
        t0 = _time.perf_counter()
        self._check_tokenizer()
        texts = [m["prompt"] for m in metas] + [neg]
        phrase_off = []
        for m in metas:
            phrase_off.append(len(texts))
            texts += list(m["phrases"])
        inst_metas = {}
        if num_traj > 1 and mis_step > 0:
            for i, m in enumerate(metas):
                for j in range(len(m["phrases"])):
                    im = prepare_instance_meta(m, j)
                    # the instance prompt IS the phrase (prepare_instance_meta
                    # sets prompt=phrases[j]) — reuse its encode row instead
                    # of appending a duplicate text
                    inst_metas[(i, j)] = (phrase_off[i] + j, im)
        ids = np.stack([self.tokenizer.encode(t) for t in texts])
        enc = self._encode_text_jit(self.params.clip, jnp.asarray(ids))
        last = enc["last_hidden_state"]
        pooled_np = np.asarray(enc["pooler_output"])
        context = last[:b]
        uc = jnp.broadcast_to(last[b:b + 1], (b,) + last.shape[1:])
        timings["text_encode"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        g_rows, embs = [], []
        for i, m in enumerate(metas):
            emb = [pooled_np[phrase_off[i] + j]
                   for j in range(len(m["phrases"]))]
            embs.append(emb)
            g_rows.append(
                prepare_grounding(
                    m, emb, batch=1, max_objs=mcfg.max_objs,
                    in_dim=mcfg.grounding_tokenizer.in_dim,
                )
            )
        g_np = {
            k: np.concatenate([g[k] for g in g_rows], axis=0) for k in g_rows[0]
        }
        grounding = self._to_device_grounding(g_np, b)
        cond = {
            "context": context,
            "uc": uc,
            "grounding": grounding,
        }
        # per-meta deterministic noise rows (the reference seeds per image,
        # eval_local.py:56)
        x_init = jnp.concatenate(
            [
                jax.random.normal(
                    jax.random.PRNGKey(s),
                    (1, mcfg.image_size, mcfg.image_size, mcfg.in_channels),
                )
                for s in seeds
            ],
            axis=0,
        ).astype(compute_dtype)

        if num_traj > 1 and mis_step > 0:
            # trajectory-major stacks: rows [j*b, (j+1)*b) hold trajectory j
            # (trajectory 0 = the global conditioning already in `cond`).
            # Context rows come out of the single encode above via ONE
            # device gather; padding trajectories get the negative prompt.
            null_row = {
                k: np.zeros((1,) + v.shape[1:], v.dtype)
                for k, v in g_rows[0].items()
            }
            g_stacks = [grounding]
            idx = list(range(b))  # trajectory 0 = the per-meta prompts
            for j in range(num_traj - 1):
                rows_j = []
                for i, m in enumerate(metas):
                    if j < len(m["phrases"]):
                        ti, im = inst_metas[(i, j)]
                        rows_j.append(
                            prepare_grounding(
                                im, [embs[i][j]], batch=1,
                                max_objs=mcfg.max_objs,
                                in_dim=mcfg.grounding_tokenizer.in_dim,
                            )
                        )
                        idx.append(ti)
                    else:
                        rows_j.append(null_row)
                        idx.append(b)  # the negative-prompt row
                g_np_j = {
                    k: np.concatenate([r[k] for r in rows_j], axis=0)
                    for k in rows_j[0]
                }
                g_stacks.append(self._to_device_grounding(g_np_j, b))
            cond["g_stack"] = mis_mod.stack_groundings(g_stacks)
            cond["ctx_stack"] = last[jnp.asarray(np.asarray(idx))]
            w = np.ones((num_traj, b), np.float32)
            for i, m in enumerate(metas):
                w[1 + len(m["phrases"]):, i] = 0.0
            cond["traj_weights"] = jnp.asarray(w)

        unet_p, vae_p = self.params.unet, self.params.vae
        if mesh is not None:
            from instancediffusion_tpu.parallel.mesh import (
                data_sharding, replicated,
            )

            dsh, repl = data_sharding(mesh), replicated(mesh)
            # cache keyed by the mesh identity AND current param objects:
            # a different mesh or swapped weights must not reuse stale
            # replicated copies (cross-mesh sharding error / old weights)
            cache_key = (id(mesh), id(self.params.unet), id(self.params.vae))
            if (
                self._replicated_params is None
                or self._replicated_params[0] != cache_key
            ):
                self._replicated_params = (
                    cache_key,
                    jax.device_put(unet_p, repl),
                    jax.device_put(vae_p, repl),
                )
            _, unet_p, vae_p = self._replicated_params
            shard = lambda t: jax.tree_util.tree_map(
                lambda a: jax.device_put(a, dsh), t
            )
            # traj_weights is (num_traj, B): its batch axis is axis 1
            tw = cond.pop("traj_weights", None)
            cond = shard(cond)
            if tw is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                cond["traj_weights"] = jax.device_put(
                    tw, NamedSharding(mesh, P(None, "data"))
                )
            x_init = jax.device_put(x_init, dsh)

        tp_mesh = (
            mesh
            if mesh is not None and mesh.shape.get("model", 1) > 1
            else None
        )
        timings["grounding_prep"] = _time.perf_counter() - t0
        static_gates = None if sampler == "ddim" else gate_runs(sched.gates)
        key = (gs, num_traj, mis_step, static_gates, tp_mesh, compute_dtype,
               sampler)
        cold = self._sample_cache is None or key not in self._sample_cache
        sample_fn = self._get_sample_fn(key)
        t0 = _time.perf_counter()
        images = sample_fn(unet_p, vae_p, sched, cond, x_init)
        timings["trace_compile" if cold else "sample_dispatch"] = (
            _time.perf_counter() - t0
        )
        t0 = _time.perf_counter()
        out = np.asarray(images)[:n_meta]  # uint8, quantized on device
        timings["fetch"] = _time.perf_counter() - t0
        self.last_timings = timings
        return out
