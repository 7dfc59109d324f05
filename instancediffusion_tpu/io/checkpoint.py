"""Checkpoint subsystem: ingest reference/SD .pth checkpoints, save/restore
native training state with auto-resume.

Reference semantics (utils/checkpoint.py):
  * read_official_ckpt key-prefix split (:13-34) -> torch_convert.split_official_ckpt
  * inference load prefers EMA weights with fallback (:238-244)
  * auto-resume folders OUTPUT/name/tagXX, newest checkpoint_latest (:45-72)
  * save payload {model, ema, opt, scheduler, iters, config_dict} (:128-142)

Native format: Orbax (async-capable, sharded-restore-ready for multi-host).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import numpy as np

from instancediffusion_tpu.config import Config
from instancediffusion_tpu.io import torch_convert as tc


# ---------------------------------------------------------------------------
# Reference (.pth) ingestion
# ---------------------------------------------------------------------------


def load_pipeline_params(path: str, cfg: Config):
    """Load UNet/VAE/CLIP pytrees from either the official SD1.5 checkpoint
    (flat state_dict) or a reference training checkpoint
    ({model, ema, text_encoder, autoencoder, ...}); EMA preferred for the
    UNet (utils/checkpoint.py:238-244)."""
    from instancediffusion_tpu.pipeline import PipelineParams

    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    first_conv_sd = _maybe_first_conv_sd(cfg)

    if isinstance(raw, dict) and "model" in raw and not _is_flat_sd(raw):
        model_sd = raw.get("ema") or raw["model"]
        unet_p = tc.convert_unet(
            tc.to_numpy_state_dict(model_sd), cfg.model, first_conv_sd
        )
        vae_p = tc.convert_vae(
            tc.to_numpy_state_dict(raw["autoencoder"]), cfg.autoencoder
        )
        clip_p = tc.convert_clip_text(
            tc.to_numpy_state_dict(raw["text_encoder"]), cfg.text_encoder
        )
    else:
        sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
        parts = tc.split_official_ckpt(tc.to_numpy_state_dict(sd))
        unet_p = tc.convert_unet(parts["model"], cfg.model, first_conv_sd)
        vae_p = tc.convert_vae(parts["autoencoder"], cfg.autoencoder)
        clip_p = tc.convert_clip_text(parts["text_encoder"], cfg.text_encoder)

    to_dev = lambda t: jax.tree_util.tree_map(
        lambda a: jax.numpy.asarray(np.asarray(a, np.float32)), t
    )
    return PipelineParams(
        unet=to_dev(unet_p), vae=to_dev(vae_p), clip=to_dev(clip_p)
    )


def _is_flat_sd(d: dict) -> bool:
    return any(k.startswith("model.diffusion_model.") for k in d)


def _maybe_first_conv_sd(cfg: Config):
    """pretrained/SD_v1_5_input_conv_weight_bias.pth, the stock first conv
    swapped in at alpha==0 (openaimodel.py:473-480)."""
    for p in (
        "pretrained/SD_v1_5_input_conv_weight_bias.pth",
        os.path.join(os.path.dirname(__file__), "../../pretrained/SD_v1_5_input_conv_weight_bias.pth"),
    ):
        if os.path.exists(p):
            import torch

            sd = torch.load(p, map_location="cpu", weights_only=False)
            return tc.to_numpy_state_dict(sd)
    return None


# ---------------------------------------------------------------------------
# Native (Orbax) train-state checkpoints with auto-resume
# ---------------------------------------------------------------------------


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def expt_folder_with_auto_resume(output_root: str, name: str):
    """Create OUTPUT/name/tagXX (incrementing per restart) and return
    (folder, path_of_previous_latest_or_None) — utils/checkpoint.py:45-72."""
    base = os.path.join(output_root, name)
    os.makedirs(base, exist_ok=True)
    tags = sorted(
        int(m.group(1))
        for d in os.listdir(base)
        if (m := re.fullmatch(r"tag(\d+)", d))
    )
    prev = None
    if tags:
        cand = os.path.join(base, f"tag{tags[-1]:02d}", "checkpoint_latest")
        if os.path.exists(cand):
            prev = cand
    new_tag = (tags[-1] + 1) if tags else 0
    folder = os.path.join(base, f"tag{new_tag:02d}")
    os.makedirs(folder, exist_ok=True)
    return folder, prev


def save_train_ckpt(folder: str, state, config_dict: dict | None, latest=True,
                    iter_idx: int | None = None):
    """Save the full train state INCLUDING the frozen VAE/CLIP params — the
    reference embeds text_encoder/autoencoder (+config) in every checkpoint
    (utils/checkpoint.py:128-142) so a resumed run never depends on
    re-passing the official SD ckpt."""
    ckptr = _checkpointer()
    name = "checkpoint_latest" if latest else f"checkpoint_{iter_idx:08d}"
    path = os.path.abspath(os.path.join(folder, name))
    payload = {
        "step": state.step,
        "unet_params": state.unet_params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
    }
    if state.vae_params is not None:
        payload["vae_params"] = state.vae_params
    if state.clip_params is not None:
        payload["clip_params"] = state.clip_params
    ckptr.save(path, payload, force=True)
    if config_dict is not None:
        import json

        with open(os.path.join(folder, "config.json"), "w") as f:
            json.dump(config_dict, f, indent=2, default=str)
    return path


def restore_train_ckpt(path: str, state, have_pretrained: bool = True):
    """Restore a train checkpoint into an existing TrainState template.

    Restores frozen VAE/CLIP too when the checkpoint carries them. If it
    does NOT (pre-r2 format) and the caller has no official SD ckpt loaded
    (have_pretrained=False), raise — silently resuming with randomly
    initialized frozen encoders produces garbage training
    (utils/checkpoint.py:104-124 always restores the full model)."""
    ckptr = _checkpointer()
    template = {
        "step": state.step,
        "unet_params": state.unet_params,
        "ema_params": state.ema_params,
        "opt_state": state.opt_state,
    }
    has_frozen = state.vae_params is not None and state.clip_params is not None
    if has_frozen:
        template["vae_params"] = state.vae_params
        template["clip_params"] = state.clip_params
    try:
        restored = ckptr.restore(os.path.abspath(path), item=template)
    except Exception:
        if not has_frozen:
            raise
        # old-format checkpoint without frozen params
        template.pop("vae_params")
        template.pop("clip_params")
        restored = ckptr.restore(os.path.abspath(path), item=template)
        if not have_pretrained:
            raise RuntimeError(
                f"checkpoint {path} lacks frozen VAE/CLIP params and no "
                "official SD checkpoint was provided — resuming would train "
                "against randomly initialized frozen encoders. Re-pass "
                "--official_ckpt (or re-save with the current format)."
            )
    return state._replace(
        step=restored["step"],
        unet_params=restored["unet_params"],
        ema_params=restored["ema_params"],
        opt_state=restored["opt_state"],
        vae_params=restored.get("vae_params", state.vae_params),
        clip_params=restored.get("clip_params", state.clip_params),
    )
