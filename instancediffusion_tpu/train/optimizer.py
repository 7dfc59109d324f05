"""Trainable-parameter selection, optimizer, EMA.

Reference semantics (utils/optimizer.py:11-42): ONLY the new
InstanceDiffusion parameters train — the gated self-attention fusers, the
UniFusion grounding tokenizer (position_net), and the ScaleU gains; every
other UNet parameter is frozen SD1.5 (plus VAE/CLIP frozen wholesale).
Freeze-safety there is an assert against the official checkpoint's key set;
here the selection is structural (pytree paths), with the same invariant
checked in tests.

Optimizer: AdamW(lr 5e-5, wd 0) over the masked subset via optax.masked.
EMA: lerp at 0.9999 (utils/optimizer.py:11-13) — applied to the trainable
subset only (frozen params are identical in model and EMA).
"""

from __future__ import annotations

import jax
import optax

TRAINABLE_MARKERS = ("fuser", "position_net", "scaleu")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def trainable_mask(params):
    """Boolean pytree: True where the parameter trains
    (utils/optimizer.py:15-42 whitelist: fuser / position_net / scaleu;
    downsample_net is always None in the reference configs)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(m in _path_str(path) for m in TRAINABLE_MARKERS),
        params,
    )


def count_trainable(params) -> int:
    import numpy as np

    mask = trainable_mask(params)
    leaves = zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(mask)
    )
    return int(sum(np.prod(p.shape) for p, m in leaves if m))


def make_optimizer(
    learning_rate: float = 5e-5,
    weight_decay: float = 0.0,
    warmup_steps: int = 5000,
    scheduler_type: str = "constant",
    total_steps: int = 500_000,
    params=None,
):
    """AdamW + HF-style warmup schedule (utils/scheduler.py:3-10), masked to
    the trainable subset."""
    if scheduler_type == "constant":
        sched = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.constant_schedule(learning_rate),
            ],
            [warmup_steps],
        )
    elif scheduler_type == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps
        )
    else:
        raise ValueError(scheduler_type)
    tx = optax.adamw(sched, weight_decay=weight_decay)
    if params is not None:
        # NOTE optax.masked is NOT freezing: masked-out leaves pass their
        # raw gradient through unchanged. multi_transform routes frozen
        # leaves to set_to_zero (verified by test_masked_update_freezes_frozen).
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", trainable_mask(params)
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def init_ema(params):
    """Trainable-subset EMA: frozen leaves are replaced by 0-d placeholders
    so the EMA tree doesn't duplicate ~4.7GB of frozen SD weights (the
    reference deep-copies the whole model, utils/model.py:57-67 — wasteful;
    frozen weights never change, so EMA(frozen) == frozen)."""
    mask = trainable_mask(params)
    import jax.numpy as jnp

    # jnp.copy: the EMA must own its buffers — aliasing the live param
    # arrays breaks buffer donation in the jitted train step
    return jax.tree_util.tree_map(
        lambda p, m: jnp.copy(p) if m else jnp.zeros((), p.dtype), params, mask
    )


def update_ema(ema_params, params, rate: float = 0.9999):
    """ema = ema * rate + p * (1 - rate) (utils/optimizer.py:11-13),
    trainable leaves only (frozen placeholders pass through)."""
    return jax.tree_util.tree_map(
        lambda e, p: e if e.ndim == 0 and p.ndim != 0
        else e * rate + p.astype(e.dtype) * (1.0 - rate),
        ema_params, params,
    )


def ema_full_params(ema_params, params):
    """Materialize full EMA weights for sampling/checkpoint export:
    trainable leaves from the EMA, frozen leaves from the live params."""
    return jax.tree_util.tree_map(
        lambda e, p: p if (e.ndim == 0 and p.ndim != 0) else e,
        ema_params, params,
    )
