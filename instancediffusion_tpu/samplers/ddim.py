"""DDIM sampler as a lax.scan.

The reference ships a DDIMSampler (ldm/models/diffusion/ddim.py:7-131,
dead code upstream — imported by nothing) with the same alpha-gate /
first-conv hooks as PLMS; provided here as a live, tested alternative:
DDIM is the standard ablation baseline and supports eta > 0 (stochastic)
unlike PLMS. Shares the PLMSSchedule machinery; the update rule is the
single-step eta-generalized form (plms.py:130-144 with sigma != 0)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from instancediffusion_tpu.ops.schedules import (
    DiffusionSchedule,
    alpha_generator,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)
from instancediffusion_tpu.samplers.plms import ModelFn


@dataclass(frozen=True)
class DDIMSchedule:
    ts: np.ndarray
    a_t: np.ndarray
    a_prev: np.ndarray
    sqrt_one_minus_a_t: np.ndarray
    sigmas: np.ndarray
    gates: np.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.ts.shape[0])


jax.tree_util.register_pytree_node(
    DDIMSchedule,
    lambda s: ((s.ts, s.a_t, s.a_prev, s.sqrt_one_minus_a_t, s.sigmas, s.gates), None),
    lambda _, c: DDIMSchedule(*c),
)


def make_ddim_schedule(
    diffusion: DiffusionSchedule,
    num_steps: int,
    alpha_type: list[float] | None = None,
    eta: float = 0.0,
) -> DDIMSchedule:
    if diffusion.num_timesteps % num_steps != 0:
        raise ValueError(
            f"num_steps ({num_steps}) must divide {diffusion.num_timesteps}"
        )
    ddim_ts = make_ddim_timesteps("uniform", num_steps, diffusion.num_timesteps)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        diffusion.alphas_cumprod.astype(np.float64), ddim_ts, eta=eta
    )
    rev = np.arange(num_steps)[::-1]
    return DDIMSchedule(
        ts=ddim_ts[rev].astype(np.int32),
        a_t=alphas[rev].astype(np.float32),
        a_prev=np.asarray(alphas_prev)[rev].astype(np.float32),
        sqrt_one_minus_a_t=np.sqrt(1.0 - alphas[rev]).astype(np.float32),
        sigmas=np.asarray(sigmas)[rev].astype(np.float32),
        gates=alpha_generator(num_steps, alpha_type).astype(np.float32),
    )


def ddim_sample(
    model_fn: ModelFn,
    sched: DDIMSchedule,
    x_init: jnp.ndarray,
    rng: jax.Array | None = None,
) -> jnp.ndarray:
    """x_T -> x_0 over the full schedule; rng only needed for eta > 0."""
    x = x_init.astype(jnp.float32)
    b = x.shape[0]
    if rng is None:
        rng = jax.random.PRNGKey(0)

    arrays = (
        jnp.asarray(sched.ts), jnp.asarray(sched.a_t),
        jnp.asarray(sched.a_prev), jnp.asarray(sched.sqrt_one_minus_a_t),
        jnp.asarray(sched.sigmas), jnp.asarray(sched.gates),
        jax.random.split(rng, sched.num_steps),
    )

    def step(x, per):
        ts, a_t, a_prev, sqrt_1m, sigma, gate, key = per
        tb = jnp.full((b,), ts, jnp.int32)
        e_t = model_fn(x, tb, gate).astype(jnp.float32)
        pred_x0 = (x - sqrt_1m * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * e_t
        noise = sigma * jax.random.normal(key, x.shape, jnp.float32)
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise, None

    x, _ = jax.lax.scan(step, x, arrays)
    return x
