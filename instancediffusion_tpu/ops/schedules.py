"""Diffusion schedule math and positional/Fourier embeddings.

Numerics match the reference formulas exactly (float64 for schedule
construction, float32 buffers):
  * beta schedules          — ldm/modules/diffusionmodules/util.py:30-52
  * DDIM timestep subset    — ldm/modules/diffusionmodules/util.py:55-69
  * DDIM sampling params    — ldm/modules/diffusionmodules/util.py:72-83
  * timestep embedding      — ldm/modules/diffusionmodules/util.py:160-180
  * Fourier embedder        — ldm/modules/diffusionmodules/util.py:12-26
  * alpha (gate) generator  — utils/model.py:83-117

Everything here is host-side precomputation (NumPy) or traced-friendly JAX;
the resulting arrays are closed over by jitted samplers/training steps.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Beta schedules
# ---------------------------------------------------------------------------


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Return float64 betas of shape (n_timestep,)."""
    if schedule == "linear":
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """Uniform/quadratic DDIM timestep subset, shifted by +1 (int array)."""
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(
            f'There is no ddim discretization method called "{ddim_discr_method}"'
        )
    # +1 so that the final alpha corresponds to the one that scales to data
    return ddim_timesteps + 1


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sigmas, alphas, alphas_prev) for the selected DDIM subset."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


# ---------------------------------------------------------------------------
# DDPM buffer bundle (the reference's DDPM.register_schedule, ddpm.py:19-54)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DiffusionSchedule:
    """All forward-process buffers as float32 numpy arrays of shape (T,)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def make_diffusion_schedule(
    beta_schedule: str = "linear",
    timesteps: int = 1000,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
    v_posterior: float = 0.0,
) -> DiffusionSchedule:
    betas = make_beta_schedule(
        beta_schedule, timesteps, linear_start=linear_start, linear_end=linear_end,
        cosine_s=cosine_s,
    )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = (1 - v_posterior) * betas * (1.0 - alphas_cumprod_prev) / (
        1.0 - alphas_cumprod
    ) + v_posterior * betas

    f32 = lambda x: np.asarray(x, dtype=np.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
    )


def q_sample(
    schedule_sqrt_ac: jnp.ndarray,
    schedule_sqrt_1mac: jnp.ndarray,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward-noising q(x_t | x_0) (ldm/models/diffusion/ldm.py:17-20).

    t: int array (B,). Buffers are (T,) float32 device arrays.
    """
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    a = schedule_sqrt_ac[t].reshape(shape)
    b = schedule_sqrt_1mac[t].reshape(shape)
    return a * x_start + b * noise


# ---------------------------------------------------------------------------
# Gate (alpha) schedule for gated self-attention (utils/model.py:83-117)
# ---------------------------------------------------------------------------


def alpha_generator(length: int, type: list[float] | None = None) -> np.ndarray:
    """Per-step gate scale: `type=[a,b,c]` fractions of steps at alpha=1,
    linear decay, and alpha=0 respectively."""
    if type is None:
        type = [1, 0, 0]
    assert len(type) == 3
    assert abs(type[0] + type[1] + type[2] - 1) < 1e-9

    stage0_length = int(type[0] * length)
    stage1_length = int(type[1] * length)
    stage2_length = length - stage0_length - stage1_length

    if stage1_length != 0:
        decay_alphas = list(np.arange(start=0, stop=1, step=1 / stage1_length)[::-1])
    else:
        decay_alphas = []

    alphas = [1.0] * stage0_length + decay_alphas + [0.0] * stage2_length
    assert len(alphas) == length
    return np.asarray(alphas, dtype=np.float32)


# ---------------------------------------------------------------------------
# Timestep + Fourier embeddings (traced; run on device inside jit)
# ---------------------------------------------------------------------------


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings, layout [cos | sin] (util.py:160-180).

    timesteps: (B,) possibly-fractional. Returns (B, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def fourier_embed(
    x: jnp.ndarray, num_freqs: int, temperature: float = 100.0
) -> jnp.ndarray:
    """Fourier features with freq-major [sin|cos] interleave (util.py:12-26).

    For input (..., D) returns (..., num_freqs*2*D) laid out as
    [sin(f0*x), cos(f0*x), sin(f1*x), cos(f1*x), ...], each block D wide.
    """
    freqs = temperature ** (jnp.arange(num_freqs, dtype=jnp.float32) / num_freqs)
    # (..., D) -> (..., F, 1, D) * (F,1,1) broadcast, then stack sin/cos on
    # the middle axis and flatten (F, 2, D) -> F*2*D. This reproduces the
    # reference's python-loop concat order with one vectorized op.
    xb = x[..., None, None, :] * freqs[:, None, None]
    out = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    return out.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
