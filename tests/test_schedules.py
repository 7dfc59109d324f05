"""Golden tests: schedule math / embeddings vs the PyTorch reference."""

import numpy as np
import pytest

from instancediffusion_tpu.ops import schedules as S

torch = pytest.importorskip("torch")

from ref_compat import install_reference, load_ref_function  # noqa: E402

install_reference()

from ldm.modules.diffusionmodules import util as ref_util  # noqa: E402
from ldm.models.diffusion.ddpm import DDPM as RefDDPM  # noqa: E402

ref_alpha_generator = load_ref_function("utils/model.py", "alpha_generator")


@pytest.mark.parametrize("schedule", ["linear", "cosine", "sqrt_linear", "sqrt"])
def test_beta_schedules(schedule):
    ours = S.make_beta_schedule(schedule, 1000, 0.00085, 0.012)
    ref = ref_util.make_beta_schedule(schedule, 1000, 0.00085, 0.012)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


@pytest.mark.parametrize("steps", [50, 20, 250])
def test_ddim_timesteps(steps):
    ours = S.make_ddim_timesteps("uniform", steps, 1000)
    ref = ref_util.make_ddim_timesteps("uniform", steps, 1000, verbose=False)
    np.testing.assert_array_equal(ours, ref)


def test_ddim_sampling_parameters():
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    acum = np.cumprod(1 - betas)
    ts = S.make_ddim_timesteps("uniform", 50, 1000)
    sig, al, alp = S.make_ddim_sampling_parameters(acum, ts, eta=0.0)
    rsig, ral, ralp = ref_util.make_ddim_sampling_parameters(
        torch.tensor(acum), ts, eta=0.0, verbose=False
    )
    np.testing.assert_allclose(al, ral.numpy(), rtol=1e-12)
    np.testing.assert_allclose(alp, ralp, rtol=1e-12)
    np.testing.assert_allclose(sig, rsig, rtol=1e-12)


def test_diffusion_schedule_buffers():
    sched = S.make_diffusion_schedule("linear", 1000, 0.00085, 0.012)
    ref = RefDDPM(
        beta_schedule="linear", timesteps=1000, linear_start=0.00085, linear_end=0.012
    )
    for name in [
        "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
        "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
        "posterior_variance", "posterior_log_variance_clipped",
        "posterior_mean_coef1", "posterior_mean_coef2",
    ]:
        np.testing.assert_allclose(
            getattr(sched, name), getattr(ref, name).numpy(), rtol=1e-6, atol=1e-8,
            err_msg=name,
        )


@pytest.mark.parametrize(
    "length,typ",
    [(50, [0.75, 0.0, 0.25]), (50, [0.8, 0.1, 0.1]), (50, [1, 0, 0]), (37, [0.3, 0.3, 0.4])],
)
def test_alpha_generator(length, typ):
    ours = S.alpha_generator(length, typ)
    ref = ref_alpha_generator(length, list(typ))
    np.testing.assert_allclose(ours, np.asarray(ref, dtype=np.float32), rtol=1e-6)


def test_timestep_embedding():
    t = np.array([0, 1, 17, 999], dtype=np.float32)
    ours = np.asarray(S.timestep_embedding(t, 320))
    ref = ref_util.timestep_embedding(torch.tensor(t), 320).numpy()
    # fp32 exp() ulp differences in the frequencies get amplified by t=999
    # inside sin/cos; 5e-3 absolute is the expected cross-library agreement.
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-3)
    # and verify against a float64 ground-truth recomputation
    half = 160
    freqs = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float64) / half)
    args = t[:, None].astype(np.float64) * freqs[None]
    gt = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(ours, gt, rtol=1e-3, atol=3e-3)


@pytest.mark.parametrize("num_freqs,shape", [(16, (2, 5, 4)), (16, (2, 5, 40)), (8, (3, 2))])
def test_fourier_embed(num_freqs, shape):
    rng = np.random.RandomState(0)
    x = rng.rand(*shape).astype(np.float32)
    ours = np.asarray(S.fourier_embed(x, num_freqs))
    ref = ref_util.FourierEmbedder(num_freqs=num_freqs)(torch.tensor(x)).numpy()
    assert ours.shape == ref.shape
    # fp32 pow() ulp differences in freq bands; 1e-3 abs is cross-library noise
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_q_sample():
    sched = S.make_diffusion_schedule("linear", 1000, 0.00085, 0.012)
    rng = np.random.RandomState(1)
    x0 = rng.randn(2, 8, 8, 4).astype(np.float32)
    noise = rng.randn(2, 8, 8, 4).astype(np.float32)
    t = np.array([3, 500])
    import jax.numpy as jnp

    ours = np.asarray(
        S.q_sample(
            jnp.asarray(sched.sqrt_alphas_cumprod),
            jnp.asarray(sched.sqrt_one_minus_alphas_cumprod),
            jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise),
        )
    )
    expect = (
        sched.sqrt_alphas_cumprod[t][:, None, None, None] * x0
        + sched.sqrt_one_minus_alphas_cumprod[t][:, None, None, None] * noise
    )
    np.testing.assert_allclose(ours, expect, rtol=1e-6)
