"""DPM-Solver++(2M) sampler tests (samplers/dpm.py).

Correctness anchors:
  * constant-eps model: the probability-flow ODE has the closed form
    x_t = alpha_t * c + sigma_t * eps0 with c = x0(x_init); for this model
    the 2M data-prediction update is EXACT at any step count (x0 is
    constant along the trajectory, so the D1 correction vanishes and the
    exponential integrator integrates the remaining linear ODE exactly)
  * nonlinear model: DPM++ at 10 steps must beat DDIM at 10 steps against
    a 1000-step DDIM ground truth, and 20 steps must beat 10 (the whole
    point of shipping the sampler)
  * static-gate segmentation must match the traced-gate path exactly
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instancediffusion_tpu.ops.schedules import make_diffusion_schedule
from instancediffusion_tpu.samplers.ddim import ddim_sample, make_ddim_schedule
from instancediffusion_tpu.samplers.dpm import dpm_sample, make_dpm_schedule
from instancediffusion_tpu.samplers.plms import gate_runs

SHAPE = (2, 4, 4, 3)
DIFF = make_diffusion_schedule("linear", 1000, 0.00085, 0.012)


def _final_alpha_sigma(sched):
    # target (alpha, sigma) of the last step, derived from the step arrays
    sig_f = float(sched.sig_ratio[-1] * sched.sigma_s[-1])
    return float(np.sqrt(1.0 - sig_f**2)), sig_f


def test_constant_eps_is_exact():
    eps0 = jax.random.normal(jax.random.PRNGKey(1), SHAPE, jnp.float32)
    x_init = jax.random.normal(jax.random.PRNGKey(2), SHAPE, jnp.float32)

    def model_fn(x, t, gate):
        return eps0

    for steps in (4, 10, 25):
        sched = make_dpm_schedule(DIFF, steps)
        x = dpm_sample(model_fn, sched, x_init)
        a0, s0 = float(sched.alpha_s[0]), float(sched.sigma_s[0])
        af, sf = _final_alpha_sigma(sched)
        c = (np.asarray(x_init) - s0 * np.asarray(eps0)) / a0
        exact = af * c + sf * np.asarray(eps0)
        np.testing.assert_allclose(np.asarray(x), exact, atol=2e-4)


def _nonlinear_model():
    def model_fn(x, t, gate):
        # smooth, state- and time-dependent eps; bounded so trajectories
        # stay tame at every step count
        tt = t[0].astype(jnp.float32) / 1000.0
        return jnp.tanh(x) * (0.5 + 0.5 * tt) + 0.1 * jnp.sin(3.0 * x)

    return model_fn


def test_beats_ddim_at_few_steps():
    model_fn = _nonlinear_model()
    x_init = jax.random.normal(jax.random.PRNGKey(3), SHAPE, jnp.float32)

    # 500 is the finest uniform subset the reference's +1-offset timestep
    # selection allows (1000 would index alphas_cumprod[1000], OOB)
    truth = ddim_sample(model_fn, make_ddim_schedule(DIFF, 500), x_init)
    truth = np.asarray(truth)

    def err(x):
        return float(np.sqrt(np.mean((np.asarray(x) - truth) ** 2)))

    e_dpm10 = err(dpm_sample(model_fn, make_dpm_schedule(DIFF, 10), x_init))
    e_ddim10 = err(ddim_sample(model_fn, make_ddim_schedule(DIFF, 10), x_init))
    e_dpm20 = err(dpm_sample(model_fn, make_dpm_schedule(DIFF, 20), x_init))
    e_ddim20 = err(ddim_sample(model_fn, make_ddim_schedule(DIFF, 20), x_init))

    assert e_dpm10 < e_ddim10, (e_dpm10, e_ddim10)
    assert e_dpm20 < e_ddim20, (e_dpm20, e_ddim20)
    assert e_dpm20 < e_dpm10, (e_dpm20, e_dpm10)
    # non-vacuous sanity: this toy ODE is stiff (the 1/alpha amplification
    # near t_max gives trajectories RMS ~8), yet 20-step 2M lands within
    # ~22% relative of the 500-step truth while 10-step DDIM is ~2x worse
    assert e_dpm20 < 0.3 * float(np.sqrt(np.mean(truth**2))), e_dpm20


def test_static_gates_match_traced():
    # gate-sensitive model so a wrong gate value would show up
    def model_fn(x, t, gate):
        return jnp.tanh(x) * (0.8 + 0.2 * gate)

    x_init = jax.random.normal(jax.random.PRNGKey(4), SHAPE, jnp.float32)
    sched = make_dpm_schedule(DIFF, 20, alpha_type=[0.75, 0.0, 0.25])
    runs = gate_runs(sched.gates)
    assert runs is not None and len(runs) == 2  # (1.0, 15), (0.0, 5)

    x_traced = dpm_sample(model_fn, sched, x_init, static_gates=None)
    x_static = dpm_sample(model_fn, sched, x_init, static_gates=runs)
    np.testing.assert_allclose(
        np.asarray(x_traced), np.asarray(x_static), atol=1e-6
    )


def test_lower_order_final_default():
    model_fn = _nonlinear_model()
    x_init = jax.random.normal(jax.random.PRNGKey(5), SHAPE, jnp.float32)
    sched = make_dpm_schedule(DIFF, 10)
    x_default = dpm_sample(model_fn, sched, x_init)  # on (S < 15)
    x_off = dpm_sample(model_fn, sched, x_init, lower_order_final=False)
    x_on = dpm_sample(model_fn, sched, x_init, lower_order_final=True)
    np.testing.assert_allclose(np.asarray(x_default), np.asarray(x_on))
    assert not np.allclose(np.asarray(x_on), np.asarray(x_off))


def test_pipeline_sampler_selection(monkeypatch, tiny_pipe):
    from tests.test_pipeline import _patch_meta
    import instancediffusion_tpu.pipeline as pipeline_mod
    import instancediffusion_tpu.data.grounding_input as gi
    from instancediffusion_tpu.samplers import dpm as dpm_samplers

    # dispatch spy: the traced sample fn must actually route through
    # dpm_sample (image-level dpm-vs-plms comparison is vacuous here — a
    # random-init UNet's eps is nearly x-independent, and for constant-eps
    # models ALL these integrators produce identical trajectories; the
    # integrator differences are pinned by the unit tests above)
    calls = []
    real = dpm_samplers.dpm_sample

    def spy(*a, **k):
        calls.append(True)
        return real(*a, **k)

    monkeypatch.setattr(pipeline_mod.dpm_mod, "dpm_sample", spy)

    pipe = tiny_pipe  # session-shared (conftest); sampler selection only
    meta = _patch_meta(pipe)
    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    try:
        size = pipe.cfg.model.image_size * 2
        imgs = pipe.generate(meta, num_images=1, steps=5, mis=0.0, seed=1,
                             sampler="dpm")
        assert imgs.shape == (1, size, size, 3) and imgs.dtype == np.uint8
        assert calls, "generate(sampler='dpm') never called dpm_sample"
        # deterministic
        imgs2 = pipe.generate(meta, num_images=1, steps=5, mis=0.0, seed=1,
                              sampler="dpm")
        np.testing.assert_array_equal(imgs, imgs2)
        # distinct compiled variants per sampler
        imgs_plms = pipe.generate(meta, num_images=1, steps=5, mis=0.0,
                                  seed=1, sampler="plms")
        assert imgs_plms.shape == imgs.shape
        # subset, not equality: the session-shared pipe may carry variants
        # compiled by other test files
        keys = {k[-1] for k in pipe._sample_cache}
        assert {"dpm", "plms"} <= keys, keys
        # MIS is PLMS-only
        with pytest.raises(ValueError, match="MIS"):
            pipe.generate(meta, num_images=1, steps=5, mis=0.4, seed=1,
                          sampler="dpm")
        # ...but a config-DEFAULT mis must not poison an explicit non-PLMS
        # sampler choice: mis omitted -> coerced to 0.0, same compiled
        # variant, same images (regression: serve(sampler='dpm') raised
        # because Config().sampler.mis defaults to 0.36)
        monkeypatch.setattr(pipe.cfg.sampler, "mis", 0.4)
        n_variants = len(pipe._sample_cache)
        imgs_default_mis = pipe.generate(meta, num_images=1, steps=5,
                                         seed=1, sampler="dpm")
        np.testing.assert_array_equal(imgs, imgs_default_mis)
        assert len(pipe._sample_cache) == n_variants, (
            "mis coercion must hit the existing mis=0 dpm variant"
        )
        # unknown sampler rejected
        with pytest.raises(ValueError, match="unknown sampler"):
            pipe.generate(meta, num_images=1, steps=5, mis=0.0, seed=1,
                          sampler="euler")
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old
