"""Golden parity: PLMS / MIS samplers vs the reference loop, using an
analytic dummy eps-model implemented identically in torch and JAX. Exercises
the Adams-Bashforth warm-up, CFG combine, per-step gate schedule, the
gate==0 "restore first conv" flip, and the MIS merge + history reuse."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_compat import install_reference, load_ref_function  # noqa: E402

install_reference()

import jax.numpy as jnp  # noqa: E402
from functools import partial  # noqa: E402

from ldm.models.diffusion.ddpm import DDPM as RefDDPM  # noqa: E402
from ldm.models.diffusion.plms import PLMSSampler as RefPLMS  # noqa: E402
from ldm.models.diffusion.plms_instance import PLMSSamplerInst as RefPLMSInst  # noqa: E402

from instancediffusion_tpu.ops.schedules import make_diffusion_schedule  # noqa: E402
from instancediffusion_tpu.samplers import mis as jmis  # noqa: E402
from instancediffusion_tpu.samplers import plms as jplms  # noqa: E402

ref_alpha_generator = load_ref_function("utils/model.py", "alpha_generator")

S = 10
ALPHA_TYPE = [0.5, 0.2, 0.3]
GS = 2.0


class RefDummyModel:
    """eps = sin(3x + t/1000) * (1 + 0.1 mean(ctx)) * (1 + 0.05 scale)
    + 0.01 if 'first conv restored'."""

    def __init__(self):
        self.scale = 1.0
        self.restored = False

    def __call__(self, inp):
        x = inp["x"]
        t = inp["timesteps"].float().view(-1, 1, 1, 1)
        ctx = inp["context"]
        e = torch.sin(3 * x + t / 1000.0) * (1 + 0.1 * ctx.mean()) * (
            1 + 0.05 * self.scale
        )
        if self.restored:
            e = e + 0.01
        return e

    def restore_first_conv_from_SD(self):
        self.restored = True


def ref_set_alpha_scale(model, alpha):
    model.scale = alpha


def jax_model_fn(context_mean):
    def apply_eps(x, t, ctx_mean, gate):
        tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
        e = jnp.sin(3 * x + tb / 1000.0) * (1 + 0.1 * ctx_mean) * (1 + 0.05 * gate)
        return e + 0.01 * (gate == 0.0)

    def model_fn(x, t, gate):
        e_c = apply_eps(x, t, context_mean, gate)
        e_u = apply_eps(x, t, jnp.float32(0.0), gate)  # uc ctx mean = 0
        return e_u + GS * (e_c - e_u)

    return model_fn


@pytest.fixture(scope="module")
def schedules():
    diff = make_diffusion_schedule("linear", 1000, 0.00085, 0.012)
    sched = jplms.make_plms_schedule(diff, S, ALPHA_TYPE)
    ref_diff = RefDDPM(
        beta_schedule="linear", timesteps=1000, linear_start=0.00085,
        linear_end=0.012,
    )
    return sched, ref_diff


def test_plms_parity(schedules):
    sched, ref_diff = schedules
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 8, 8, 4).astype(np.float32)
    ctx = rng.randn(2, 7, 16).astype(np.float32)
    ctx_mean = float(ctx.mean())

    # reference
    model = RefDummyModel()
    sampler = RefPLMS(
        ref_diff, model,
        alpha_generator_func=partial(ref_alpha_generator, type=ALPHA_TYPE),
        set_alpha_scale=ref_set_alpha_scale,
    )
    x_t = torch.tensor(np.moveaxis(x0, -1, 1))
    inp = {"x": x_t, "timesteps": None, "context": torch.tensor(ctx)}
    with torch.no_grad():
        ref_out = sampler.sample(
            S=S, shape=x_t.shape, input=inp,
            uc=torch.zeros_like(torch.tensor(ctx)), guidance_scale=GS,
        )
    ref_out = np.moveaxis(ref_out.numpy(), 1, -1)

    # ours
    ours = np.asarray(
        jplms.plms_sample(jax_model_fn(ctx_mean), sched, jnp.asarray(x0))
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


def test_mis_parity(schedules):
    sched, ref_diff = schedules
    rng = np.random.RandomState(1)
    x0 = rng.randn(1, 8, 8, 4).astype(np.float32)
    # three "conditionings": global + 2 instances, distinguished by ctx mean
    ctx_means = [0.7, -0.4, 0.3]
    mis = 0.36  # -> mis_step = 3 with S=10

    model = RefDummyModel()
    sampler = RefPLMSInst(
        ref_diff, model,
        alpha_generator_func=partial(ref_alpha_generator, type=ALPHA_TYPE),
        set_alpha_scale=ref_set_alpha_scale, mis=mis,
    )
    x_t = torch.tensor(np.moveaxis(x0, -1, 1))
    input_all = [
        {
            "x": x_t.clone(),
            "timesteps": None,
            "context": torch.full((1, 7, 16), m),
        }
        for m in ctx_means
    ]
    with torch.no_grad():
        ref_out = sampler.sample(
            S=S, shape=x_t.shape, input=input_all,
            uc=torch.zeros(1, 7, 16), guidance_scale=GS,
        )
    ref_out = np.moveaxis(ref_out.numpy(), 1, -1)

    # ours: trajectories stacked into batch
    def apply_eps(x, t, ctx_mean, gate):
        tb = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return (
            jnp.sin(3 * x + tb / 1000.0) * (1 + 0.1 * ctx_mean) * (1 + 0.05 * gate)
            + 0.01 * (gate == 0.0)
        )

    cms = jnp.asarray(ctx_means).reshape(3, 1, 1, 1)

    def traj_fn(x, t, gate):
        e_c = apply_eps(x, t, jnp.repeat(cms, 1, axis=0), gate)
        e_u = apply_eps(x, t, jnp.float32(0.0), gate)
        return e_u + GS * (e_c - e_u)

    global_fn = jax_model_fn(ctx_means[0])
    ours = np.asarray(
        jmis.mis_sample(
            traj_fn, global_fn, sched, jnp.asarray(x0), num_traj=3,
            mis_fraction=mis,
        )
    )
    np.testing.assert_allclose(ours, ref_out, rtol=1e-3, atol=1e-4)


def test_mis_zero_equals_plms(schedules):
    sched, _ = schedules
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    fn = jax_model_fn(0.5)
    a = jmis.mis_sample(fn, fn, sched, x0, num_traj=1, mis_fraction=0.0)
    b = jplms.plms_sample(fn, sched, x0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_ddim_eta0_matches_reference_formula(schedules):
    """DDIM (eta=0) single-step update equals the PLMS x_prev formula with
    e_t directly (no multistep): verify against a hand-rolled numpy loop."""
    from instancediffusion_tpu.samplers import ddim as jddim
    from instancediffusion_tpu.ops.schedules import make_diffusion_schedule

    diff = make_diffusion_schedule("linear", 1000, 0.00085, 0.012)
    sched = jddim.make_ddim_schedule(diff, S, ALPHA_TYPE, eta=0.0)
    rng = np.random.RandomState(3)
    x0 = rng.randn(1, 8, 8, 4).astype(np.float32)
    fn = jax_model_fn(0.25)
    ours = np.asarray(jddim.ddim_sample(fn, sched, jnp.asarray(x0)))

    # numpy replication
    x = x0.copy()
    for i in range(S):
        t = np.full((1,), sched.ts[i], np.int64)
        e = np.asarray(fn(jnp.asarray(x), jnp.asarray(t), jnp.float32(sched.gates[i])))
        pred_x0 = (x - sched.sqrt_one_minus_a_t[i] * e) / np.sqrt(sched.a_t[i])
        x = np.sqrt(sched.a_prev[i]) * pred_x0 + np.sqrt(1 - sched.a_prev[i]) * e
    np.testing.assert_allclose(ours, x, rtol=1e-4, atol=1e-5)


def test_mis_crop_merge_matches_reference_slicing():
    """The traced crop-and-paste merge must equal the reference's eager
    tensor slicing (plms_instance.py:110-132: int() floor bounds, rows
    indexed by bbox x, cols by y) — and it must run under jit."""
    import jax
    import jax.numpy as jnp

    from instancediffusion_tpu.samplers.mis import _box_paste_mask

    rng = np.random.RandomState(0)
    latent, b, c = 16, 2, 4
    base = rng.randn(b, latent, latent, c).astype(np.float32)
    inst = rng.randn(b, latent, latent, c).astype(np.float32)
    boxes = np.asarray([[0.13, 0.27, 0.62, 0.81]], np.float32)

    # reference semantics (NCHW slice, x rows / y cols, int() floor)
    x1, y1, x2, y2 = (int(v * latent) for v in boxes[0])
    expect = base.copy()
    expect[:, x1:x2, y1:y2, :] = inst[:, x1:x2, y1:y2, :]

    @jax.jit
    def merge(base, inst, box01):
        m = _box_paste_mask(box01, latent)
        return jnp.where(m[None, :, :, None], inst, base)

    got = np.asarray(merge(base, inst, jnp.asarray(boxes[0])))
    np.testing.assert_array_equal(got, expect)


def test_static_gates_match_traced(schedules):
    """plms_sample with a static gate RLE (trace-time gate resolution — no
    lax.cond per step) must produce bitwise the same trajectory as the
    traced-gate scan, including across the gate-on -> gate-off segment
    boundary and the peeled first step."""
    diff = make_diffusion_schedule("linear", 1000, 0.00085, 0.012)
    # [0.75, 0, 0.25]: prefix of 1.0s then 0.0s — the flagship pattern
    sched = jplms.make_plms_schedule(diff, S, [0.75, 0.0, 0.25])
    rle = jplms.gate_runs(sched.gates)
    assert rle is not None and len(rle) == 2, rle
    assert rle[0][0] == 1.0 and rle[1][0] == 0.0
    assert rle[0][1] + rle[1][1] == S

    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    fn = jax_model_fn(0.7)
    traced = np.asarray(jplms.plms_sample(fn, sched, x0))
    static = np.asarray(jplms.plms_sample(fn, sched, x0, static_gates=rle))
    # not bitwise: the toy model's (1 + 0.05*gate) folds in f64 at trace
    # time under a static gate (real-model gates multiply by exactly 0/1)
    np.testing.assert_allclose(static, traced, rtol=1e-4, atol=1e-5)


def test_static_gates_match_traced_mis(schedules):
    """Same equivalence through the MIS two-phase path (merge + resumed
    history)."""
    diff = make_diffusion_schedule("linear", 1000, 0.00085, 0.012)
    sched = jplms.make_plms_schedule(diff, S, [0.75, 0.0, 0.25])
    rle = jplms.gate_runs(sched.gates)

    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    gfn = jax_model_fn(0.7)
    tfn = jax_model_fn(0.3)
    traced = np.asarray(
        jmis.mis_sample(tfn, gfn, sched, x0, num_traj=3, mis_step=4)
    )
    static = np.asarray(
        jmis.mis_sample(
            tfn, gfn, sched, x0, num_traj=3, mis_step=4, static_gates=rle
        )
    )
    np.testing.assert_allclose(static, traced, rtol=1e-4, atol=1e-5)


def test_gate_runs_rle():
    """Fragmented schedules (long decay segments) must fall back to the
    traced path: every run is an extra compiled UNet instance."""
    assert jplms.gate_runs(np.asarray([1.0, 1.0, 0.0])) == ((1.0, 2), (0.0, 1))
    assert jplms.gate_runs(np.asarray([1.0] * 5)) == ((1.0, 5),)
    # decay segment: 4 distinct consecutive values > max_runs=3
    assert jplms.gate_runs(np.asarray([1.0, 0.7, 0.3, 0.0])) is None
    # any returned RLE must reconstruct the gate array exactly
    gates = jplms.make_plms_schedule(
        make_diffusion_schedule("linear", 1000, 0.00085, 0.012), S, ALPHA_TYPE
    ).gates
    rle = jplms.gate_runs(gates)
    if rle is not None:
        flat = np.concatenate([np.full(n, g, np.float32) for g, n in rle])
        np.testing.assert_array_equal(flat, gates)
