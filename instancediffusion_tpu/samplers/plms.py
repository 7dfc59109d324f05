"""PLMS (pseudo linear multistep) sampler as a single `lax.scan` under jit.

Re-design of the reference PLMSSampler (ldm/models/diffusion/plms.py:9-167):

  * the 50-step Python loop becomes one `lax.scan`; the per-step host-side
    module mutations (`set_alpha_scale`, `restore_first_conv_from_SD`,
    plms.py:89-94) are precomputed per-step gate scalars fed through the
    scan and consumed as traced data inside the UNet
  * classifier-free guidance is the caller's concern: `model_fn` receives
    (x, t, gate) and returns eps — callers batch cond/uncond in one 2B
    forward (see build_cfg_model_fn)
  * Adams-Bashforth order warm-up (plms.py:148-163) is a `lax.switch` on
    the history count; the step-0 "pseudo improved Euler" extra model call
    (plms.py:150-154) lives in branch 0 of the switch
  * eta=0 always (PLMS requirement, plms.py:26-27), so sigma terms vanish

The schedule bundle is precomputed on host in loop order (i = 0 is the
noisiest step), indexed by the scan counter.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from instancediffusion_tpu.ops.schedules import (
    DiffusionSchedule,
    alpha_generator,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
# model_fn(x (B,H,W,C), t (B,) int32, gate scalar) -> eps (B,H,W,C)


@dataclass(frozen=True)
class PLMSSchedule:
    """Per-step arrays in loop order (descending t). All float32 numpy.
    Registered as a pytree so schedules can be passed as jit arguments."""

    ts: np.ndarray           # (S,) int32 current timesteps
    ts_next: np.ndarray      # (S,) int32 next timesteps (for step-0 Euler)
    a_t: np.ndarray          # (S,) ddim alpha_cumprod at t
    a_prev: np.ndarray       # (S,) ddim alpha_cumprod at t_prev
    sqrt_one_minus_a_t: np.ndarray  # (S,)
    gates: np.ndarray        # (S,) gated-self-attn alpha scale per step

    @property
    def num_steps(self) -> int:
        return int(self.ts.shape[0])


jax.tree_util.register_pytree_node(
    PLMSSchedule,
    lambda s: ((s.ts, s.ts_next, s.a_t, s.a_prev, s.sqrt_one_minus_a_t, s.gates), None),
    lambda _, c: PLMSSchedule(*c),
)


def make_plms_schedule(
    diffusion: DiffusionSchedule,
    num_steps: int,
    alpha_type: list[float] | None = None,
) -> PLMSSchedule:
    """PLMSSampler.make_schedule (plms.py:25-62) + alpha_generator, re-indexed
    into loop order: reference loops i over flip(ddim_timesteps) with buffer
    index = S-1-i."""
    if diffusion.num_timesteps % num_steps != 0:
        raise ValueError(
            f"num_steps ({num_steps}) must divide the DDPM timestep count "
            f"({diffusion.num_timesteps}); the uniform DDIM subset would "
            "otherwise index past the schedule (same constraint as the "
            "reference's make_ddim_timesteps, util.py:55-58)."
        )
    ddim_ts = make_ddim_timesteps("uniform", num_steps, diffusion.num_timesteps)
    _, ddim_alphas, ddim_alphas_prev = make_ddim_sampling_parameters(
        diffusion.alphas_cumprod.astype(np.float64), ddim_ts, eta=0.0
    )
    time_range = ddim_ts[::-1]
    s = len(time_range)
    idx = np.arange(s)
    rev = s - 1 - idx
    ts_next = time_range[np.minimum(idx + 1, s - 1)]
    gates = alpha_generator(s, alpha_type)
    return PLMSSchedule(
        ts=time_range.astype(np.int32),
        ts_next=ts_next.astype(np.int32),
        a_t=ddim_alphas[rev].astype(np.float32),
        a_prev=np.asarray(ddim_alphas_prev)[rev].astype(np.float32),
        sqrt_one_minus_a_t=np.sqrt(1.0 - ddim_alphas[rev]).astype(np.float32),
        gates=gates.astype(np.float32),
    )


def _x_prev(x, e_t, a_t, a_prev, sqrt_1m_at):
    """get_x_prev_and_pred_x0 with sigma=0 (plms.py:130-144)."""
    pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev) * e_t
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt


def _e_t_prime(model_fn, x, e_t, hist, n_hist, coeffs, skip_order1=False):
    """Adams-Bashforth combine with warm-up (plms.py:148-163).

    hist: (3, ...) rolling eps history, hist[2] newest.
    n_hist: traced int — number of valid history entries (capped at 3).
    skip_order1: the caller guarantees n_hist >= 1 (the first step was
    peeled out of the scan), so the order-1 branch — the only one with a
    second model call — is dropped, leaving exactly ONE UNet instance in
    the scan body (halves compile time and peak activation memory)."""
    ts, ts_next, a_t, a_prev, sqrt_1m = coeffs

    def order1(_):
        # Pseudo improved Euler: extra model call at (x_prev, t_next)
        x1 = _x_prev(x, e_t, a_t, a_prev, sqrt_1m)
        e_next = model_fn(x1, ts_next)
        return (e_t + e_next) / 2

    def order2(_):
        return (3 * e_t - hist[2]) / 2

    def order3(_):
        return (23 * e_t - 16 * hist[2] + 5 * hist[1]) / 12

    def order4(_):
        return (55 * e_t - 59 * hist[2] + 37 * hist[1] - 9 * hist[0]) / 24

    if skip_order1:
        # orders 2-4 are a few elementwise passes over eps-sized arrays
        # (~µs): compute all three and select, instead of lax.switch —
        # TPU conditionals copy operands in/out of branches and the
        # dispatch measured ~10 ms/step at B=16 (docs/traces/r3_gen2),
        # dwarfing the math it guarded
        e4 = order4(None)
        e3 = order3(None)
        e2 = order2(None)
        return jnp.where(n_hist >= 3, e4, jnp.where(n_hist == 2, e3, e2))
    # order1 contains a second model call — branch for real here (only the
    # peeled first step and no-history resumes ever trace this)
    return jax.lax.switch(
        jnp.minimum(n_hist, 3), [order1, order2, order3, order4], None
    )


def gate_runs(gates: np.ndarray, max_runs: int = 3) -> tuple | None:
    """Run-length-encode a CONCRETE per-step gate array into
    ((value, count), ...) — the static-gate signature for plms_steps.

    Returns None when the schedule has more than `max_runs` distinct
    consecutive values (e.g. a long linear-decay segment): each run costs
    one extra compiled UNet instance in the sampler graph, so highly
    fragmented schedules fall back to the traced-gate scan. The flagship
    alpha_type [0.75, 0, 0.25] encodes as ((1.0, ceil(0.75*S)), (0.0, rest))."""
    gates = np.asarray(gates)
    runs = []
    for g in gates:
        g = float(g)
        if runs and runs[-1][0] == g:
            runs[-1][1] += 1
        else:
            runs.append([g, 1])
    if len(runs) > max_runs:
        return None
    return tuple((g, n) for g, n in runs)


def plms_steps(
    model_fn: ModelFn,
    sched: PLMSSchedule,
    x: jnp.ndarray,
    start: int,
    stop: int,
    hist: jnp.ndarray | None = None,
    n_hist: jnp.ndarray | int = 0,
    assume_history: bool = False,
    static_gates: tuple | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run PLMS steps [start, stop) as a lax.scan.

    hist/n_hist allow resuming with existing eps history (MIS phase 2
    reuses trajectory-0 history across the merge, plms_instance.py:108-109).
    Returns (x, hist, n_hist).

    static_gates: optional ((gate_value, run_length), ...) RLE of
    sched.gates over the FULL schedule, known at trace time (see
    gate_runs). When given, the scan is split into one segment per run and
    the gate is passed to model_fn as a PYTHON float, so apply_unet
    resolves its fuser branch statically — no lax.cond in the step body.
    A gate-0 run compiles a fuser-free UNet (and the stock-SD first conv
    swap becomes a static choice). Measured on the 5-step generate trace:
    the runtime cond cost ~12 ms/step of branch glue + boundary copies at
    B=16. Callers must pass an RLE consistent with the traced sched.gates;
    the traced values are ignored for gating.

    Sampler state (x, eps history, schedule math) is float32 regardless of
    the model's compute dtype — model_fn is responsible for casting its
    input down (bf16) and its eps output is upcast here."""
    x = x.astype(jnp.float32)
    peel_first = hist is None
    if hist is None:
        hist = jnp.zeros((3,) + x.shape, jnp.float32)
    else:
        hist = hist.astype(jnp.float32)
    n_hist = jnp.asarray(n_hist, jnp.int32)
    b = x.shape[0]

    def static_gate_at(i: int):
        """Python-float gate for step i, or None without static info."""
        if static_gates is None:
            return None
        off = 0
        for g, n in static_gates:
            if i < off + n:
                return g
            off += n
        raise IndexError(f"step {i} outside static_gates {static_gates}")

    def make_step_inputs(i):
        g = static_gate_at(i)
        return (
            jnp.full((b,), sched.ts[i], jnp.int32),
            jnp.full((b,), sched.ts_next[i], jnp.int32),
            sched.a_t[i], sched.a_prev[i], sched.sqrt_one_minus_a_t[i],
            sched.gates[i] if g is None else g,
        )

    have_hist = bool(assume_history)
    if peel_first and stop > start:
        # first step outside the scan: order-1 pseudo improved Euler with
        # its extra model call lives here, so the scan body below carries a
        # single UNet instance
        tb, tnb, a_t, a_prev, sqrt_1m, gate = make_step_inputs(start)
        fn = lambda xx, tt: model_fn(xx, tt, gate).astype(jnp.float32)
        e_t = fn(x, tb)
        e_prime = _e_t_prime(
            fn, x, e_t, hist, jnp.int32(0), (tb, tnb, a_t, a_prev, sqrt_1m)
        )
        x = _x_prev(x, e_prime, a_t, a_prev, sqrt_1m)
        hist = jnp.concatenate([hist[1:], e_t[None]], axis=0)
        n_hist = jnp.int32(1)
        start = start + 1
        have_hist = True
        if start == stop:
            return x, hist, n_hist

    # segment [start, stop) by static gate runs (one scan per run); a
    # single full-range segment with traced gates otherwise
    if static_gates is not None:
        segments = []
        off = 0
        for g, n in static_gates:
            s0, s1 = max(start, off), min(stop, off + n)
            if s1 > s0:
                segments.append((s0, s1, g))
            off += n
        if off < stop:
            raise ValueError(
                f"static_gates {static_gates} cover {off} steps < stop={stop}"
            )
    else:
        segments = [(start, stop, None)]

    def run_segment(carry, s0, s1, gate_static, skip1):
        x, hist, n_hist = carry
        arrays = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a[s0:s1]),
            (sched.ts, sched.ts_next, sched.a_t, sched.a_prev,
             sched.sqrt_one_minus_a_t, sched.gates),
        )

        def step(carry, per_step):
            x, hist, n_hist = carry
            ts, ts_next, a_t, a_prev, sqrt_1m, gate_traced = per_step
            gate = gate_traced if gate_static is None else gate_static
            tb = jnp.full((b,), ts, jnp.int32)
            fn = lambda xx, tt: model_fn(xx, tt, gate).astype(jnp.float32)
            e_t = fn(x, tb)
            coeffs = (
                tb, jnp.full((b,), ts_next, jnp.int32), a_t, a_prev, sqrt_1m
            )
            e_prime = _e_t_prime(
                fn, x, e_t, hist, n_hist, coeffs, skip_order1=skip1
            )
            x = _x_prev(x, e_prime, a_t, a_prev, sqrt_1m)
            hist = jnp.concatenate([hist[1:], e_t[None]], axis=0)
            return (x, hist, jnp.minimum(n_hist + 1, 3)), None

        carry, _ = jax.lax.scan(step, (x, hist, n_hist), arrays)
        return carry

    carry = (x, hist, n_hist)
    for s0, s1, g in segments:
        carry = run_segment(carry, s0, s1, g, skip1=have_hist)
        have_hist = True
    return carry


def plms_sample(
    model_fn: ModelFn,
    sched: PLMSSchedule,
    x_init: jnp.ndarray,
    static_gates: tuple | None = None,
) -> jnp.ndarray:
    """Full PLMS sampling pass (plms.py:72-113). Jit the enclosing closure."""
    x, _, _ = plms_steps(
        model_fn, sched, x_init, 0, sched.num_steps,
        static_gates=static_gates,
    )
    return x


def build_cfg_model_fn(
    apply_eps,                       # apply_eps(x, t, context, grounding, gate) -> eps
    context: jnp.ndarray,            # (B, 77, D) conditional text
    uc_context: jnp.ndarray | None,  # (B, 77, D) unconditional / negative
    grounding: dict | None,
    null_grounding: dict | None,
    guidance_scale: float,
) -> ModelFn:
    """Fold classifier-free guidance into one batched 2B forward
    (vs the reference's two sequential model calls, plms.py:121-127;
    the uncond branch uses null grounding per openaimodel.py:483-487)."""
    if uc_context is None or guidance_scale == 1:
        def model_fn(x, t, gate):
            return apply_eps(x, t, context, grounding, gate)
        return model_fn

    ctx2 = jnp.concatenate([context, uc_context], axis=0)
    if grounding is not None and null_grounding is not None:
        g2 = {
            k: jnp.concatenate([grounding[k], null_grounding[k]], axis=0)
            for k in grounding
        }
    else:
        g2 = None

    def model_fn(x, t, gate):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        eps2 = apply_eps(x2, t2, ctx2, g2, gate)
        e_cond, e_uncond = jnp.split(eps2, 2, axis=0)
        return e_uncond + guidance_scale * (e_cond - e_uncond)

    return model_fn
