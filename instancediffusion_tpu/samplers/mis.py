"""Multi-Instance Sampler (MIS) — per-instance latent trajectories.

Re-design of PLMSSamplerInst (ldm/models/diffusion/plms_instance.py:7-213):
for the first `mis_step = int(S * mis)` steps, each of the (k+1) inputs
(global + one per instance) is denoised independently from the SAME starting
noise with single-instance conditioning; latents are then averaged and
global-conditioned PLMS continues, REUSING trajectory-0's eps history across
the merge (plms_instance.py:108-109).

TPU-first: the reference runs (k+1) sequential Python trajectory loops
(plms_instance.py:86-104); here all trajectories fold into the batch axis of
ONE lax.scan — the UNet sees batch (k+1)*B*(2 for CFG), keeping the MXU fed,
and the whole sampler jits as a single graph.

The crop-and-paste merge variant (plms_instance.py:112-132, flag off
upstream) is provided as merge="crop" for completeness.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from instancediffusion_tpu.samplers.plms import PLMSSchedule, plms_steps

# traj_model_fn operates on the trajectory-stacked batch ((K+1)*B, H, W, C)
TrajModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def mis_sample(
    traj_model_fn: TrajModelFn,
    global_model_fn: Callable,
    sched: PLMSSchedule,
    x_init: jnp.ndarray,       # (B, H, W, C) shared starting noise
    num_traj: int,             # k+1 (global + k instances)
    mis_fraction: float | None = None,
    merge: str = "mean",
    boxes01: jnp.ndarray | None = None,  # (k, 4) xyxy in [0,1], for merge="crop"
    mis_step: int | None = None,         # overrides mis_fraction when given
    traj_weights: jnp.ndarray | None = None,  # (num_traj, B) 0/1: which
    # trajectories are real per image. Batched eval pads every image to a
    # static trajectory count (images have varying instance counts k_i);
    # padding trajectories denoise with null conditioning and MUST NOT
    # enter the merge mean. None = all real (the single-meta path).
    static_gates: tuple | None = None,  # plms.gate_runs RLE (trace-time
    # gate resolution — no lax.cond in the step bodies)
) -> jnp.ndarray:
    s = sched.num_steps
    if mis_step is None:
        mis_step = int(s * mis_fraction)
    if mis_step == 0 or num_traj <= 1:
        x, _, _ = plms_steps(
            global_model_fn, sched, x_init, 0, s, static_gates=static_gates
        )
        return x

    b = x_init.shape[0]
    # all trajectories start from the same noise (plms_instance.py:70-74)
    x_stack = jnp.tile(x_init, (num_traj, 1, 1, 1))  # ((K+1)*B, H, W, C)

    # Phase 1: one scan over the stacked batch
    x_stack, hist, n_hist = plms_steps(
        traj_model_fn, sched, x_stack, 0, mis_step,
        static_gates=static_gates,
    )

    xs = x_stack.reshape(num_traj, b, *x_init.shape[1:])
    if merge == "crop" and boxes01 is not None:
        # paste each instance trajectory's box crop over the global latent
        # (plms_instance.py:112-132). The reference slices with
        # int(box*latent) bounds — data-dependent shapes that can't jit; a
        # traced box-raster select is numerically identical and compiles.
        # NOTE reference indexes rows by bbox x, cols by y — reproduced.
        latent = x_init.shape[1]
        x = xs[0]
        for j in range(1, num_traj):
            m = _box_paste_mask(boxes01[j - 1], latent)
            x = jnp.where(m[None, :, :, None], xs[j], x)
    elif traj_weights is None:
        x = jnp.mean(xs, axis=0)
    else:
        # weighted mean over REAL trajectories only (reference averages the
        # k+1 live trajectories, plms_instance.py:134-135; here k varies
        # per image inside the batch)
        w = traj_weights[:, :, None, None, None].astype(xs.dtype)
        x = jnp.sum(xs * w, axis=0) / jnp.sum(w, axis=0)

    # Phase 2: global conditioning, trajectory-0 history carried over;
    # mis_step >= 1 guarantees history exists, so the order-1 branch (and
    # its extra in-scan UNet instance) is compiled out
    hist0 = hist.reshape(3, num_traj, b, *x_init.shape[1:])[:, 0]
    x, _, _ = plms_steps(
        global_model_fn, sched, x, mis_step, s, hist=hist0, n_hist=n_hist,
        assume_history=True, static_gates=static_gates,
    )
    return x


def _box_paste_mask(box01: jnp.ndarray, latent: int) -> jnp.ndarray:
    """(4,) xyxy in [0,1] -> (latent, latent) bool paste mask with the
    reference's exact bounds: int(x*latent) floor, rows = x, cols = y
    (plms_instance.py:110-125)."""
    px = jnp.floor(box01 * latent).astype(jnp.int32)
    r = jnp.arange(latent)
    row_in = (r >= px[0]) & (r < px[2])
    col_in = (r >= px[1]) & (r < px[3])
    return row_in[:, None] & col_in[None, :]


def stack_groundings(groundings: list[dict]) -> dict:
    """Concatenate per-trajectory grounding dicts along batch."""
    keys = groundings[0].keys()
    return {k: jnp.concatenate([g[k] for g in groundings], axis=0) for k in keys}
