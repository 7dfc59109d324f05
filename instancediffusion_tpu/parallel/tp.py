"""Tensor parallelism for the UNet's transformer stack ('model' mesh axis).

Megatron-style head/column sharding (Shoeybi et al. 2019), done the TPU
way: `shard_map` over a ("data", "model") mesh so every rank — and every
Pallas flash kernel — sees ordinary local shapes, with exactly two
hand-placed collectives per transformer block:

  column-parallel: to_q/to_k/to_v and the GEGLU up-projection are sharded
    on their OUTPUT dim — each model-rank owns H/tp heads (resp. 1/tp of
    the FF inner width) and computes attention/GEGLU for them locally, no
    communication.
  row-parallel: to_out and the GEGLU down-projection are sharded on their
    INPUT dim — local matmuls yield partial sums; one `psum` over 'model'
    per projection (models/unet._row_parallel_linear) completes them, and
    the (replicated) bias is added after the psum.

Everything outside the transformer blocks — convs, res blocks, norms,
time embedding, ScaleU — stays replicated over 'model' (redundant compute;
at SD1.5 scale attention+FF is ~60% of FLOPs, so tp=2 saves ~30% of
per-rank work). That trade is intentional: TP here is the scaling lever
for the *larger* family members (SDXL-Refiner's 2.6B UNet and up), where
one chip's HBM or latency budget runs out — the reference has no model
parallelism at all (its DDP replicates everything, utils/dist.py:13-37).

GEGLU interleave: the up-projection emits [a | gate] concatenated, so a
naive contiguous column shard would give rank 0 only `a` columns and rank
tp-1 only `gate` columns. `shuffle_ffn_params` re-orders the columns
host-side into per-rank [a_r | gate_r] blocks so the local
`jnp.split(h, 2, axis=-1)` (models/unet._apply_ff_geglu) stays correct;
the down-projection's rows already shard contiguously.

Equivalence vs the replicated forward is pinned in tests/test_tp.py on a
(data=4, model=2) virtual mesh.
"""

from __future__ import annotations

import dataclasses
from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# ---------------------------------------------------------------------------
# TP context: set while tracing inside shard_map; models/unet's row-parallel
# projections psum over this axis when it is set.
# ---------------------------------------------------------------------------

_AXIS: list[str | None] = [None]


def axis() -> str | None:
    return _AXIS[-1]


@contextmanager
def tp_context(axis_name: str):
    _AXIS.append(axis_name)
    try:
        yield
    finally:
        _AXIS.pop()


# ---------------------------------------------------------------------------
# Parameter partition specs + the GEGLU column interleave
# ---------------------------------------------------------------------------


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


def param_specs(params, axis_name: str = "model"):
    """PartitionSpec pytree for a UNet param tree: attention qkv + FF up
    column-sharded, to_out + FF down row-sharded, everything else
    replicated."""

    def spec(path, leaf):
        ps = _path_str(path)
        if ps.endswith(("to_q/w", "to_k/w", "to_v/w")):
            return P(None, axis_name)
        if ps.endswith("to_out/w"):
            return P(axis_name)
        if ps.endswith("ff/proj/w"):
            return P(None, axis_name)
        if ps.endswith("ff/proj/b"):
            return P(axis_name)
        if ps.endswith("ff/out/w"):
            return P(axis_name)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shuffle_ffn_params(params, tp_size: int):
    """Host-side GEGLU column interleave (see module docstring). Only the
    sharded copy of the params may be shuffled — the result is WRONG for an
    unsharded apply. No-op at tp_size=1."""
    if tp_size == 1:
        return params

    def fix(path, leaf):
        ps = _path_str(path)
        if ps.endswith("ff/proj/w"):
            d, i2 = leaf.shape
            inner = i2 // 2
            return (
                leaf.reshape(d, 2, tp_size, inner // tp_size)
                .transpose(0, 2, 1, 3)
                .reshape(d, i2)
            )
        if ps.endswith("ff/proj/b"):
            i2 = leaf.shape[0]
            inner = i2 // 2
            return (
                leaf.reshape(2, tp_size, inner // tp_size)
                .transpose(1, 0, 2)
                .reshape(i2)
            )
        return leaf

    return jax.tree_util.tree_map_with_path(fix, params)


# ---------------------------------------------------------------------------
# The sharded forward
# ---------------------------------------------------------------------------


def tp_apply_unet(
    mesh: Mesh,
    cfg,
    params,
    x,
    timesteps,
    context,
    objs,
    *,
    gate_scale=1.0,
    fuser_mask=None,
    attn_impl: str = "auto",
    model_axis: str = "model",
    data_axis: str = "data",
    pre_shuffled: bool = False,
):
    """apply_unet over a (data, model) mesh: batch sharded over `data_axis`,
    transformer heads/FF width sharded over `model_axis`.

    `params` must be the raw (unshuffled) tree — the GEGLU interleave is
    applied here. `objs` are precomputed grounding tokens
    (unifusion.apply_unifusion output): UniFusion is timestep-invariant and
    tiny, so it runs replicated outside the TP region, exactly like the
    samplers hoist it out of the scan."""
    from jax.experimental.shard_map import shard_map

    from instancediffusion_tpu.models import unet

    tp_size = mesh.shape[model_axis]
    assert cfg.num_heads % tp_size == 0, (
        f"num_heads={cfg.num_heads} not divisible by tp={tp_size}"
    )
    cfg_local = dataclasses.replace(cfg, num_heads=cfg.num_heads // tp_size)
    if not pre_shuffled:
        # callers invoking this inside a sampling scan should shuffle ONCE
        # outside the scan (pre_shuffled=True) — the shuffle is
        # params-only, and XLA does not reliably hoist it out of loop
        # bodies
        params = shuffle_ffn_params(params, tp_size)

    pspecs = param_specs(params, model_axis)
    d = P(data_axis)
    mask_specs = jax.tree_util.tree_map(lambda _: d, fuser_mask)

    # a traced gate (the >3-run alpha-schedule fallback) cannot be closed
    # over by the shard_map body — pass it as a replicated argument; a
    # Python-float gate stays a closure constant so apply_unet resolves
    # the fuser branch at trace time (the static-gate fast path)
    static_gate = isinstance(gate_scale, (int, float))

    def body(p, x, t, ctx, objs, fmask, gate):
        with tp_context(model_axis):
            return unet.apply_unet(
                p, cfg_local, x, t, ctx, None,
                gate_scale=gate_scale if static_gate else gate[0],
                fuser_mask=fmask, precomputed_objs=objs, attn_impl=attn_impl,
            )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(pspecs, d, d, d, d, mask_specs, P()),
        out_specs=d,
        check_rep=False,
    )
    gate_arg = (
        jnp.zeros((1,), jnp.float32) if static_gate
        else jnp.asarray(gate_scale, jnp.float32).reshape(1)
    )
    return fn(params, x, timesteps, context, objs, fuser_mask, gate_arg)
