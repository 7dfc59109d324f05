"""ZeRO-1 (parallel/zero.py): sharding AdamW moments + EMA over 'data'
must change WHERE the optimizer state lives, not WHAT the step computes.
Checks, on the conftest's 8-device virtual CPU platform:
  * bitwise-level equivalence of loss + updated trainable params vs the
    replicated-state run (the reference's DDP semantics,
    utils/dist.py:29-37, which test_parallel pins against 1 device)
  * the moments really are sharded: per-device shard bytes ~= 1/8 of the
    leaf, and the sharding survives the step (donation-compatible)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instancediffusion_tpu.parallel.mesh import (
    data_sharding, make_mesh, replicated,
)
from instancediffusion_tpu.parallel.zero import (
    leaf_zero_sharding, train_state_shardings, zero_shardings,
)
from tests.test_parallel import make_batch, micro_cfg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def test_leaf_policy():
    mesh = make_mesh(devices=jax.devices()[:8])
    s = leaf_zero_sharding(mesh, jnp.zeros((16, 3)))
    assert s.spec == jax.sharding.PartitionSpec("data")
    # first divisible dim wins; 7 is not divisible by 8
    s = leaf_zero_sharding(mesh, jnp.zeros((7, 24)))
    assert s.spec == jax.sharding.PartitionSpec(None, "data")
    # scalars / indivisible stay replicated
    assert leaf_zero_sharding(mesh, jnp.zeros(())).spec == \
        jax.sharding.PartitionSpec()
    assert leaf_zero_sharding(mesh, jnp.zeros((3, 5))).spec == \
        jax.sharding.PartitionSpec()


def _run_step(cfg, diffusion, batch, state0, zero1):
    from instancediffusion_tpu.train.optimizer import (
        make_optimizer, trainable_mask,
    )
    from instancediffusion_tpu.train.train_step import make_train_step

    mesh = make_mesh(devices=jax.devices()[:8])
    tx = make_optimizer(learning_rate=1e-3, params=state0.unet_params)
    state = state0._replace(opt_state=tx.init(state0.unet_params))
    sh = train_state_shardings(mesh, state, zero1=zero1)
    state = jax.device_put(state, sh)
    step = jax.jit(
        make_train_step(cfg, diffusion, tx, compute_dtype=jnp.float32),
        out_shardings=(sh, None),
    )
    batch = {k: jax.device_put(v, data_sharding(mesh)) for k, v in batch.items()}
    rng = jax.device_put(jax.random.PRNGKey(7), replicated(mesh))
    new_state, metrics = step(state, batch, rng)
    mask = trainable_mask(new_state.unet_params)
    trained = [
        np.asarray(p)
        for p, m in zip(
            jax.tree_util.tree_leaves(new_state.unet_params),
            jax.tree_util.tree_leaves(mask),
        )
        if m
    ]
    return float(metrics["loss"]), trained, new_state


@pytest.mark.slow
def test_zero1_matches_replicated():
    from instancediffusion_tpu.ops.schedules import make_diffusion_schedule
    from instancediffusion_tpu.train.train_step import init_train_state

    cfg = micro_cfg()
    diffusion = make_diffusion_schedule(
        cfg.diffusion.beta_schedule, cfg.diffusion.timesteps,
        cfg.diffusion.linear_start, cfg.diffusion.linear_end,
    )
    batch = make_batch(cfg, b=8)
    state0 = init_train_state(cfg, seed=0)

    loss_r, p_r, _ = _run_step(cfg, diffusion, batch, state0, zero1=False)
    loss_z, p_z, st_z = _run_step(cfg, diffusion, batch, state0, zero1=True)

    assert np.isfinite(loss_r)
    np.testing.assert_allclose(loss_z, loss_r, rtol=1e-6)
    for a, b_ in zip(p_r, p_z):
        np.testing.assert_allclose(b_, a, rtol=1e-5, atol=1e-7)

    # the updated moments came back sharded: find a divisible fp32 moment
    # leaf and check its per-device shard is 1/8 of the full leaf
    sharded = [
        a for a in jax.tree_util.tree_leaves(st_z.opt_state)
        if hasattr(a, "sharding") and a.ndim > 0
        and any(s >= 8 and s % 8 == 0 for s in a.shape)
    ]
    assert sharded, "no shardable moment leaves found"
    for a in sharded[:4]:
        shard = a.addressable_shards[0].data
        assert shard.size * 8 == a.size, (a.shape, shard.shape)


def test_zero_shardings_tree_structure():
    mesh = make_mesh(devices=jax.devices()[:8])
    tree = {"a": jnp.zeros((8, 4)), "b": (jnp.zeros(()), jnp.zeros((24,)))}
    sh = zero_shardings(mesh, tree)
    assert sh["a"].spec == jax.sharding.PartitionSpec("data")
    assert sh["b"][0].spec == jax.sharding.PartitionSpec()
    assert sh["b"][1].spec == jax.sharding.PartitionSpec("data")
