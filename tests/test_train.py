"""Training stack: trainable-param selection invariant, optimizer masking,
EMA, checkpoint save/restore roundtrip, LR warmup."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instancediffusion_tpu.config import (
    Config, TextEncoderConfig, UNetConfig, UniFusionConfig, VAEConfig,
)
from instancediffusion_tpu.train import optimizer as opt_mod


def tiny_cfg():
    gcfg = UniFusionConfig(
        in_dim=16, out_dim=16, mid_dim=16, fourier_freqs=2,
        fourier_freqs_polygons=2, n_scribble_points=2, n_polygon_points=4,
        seg_channels=2, seg_resize_input=64,
    )
    return Config(
        model=UNetConfig(
            image_size=8, model_channels=32, num_heads=4, context_dim=16,
            max_objs=2, grounding_tokenizer=gcfg,
        ),
        autoencoder=VAEConfig(ch=32, ch_mult=(1, 2), resolution=32),
        text_encoder=TextEncoderConfig(
            vocab_size=128, hidden_size=16, intermediate_size=32,
            num_hidden_layers=1, num_attention_heads=2,
        ),
    )


@pytest.fixture(scope="module")
def unet_params():
    from instancediffusion_tpu.models import unet

    cfg = tiny_cfg()
    return unet.init_unet(jax.random.PRNGKey(0), cfg.model), cfg


def test_trainable_mask_selects_new_params_only(unet_params):
    """Only fuser / position_net / scaleu train (utils/optimizer.py:15-42);
    everything else is frozen SD1.5 — incl. the stock first conv."""
    params, _ = unet_params
    mask = opt_mod.trainable_mask(params)

    def paths(tree, mark, prefix=""):
        out = []
        if isinstance(tree, dict):
            for k in tree:
                out += paths(tree[k], mark[k], f"{prefix}/{k}")
        elif isinstance(tree, list):
            for i, t in enumerate(tree):
                out += paths(t, mark[i], f"{prefix}/{i}")
        else:
            out.append((prefix, mark))
        return out

    for path, m in paths(params, mask):
        expected = any(s in path for s in ("fuser", "position_net", "scaleu"))
        assert m == expected, path
    # sanity: the frozen set includes the first conv + attn1/attn2 + out
    assert opt_mod.count_trainable(params) > 0


def test_masked_update_freezes_frozen(unet_params):
    params, _ = unet_params
    tx = opt_mod.make_optimizer(learning_rate=1e-2, warmup_steps=0, params=params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    mask = opt_mod.trainable_mask(params)
    leaves = zip(
        jax.tree_util.tree_leaves(updates), jax.tree_util.tree_leaves(mask)
    )
    for u, m in leaves:
        if m:
            assert float(jnp.abs(u).max()) > 0
        else:
            assert float(jnp.abs(u).max()) == 0


def test_ema_lerp():
    ema = {"a": jnp.ones(3)}
    p = {"a": jnp.zeros(3)}
    out = opt_mod.update_ema(ema, p, rate=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.9)


def test_warmup_schedule():
    import optax

    tx = opt_mod.make_optimizer(learning_rate=1.0, warmup_steps=10)
    del tx
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, 1.0, 10), optax.constant_schedule(1.0)], [10]
    )
    assert float(sched(0)) == 0.0
    assert abs(float(sched(5)) - 0.5) < 1e-6
    assert float(sched(100)) == 1.0


def test_checkpoint_roundtrip(tmp_path):
    from instancediffusion_tpu.io import checkpoint as ckpt_io
    from instancediffusion_tpu.train.train_step import TrainState

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    state = TrainState(
        step=jnp.int32(42), unet_params=params, ema_params=params,
        opt_state={"m": jnp.zeros((2, 3))}, vae_params=None, clip_params=None,
    )
    folder, prev = ckpt_io.expt_folder_with_auto_resume(str(tmp_path), "run")
    assert prev is None and folder.endswith("tag00")
    ckpt_io.save_train_ckpt(folder, state, {"note": "test"})

    # fresh template restores
    blank = state._replace(
        step=jnp.int32(0),
        unet_params={"w": jnp.zeros((2, 3))},
        ema_params={"w": jnp.zeros((2, 3))},
        opt_state={"m": jnp.ones((2, 3))},
    )
    folder2, prev2 = ckpt_io.expt_folder_with_auto_resume(str(tmp_path), "run")
    assert prev2 is not None and folder2.endswith("tag01")
    restored = ckpt_io.restore_train_ckpt(prev2, blank)
    assert int(restored.step) == 42
    np.testing.assert_allclose(
        np.asarray(restored.unet_params["w"]), np.arange(6.0).reshape(2, 3)
    )
