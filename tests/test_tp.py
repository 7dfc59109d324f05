"""Tensor-parallel UNet forward (parallel/tp.py) vs the replicated forward.

On the conftest's 8-device virtual CPU platform: a (data=4, model=2) mesh
must reproduce the single-jit forward — heads/FF columns sharded over
'model' with manual psums at the row-parallel projections, batch over
'data'. Also pins the GEGLU column interleave in isolation (the one
transform that would silently corrupt outputs if the layout assumption in
models/unet._apply_ff_geglu changed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instancediffusion_tpu.models import unet, unifusion
from instancediffusion_tpu.parallel.mesh import make_mesh
from instancediffusion_tpu.parallel import tp
from tests.test_parallel import micro_cfg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _inputs(cfg, b=8, seed=3):
    mcfg = cfg.model
    r = np.random.RandomState(seed)
    x = r.randn(b, mcfg.image_size, mcfg.image_size, mcfg.in_channels)
    t = r.randint(0, 1000, (b,))
    ctx = r.randn(b, 77, mcfg.context_dim)
    g = unifusion.null_grounding(b, mcfg.max_objs, mcfg.grounding_tokenizer)
    return (
        jnp.asarray(x, jnp.float32), jnp.asarray(t, jnp.int32),
        jnp.asarray(ctx, jnp.float32), g,
    )


@pytest.mark.heavy
def test_tp_forward_matches_replicated():
    cfg = micro_cfg()
    mcfg = cfg.model
    params = unet.init_unet(jax.random.PRNGKey(0), mcfg)
    x, t, ctx, g = _inputs(cfg)
    objs, _ = unifusion.apply_unifusion(
        params["position_net"], mcfg.grounding_tokenizer, g,
        unifusion.ModalityDrops.test_defaults(mcfg.grounding_tokenizer),
    )

    ref = jax.jit(
        lambda p, x, t, c, o: unet.apply_unet(
            p, mcfg, x, t, c, None, gate_scale=1.0, precomputed_objs=o
        )
    )(params, x, t, ctx, objs)

    mesh = make_mesh(n_data=4, n_model=2)
    out = jax.jit(
        lambda p, x, t, c, o: tp.tp_apply_unet(
            mesh, mcfg, p, x, t, c, o, gate_scale=1.0
        )
    )(params, x, t, ctx, objs)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6
    )


def test_geglu_interleave_roundtrip():
    """shuffle_ffn_params must reorder columns such that a contiguous
    per-rank shard holds matched [a_r | gate_r] halves: simulate the
    sharded compute by hand and compare against the unsharded GEGLU."""
    r = np.random.RandomState(0)
    d, inner, tp_size = 6, 8, 2
    w1 = jnp.asarray(r.randn(d, 2 * inner), jnp.float32)
    b1 = jnp.asarray(r.randn(2 * inner), jnp.float32)
    w2 = jnp.asarray(r.randn(inner, d), jnp.float32)
    b2 = jnp.asarray(r.randn(d), jnp.float32)
    x = jnp.asarray(r.randn(3, d), jnp.float32)

    gelu = jax.nn.gelu
    h = x @ w1 + b1
    a, gate = jnp.split(h, 2, axis=-1)
    ref = (a * gelu(gate)) @ w2 + b2

    fake = {"ff": {"proj": {"w": w1, "b": b1}, "out": {"w": w2, "b": b2}}}
    shuf = tp.shuffle_ffn_params(fake, tp_size)
    w1s, b1s = shuf["ff"]["proj"]["w"], shuf["ff"]["proj"]["b"]
    acc = 0.0
    width = 2 * inner // tp_size
    for rank in range(tp_size):
        wl = w1s[:, rank * width:(rank + 1) * width]
        bl = b1s[rank * width:(rank + 1) * width]
        hl = x @ wl + bl
        al, gl = jnp.split(hl, 2, axis=-1)
        w2l = w2[rank * (inner // tp_size):(rank + 1) * (inner // tp_size)]
        acc = acc + (al * gelu(gl)) @ w2l
    np.testing.assert_allclose(np.asarray(acc + b2), np.asarray(ref), rtol=1e-5)


@pytest.mark.slow
def test_tp_gradients_match_replicated():
    """TP is differentiable as-is: shard_map transposes the forward psums
    into the correct backward collectives, so a loss gradient through the
    tensor-parallel forward must equal the replicated gradient (column/row
    shards of it, gathered). Pins the property that makes TP usable for
    training larger family members, not just serving."""
    cfg = micro_cfg()
    mcfg = cfg.model
    params = unet.init_unet(jax.random.PRNGKey(0), mcfg)
    x, t, ctx, g = _inputs(cfg, b=8, seed=5)
    objs, _ = unifusion.apply_unifusion(
        params["position_net"], mcfg.grounding_tokenizer, g,
        unifusion.ModalityDrops.test_defaults(mcfg.grounding_tokenizer),
    )
    target = jnp.ones_like(x)

    def loss_ref(p):
        eps = unet.apply_unet(
            p, mcfg, x, t, ctx, None, gate_scale=1.0, precomputed_objs=objs
        )
        return jnp.mean((eps - target) ** 2)

    mesh = make_mesh(n_data=4, n_model=2)

    def loss_tp(p):
        eps = tp.tp_apply_unet(mesh, mcfg, p, x, t, ctx, objs, gate_scale=1.0)
        return jnp.mean((eps - target) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_tp = jax.jit(jax.grad(loss_tp))(params)
    # compare a few leaves spanning all sharding classes: column-parallel
    # (to_q), row-parallel (to_out), GEGLU (interleave + row), replicated
    # (conv); full-tree compare via max abs err
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_t = dict(
        (tp._path_str(path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(g_tp)
    )
    worst = 0.0
    for path, leaf in flat_r:
        other = flat_t[tp._path_str(path)]
        err = float(jnp.max(jnp.abs(other - leaf)))
        scale = float(jnp.max(jnp.abs(leaf))) + 1e-8
        worst = max(worst, err / scale)
    assert worst < 5e-5, f"worst relative grad err {worst}"


def test_param_specs_shapes():
    cfg = micro_cfg().model
    params = unet.init_unet(jax.random.PRNGKey(0), cfg)
    specs = tp.param_specs(params)
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_s = dict(
        (tp._path_str(path), s)
        for path, s in jax.tree_util.tree_leaves_with_path(specs)
    )
    n_col = n_row = 0
    for path, leaf in flat_p:
        ps = tp._path_str(path)
        s = flat_s[ps]
        if s == jax.sharding.PartitionSpec(None, "model"):
            n_col += 1
            assert leaf.ndim == 2
        elif s == jax.sharding.PartitionSpec("model"):
            n_row += 1
    assert n_col > 0 and n_row > 0


@pytest.mark.slow
def test_pipeline_generate_batch_tp():
    """Serving-surface TP: generate_batch on a (4 data x 2 model) mesh must
    reproduce the plain data-sharded images (same seeds). uint8 outputs may
    differ by 1 at quantization boundaries under psum reordering."""
    import instancediffusion_tpu.data.grounding_input as gi
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline
    from tests.test_pipeline import tiny_config

    cfg = tiny_config()
    pipe = InstanceDiffusionPipeline.random_init(cfg, seed=0)
    g = cfg.model.grounding_tokenizer
    metas = [
        {
            "prompt": "a red box and a blue box",
            "phrases": ["a red box", "a blue box"],
            "locations": [[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]],
        },
        {
            "prompt": "one green circle",
            "phrases": ["a green circle"],
            "locations": [[0.3, 0.3, 0.7, 0.7]],
        },
    ]
    # tiny config has shorter scribble/polygon/seg dims (test_pipeline's
    # established pattern): point the prep constants at the tiny geometry
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    try:
        kw = dict(steps=2, seeds=[3, 4], compute_dtype=jnp.float32)
        ref = pipe.generate_batch(metas, mesh=make_mesh(n_data=8), **kw)
        out = pipe.generate_batch(
            metas, mesh=make_mesh(n_data=4, n_model=2), **kw
        )
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old
    assert out.shape == ref.shape
    diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    assert (diff <= 1).mean() > 0.9999, f"large pixel diffs: {(diff > 1).mean():.2%}"
    assert (diff == 0).mean() > 0.99, f"only {(diff == 0).mean():.2%} exact"
