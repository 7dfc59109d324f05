"""SDXL-Refiner native model family: plan/shape tests on a scaled-down
config, ADM conditioning vector, converter mapping self-consistency, and
the img2img schedule slicing. (No pretrained SDXL assets exist in this
environment, and the reference itself only calls diffusers externally —
inference.py:112-129 — so there is no golden parity source; the shared
res/attention/FF builders are golden-tested via the SD1.5 parity suite.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instancediffusion_tpu.config import OpenCLIPTextConfig, RefinerUNetConfig
from instancediffusion_tpu.models.sdxl_refiner import (
    apply_refiner_unet, build_refiner_plan, init_refiner_unet,
    refiner_adm_vector,
)

TINY = RefinerUNetConfig(
    model_channels=32, attention_resolutions=(4, 2), num_res_blocks=1,
    channel_mult=(1, 2, 4), num_head_channels=16, transformer_depth=2,
    context_dim=64, adm_in_channels=96,
)


def test_refiner_plan_structure():
    """Full-size plan mirrors sd_xl_refiner.yaml: attention only at ds 2
    and 4 (+ middle at ds 8), depth-4 transformers, channels 384*(1,2,4,4)."""
    cfg = RefinerUNetConfig()
    inp, mid, out = build_refiner_plan(cfg)
    attn_ds = sorted({s.ds for blk in inp + out for s in blk if s.kind == "attn"})
    assert attn_ds == [2, 4]
    assert [s.kind for s in mid] == ["res", "attn", "res"]
    assert mid[1].ds == 8
    assert inp[0][0].out_ch == 384
    assert mid[0].in_ch == 1536
    # 3 levels with attention pairs in the encoder: levels 1 and 2
    n_attn_in = sum(1 for blk in inp for s in blk if s.kind == "attn")
    n_attn_out = sum(1 for blk in out for s in blk if s.kind == "attn")
    assert n_attn_in == 4 and n_attn_out == 6


@pytest.mark.heavy
def test_refiner_forward_shape_and_finite():
    cfg = TINY
    params = init_refiner_unet(jax.random.PRNGKey(0), cfg)
    b, hw = 2, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (b, hw, hw, 4))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 77, cfg.context_dim))
    pooled = jax.random.normal(
        jax.random.PRNGKey(3), (b, cfg.adm_in_channels - 5 * 256)
    ) if cfg.adm_in_channels > 5 * 256 else None
    y = jax.random.normal(jax.random.PRNGKey(3), (b, cfg.adm_in_channels))
    # jit: eager op-by-op dispatch of the 3-level UNet costs ~35 s on this
    # 1-core host; the jitted compile is persistent-cache-able (conftest)
    fwd = jax.jit(lambda p, x, t, ctx, y: apply_refiner_unet(
        p, cfg, x, t, ctx, y, attn_impl="xla"))
    out = fwd(params, x, t, ctx, y)
    assert out.shape == (b, hw, hw, 4)
    assert bool(jnp.isfinite(out).all())
    # zero-initialized final conv: fresh init predicts exactly zero
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_adm_vector():
    pooled = jnp.ones((2, 1280))
    y = refiner_adm_vector(pooled, (1024, 1024), (0, 0), 6.0)
    assert y.shape == (2, 2560)
    # sgm GeneralConditioner order: pooled text FIRST, fourier scalars after
    np.testing.assert_array_equal(np.asarray(y[:, :1280]), 1.0)
    # aesthetic score changes only the fourier half
    y2 = refiner_adm_vector(pooled, (1024, 1024), (0, 0), 2.5)
    assert not np.allclose(np.asarray(y[:, 1280:]), np.asarray(y2[:, 1280:]))
    np.testing.assert_array_equal(np.asarray(y2[:, :1280]), 1.0)


def _ldm_names_for(cfg):
    """Generate the LDM/sgm state-dict key set for a refiner UNet config
    (openaimodel naming conventions, verified for SD1.5 by the golden
    converter tests)."""
    import itertools
    names = {}

    def lin(p, din, dout, bias=True):
        names[p + ".weight"] = (dout, din)
        if bias:
            names[p + ".bias"] = (dout,)

    def conv(p, cin, cout, k):
        names[p + ".weight"] = (cout, cin, k, k)
        names[p + ".bias"] = (cout,)

    def norm(p, c):
        names[p + ".weight"] = (c,)
        names[p + ".bias"] = (c,)

    def res(p, cin, cout, emb):
        norm(p + ".in_layers.0", cin)
        conv(p + ".in_layers.2", cin, cout, 3)
        lin(p + ".emb_layers.1", emb, cout)
        norm(p + ".out_layers.0", cout)
        conv(p + ".out_layers.3", cout, cout, 3)
        if cin != cout:
            conv(p + ".skip_connection", cin, cout, 1)

    def tblock(p, c, ctx):
        for a, kv in (("attn1", c), ("attn2", ctx)):
            lin(f"{p}.{a}.to_q", c, c, bias=False)
            lin(f"{p}.{a}.to_k", kv, c, bias=False)
            lin(f"{p}.{a}.to_v", kv, c, bias=False)
            lin(f"{p}.{a}.to_out.0", c, c)
        lin(p + ".ff.net.0.proj", c, 8 * c)
        lin(p + ".ff.net.2", 4 * c, c)
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{p}.{n}", c)

    def spatial(p, c, ctx, depth):
        norm(p + ".norm", c)
        conv(p + ".proj_in", c, c, 1)
        for d in range(depth):
            tblock(f"{p}.transformer_blocks.{d}", c, ctx)
        conv(p + ".proj_out", c, c, 1)

    emb = cfg.model_channels * 4
    lin("time_embed.0", cfg.model_channels, emb)
    lin("time_embed.2", emb, emb)
    lin("label_emb.0.0", cfg.adm_in_channels, emb)
    lin("label_emb.0.2", emb, emb)
    inp, mid, outp = build_refiner_plan(cfg)
    for i, blk in enumerate(inp):
        for j, s in enumerate(blk):
            p = f"input_blocks.{i}.{j}"
            if s.kind == "conv_in":
                conv(p, s.in_ch, s.out_ch, 3)
            elif s.kind == "res":
                res(p, s.in_ch, s.out_ch, emb)
            elif s.kind == "attn":
                spatial(p, s.out_ch, cfg.context_dim, cfg.transformer_depth)
            elif s.kind == "down":
                conv(p + ".op", s.in_ch, s.out_ch, 3)
    for j, s in enumerate(mid):
        p = f"middle_block.{j}"
        if s.kind == "res":
            res(p, s.in_ch, s.out_ch, emb)
        else:
            spatial(p, s.out_ch, cfg.context_dim, cfg.transformer_depth)
    for i, blk in enumerate(outp):
        for j, s in enumerate(blk):
            p = f"output_blocks.{i}.{j}"
            if s.kind == "res":
                res(p, s.in_ch, s.out_ch, emb)
            elif s.kind == "attn":
                spatial(p, s.out_ch, cfg.context_dim, cfg.transformer_depth)
            elif s.kind == "up":
                conv(p + ".conv", s.in_ch, s.out_ch, 3)
    norm("out.0", cfg.model_channels)
    conv("out.2", cfg.model_channels, cfg.out_channels, 3)
    return names


def test_refiner_converter_self_consistent():
    """convert_refiner_unet consumes exactly the LDM key set and produces a
    pytree whose structure+shapes match init_refiner_unet's."""
    from instancediffusion_tpu.io.torch_convert import convert_refiner_unet

    cfg = TINY
    names = _ldm_names_for(cfg)
    rng = np.random.default_rng(0)
    sd = {k: rng.standard_normal(v).astype(np.float32) for k, v in names.items()}
    converted = convert_refiner_unet(sd, cfg)
    ref = init_refiner_unet(jax.random.PRNGKey(0), cfg)

    ref_leaves = jax.tree_util.tree_leaves_with_path(ref)
    conv_leaves = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(converted)
    )
    assert len(ref_leaves) == len(conv_leaves)
    for kp, v in ref_leaves:
        k = jax.tree_util.keystr(kp)
        assert k in conv_leaves, f"missing {k}"
        assert conv_leaves[k].shape == v.shape, (
            f"{k}: {conv_leaves[k].shape} != {v.shape}"
        )


def test_openclip_text_converter_and_forward():
    from instancediffusion_tpu.io.torch_convert import convert_openclip_text
    from instancediffusion_tpu.models import clip_text

    cfg = OpenCLIPTextConfig(
        vocab_size=128, max_length=16, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        projection_dim=48,
    )
    rng = np.random.default_rng(1)
    d = cfg.hidden_size
    sd = {
        "token_embedding.weight": rng.standard_normal((cfg.vocab_size, d)),
        "positional_embedding": rng.standard_normal((cfg.max_length, d)),
        "ln_final.weight": rng.standard_normal(d),
        "ln_final.bias": rng.standard_normal(d),
        "text_projection": rng.standard_normal((d, cfg.projection_dim)),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"transformer.resblocks.{i}"
        sd[p + ".ln_1.weight"] = rng.standard_normal(d)
        sd[p + ".ln_1.bias"] = rng.standard_normal(d)
        sd[p + ".attn.in_proj_weight"] = rng.standard_normal((3 * d, d))
        sd[p + ".attn.in_proj_bias"] = rng.standard_normal(3 * d)
        sd[p + ".attn.out_proj.weight"] = rng.standard_normal((d, d))
        sd[p + ".attn.out_proj.bias"] = rng.standard_normal(d)
        sd[p + ".ln_2.weight"] = rng.standard_normal(d)
        sd[p + ".ln_2.bias"] = rng.standard_normal(d)
        sd[p + ".mlp.c_fc.weight"] = rng.standard_normal((cfg.intermediate_size, d))
        sd[p + ".mlp.c_fc.bias"] = rng.standard_normal(cfg.intermediate_size)
        sd[p + ".mlp.c_proj.weight"] = rng.standard_normal((d, cfg.intermediate_size))
        sd[p + ".mlp.c_proj.bias"] = rng.standard_normal(d)
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    params = jax.tree_util.tree_map(jnp.asarray, convert_openclip_text(sd, cfg))
    ids = jnp.asarray(np.concatenate([
        np.arange(1, 15), [127, 0]
    ]).reshape(1, 16).astype(np.int32))
    out = clip_text.apply_clip_text(params, cfg, ids)
    assert out["penultimate_hidden_state"].shape == (1, 16, d)
    assert out["projected_pooled"].shape == (1, cfg.projection_dim)
    assert bool(jnp.isfinite(out["projected_pooled"]).all())


def test_img2img_schedule_slice():
    from instancediffusion_tpu.ops.schedules import make_diffusion_schedule
    from instancediffusion_tpu.samplers.ddim import make_ddim_schedule
    from instancediffusion_tpu.pipeline_refiner import _slice_schedule

    sched = make_ddim_schedule(make_diffusion_schedule(), 20)
    sl = _slice_schedule(sched, 7)
    assert sl.num_steps == 7
    # keeps the LOWEST-noise tail: timesteps strictly below the dropped ones
    assert sl.ts.max() < sched.ts[: 20 - 7].min()
    np.testing.assert_array_equal(sl.ts, sched.ts[13:])


@pytest.mark.heavy
def test_refiner_pipeline_tiny_e2e():
    """Full img2img path (VAE encode -> noise -> CFG DDIM -> decode) on a
    scaled-down refiner; exercises tokenizer, OpenCLIP tower, ADM vector,
    schedule slicing, and the jitted sampler."""
    from instancediffusion_tpu.config import VAEConfig
    from instancediffusion_tpu.models import clip_text, vae
    from instancediffusion_tpu.pipeline_refiner import (
        RefinerParams, SDXLRefinerPipeline,
    )

    ucfg = RefinerUNetConfig(
        model_channels=32, attention_resolutions=(2,), num_res_blocks=1,
        channel_mult=(1, 2), num_head_channels=16, transformer_depth=1,
        context_dim=32, adm_in_channels=1280 + 48,
    )
    tcfg = OpenCLIPTextConfig(
        vocab_size=49408, max_length=77, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        projection_dim=48,
    )
    vcfg = VAEConfig(ch=32, ch_mult=(1, 1, 1, 1), scale_factor=0.13025)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = RefinerParams(
        unet=init_refiner_unet(k1, ucfg),
        vae=vae.init_vae(k2, vcfg),
        text=clip_text.init_clip_text(k3, tcfg),
    )
    # context_dim(32) != text hidden? refiner cross-attends penultimate
    # states of dim hidden_size — keep them equal in this tiny setup
    assert ucfg.context_dim == tcfg.hidden_size

    pipe = SDXLRefinerPipeline(params, ucfg, tcfg, vcfg)
    imgs = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = pipe.refine(imgs, "a photo of a cat", steps=4, strength=0.5, seed=1)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
