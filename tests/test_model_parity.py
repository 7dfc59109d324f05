"""Golden parity tests: our JAX models vs the PyTorch reference with
identical (randomized) weights copied via the production converter.

All reference zero-inits (proj_out, out conv, alpha gates) are randomized
first so every code path contributes to the output."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_compat import install_reference  # noqa: E402

install_reference()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancediffusion_tpu.config import UNetConfig, UniFusionConfig, VAEConfig  # noqa: E402
from instancediffusion_tpu.io import torch_convert as tc  # noqa: E402
from instancediffusion_tpu.models import convnext as cnx  # noqa: E402
from instancediffusion_tpu.models import unet as junet  # noqa: E402
from instancediffusion_tpu.models import unifusion as juni  # noqa: E402
from instancediffusion_tpu.models import vae as jvae  # noqa: E402


def randomize(module, seed=0, std=0.02):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * std)
    return module


def nchw(x):  # jax NHWC numpy -> torch NCHW tensor
    return torch.tensor(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def to_nhwc(t):  # torch NCHW -> numpy NHWC
    return np.moveaxis(t.detach().numpy(), 1, -1)


def test_convnext_parity():
    from ldm.modules.diffusionmodules.convnext import convnext_tiny

    ref = randomize(convnext_tiny(pretrained=False), seed=1).eval()
    params = tc.convert_convnext(tc.to_numpy_state_dict(ref.state_dict()))

    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 3).astype(np.float32)
    ours = np.asarray(
        jax.jit(cnx.apply_convnext_tiny)(params, jnp.asarray(x))
    )
    with torch.no_grad():
        theirs = to_nhwc(ref(nchw(x)))
    assert ours.shape == theirs.shape == (1, 2, 2, 768)
    # fp32 accumulation-order noise across ~15 conv/matmul layers
    np.testing.assert_allclose(ours, theirs, rtol=1e-2, atol=5e-4)


def _ref_unifusion(**over):
    from ldm.modules.diffusionmodules.text_grounding_net import UniFusion

    kwargs = dict(
        in_dim=64, out_dim=64, mid_dim=96,
        test_drop_boxes=False, test_drop_points=False,
        test_drop_scribbles=False, test_drop_masks=False,
    )
    kwargs.update(over)
    return UniFusion(**kwargs)


def _grounding(rng, b=1, n=30):
    return {
        "boxes": rng.rand(b, n, 4).astype(np.float32),
        "masks": (rng.rand(b, n) < 0.5).astype(np.float32),
        "positive_embeddings": rng.randn(b, n, 64).astype(np.float32),
        "scribbles": rng.rand(b, n, 40).astype(np.float32),
        "polygons": rng.rand(b, n, 512).astype(np.float32),
        "segs": (rng.rand(b, n, 512, 512) < 0.2).astype(np.float32),
        "points": rng.rand(b, n, 2).astype(np.float32),
    }


@pytest.mark.slow
def test_unifusion_parity():
    ref = randomize(_ref_unifusion(), seed=2).eval()
    cfg = UniFusionConfig(in_dim=64, out_dim=64, mid_dim=96,
                          test_drop_scribbles=False, test_drop_masks=False)
    params = tc.convert_unifusion(tc.to_numpy_state_dict(ref.state_dict()), cfg, prefix="")

    rng = np.random.RandomState(3)
    g = _grounding(rng)
    with torch.no_grad():
        ref_objs, ref_dbm = ref(
            boxes=torch.tensor(g["boxes"]), masks=torch.tensor(g["masks"]),
            positive_embeddings=torch.tensor(g["positive_embeddings"]),
            scribbles=torch.tensor(g["scribbles"]), polygons=torch.tensor(g["polygons"]),
            segs=torch.tensor(g["segs"]), points=torch.tensor(g["points"]),
        )
    gj = {k: jnp.asarray(v) for k, v in g.items()}
    fwd = jax.jit(
        lambda p, g: juni.apply_unifusion(
            p, cfg, g, juni.ModalityDrops.test_defaults(cfg)
        )
    )
    objs, dbm = fwd(params, gj)
    objs = np.asarray(objs)
    assert objs.shape == tuple(ref_objs.shape) == (1, 184, 64)
    assert bool(dbm) == bool(ref_dbm) == False  # noqa: E712
    np.testing.assert_allclose(objs, ref_objs.numpy(), rtol=1e-3, atol=5e-4)


def _mini_unet_pair(seed=4):
    from ldm.modules.diffusionmodules.openaimodel import UNetModel

    gt_params = dict(
        in_dim=64, out_dim=64, mid_dim=96,
        train_add_boxes=True, train_add_points=True,
        train_add_scribbles=True, train_add_masks=True,
        test_drop_boxes=False, test_drop_points=False,
        test_drop_scribbles=False, test_drop_masks=False,
        use_seperate_tokenizer=True,
    )
    ref = UNetModel(
        image_size=16, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=4, transformer_depth=1,
        context_dim=64, fuser_type="gatedSA", use_checkpoint=False,
        sd_v1_5=True, efficient_attention=False,
        grounding_tokenizer={
            "target": "ldm.modules.diffusionmodules.text_grounding_net.UniFusion",
            "params": gt_params,
        },
    )
    randomize(ref, seed=seed)
    ref.eval()

    gcfg = UniFusionConfig(in_dim=64, out_dim=64, mid_dim=96,
                           test_drop_scribbles=False, test_drop_masks=False)
    cfg = UNetConfig(
        image_size=16, model_channels=32, num_heads=4, context_dim=64,
        use_checkpoint=False, efficient_attention=False, grounding_tokenizer=gcfg,
    )
    params = tc.convert_unet(tc.to_numpy_state_dict(ref.state_dict()), cfg)
    return ref, cfg, params


@pytest.mark.slow
def test_unet_parity():
    ref, cfg, params = _mini_unet_pair()
    rng = np.random.RandomState(5)
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    t = np.array([981], dtype=np.int64)
    context = rng.randn(1, 7, 64).astype(np.float32)
    g = _grounding(rng)

    with torch.no_grad():
        ref_out = ref(
            {
                "x": nchw(x),
                "timesteps": torch.tensor(t),
                "context": torch.tensor(context),
                "grounding_input": {
                    k: torch.tensor(v)
                    for k, v in g.items()
                    if k != "positive_embeddings"
                }
                | {"positive_embeddings": torch.tensor(g["positive_embeddings"])},
            }
        )
    fwd = jax.jit(
        lambda p, x, t, c, g: junet.apply_unet(p, cfg, x, t, c, g, gate_scale=1.0)
    )
    ours = fwd(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(context),
        {k: jnp.asarray(v) for k, v in g.items()},
    )
    ours = np.asarray(ours)
    theirs = to_nhwc(ref_out)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_unet_parity_gate_zero_uses_sd_conv():
    """gate_scale==0 must route through the stock-SD first conv
    (plms.py:91-94 + openaimodel.py:469-480 semantics)."""
    _, cfg, params = _mini_unet_pair()
    # make the swap observable: perturb the stored SD conv
    params["first_conv_sd"]["w"] = params["first_conv_sd"]["w"] + 0.5
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    t = jnp.array([10])
    context = jnp.asarray(rng.randn(1, 7, 64).astype(np.float32))
    out1 = junet.apply_unet(params, cfg, x, t, context, None, gate_scale=1.0)
    out0 = junet.apply_unet(params, cfg, x, t, context, None, gate_scale=0.0)
    assert not np.allclose(np.asarray(out1), np.asarray(out0))


@pytest.mark.slow
def test_vae_parity():
    from ldm.models.autoencoder import AutoencoderKL

    ddconfig = dict(
        double_z=True, z_channels=4, resolution=64, in_channels=3, out_ch=3,
        ch=32, ch_mult=[1, 2], num_res_blocks=2, attn_resolutions=[],
        dropout=0.0,
    )
    ref = randomize(
        AutoencoderKL(ddconfig=ddconfig, embed_dim=4, scale_factor=0.18215), seed=7
    ).eval()
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), resolution=64)
    params = tc.convert_vae(tc.to_numpy_state_dict(ref.state_dict()), cfg)

    rng = np.random.RandomState(8)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    # encode (deterministic mode) parity
    with torch.no_grad():
        moments = ref.quant_conv(ref.encoder(nchw(x)))
        ref_mean = moments.chunk(2, dim=1)[0] * 0.18215
    ours_mean = np.asarray(jvae.vae_encode_mode(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(ours_mean, to_nhwc(ref_mean), rtol=1e-3, atol=1e-4)

    # decode parity
    z = rng.randn(1, 16, 16, 4).astype(np.float32)
    with torch.no_grad():
        ref_dec = ref.decode(nchw(z))
    ours_dec = np.asarray(jvae.vae_decode(params, cfg, jnp.asarray(z)))
    np.testing.assert_allclose(ours_dec, to_nhwc(ref_dec), rtol=1e-3, atol=1e-4)
