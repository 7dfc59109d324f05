"""Golden parity: our CLIP vision tower + projections vs HF CLIPModel
(torch, random weights from config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from instancediffusion_tpu.config import TextEncoderConfig  # noqa: E402
from instancediffusion_tpu.io import torch_convert as tc  # noqa: E402
from instancediffusion_tpu.models import clip_vision as cv  # noqa: E402
from instancediffusion_tpu.nn import core as nn  # noqa: E402


def test_clip_model_parity():
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=77, hidden_act="quick_gelu",
            eos_token_id=999,
        ),
        vision_config=dict(
            image_size=56, patch_size=14, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, hidden_act="quick_gelu",
        ),
        projection_dim=32,
    )
    torch.manual_seed(0)
    ref = transformers.CLIPModel(hf_cfg).eval()

    tcfg = TextEncoderConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
    )
    vcfg = cv.VisionConfig(
        image_size=56, patch_size=14, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, projection_dim=32,
    )
    sd = tc.to_numpy_state_dict(ref.state_dict())
    vision_p, text_p, text_proj = tc.convert_clip_model(sd, tcfg, vcfg)

    rng = np.random.RandomState(0)
    pixels = rng.randn(2, 56, 56, 3).astype(np.float32)
    ids = rng.randint(1, 998, size=(2, 77)).astype(np.int64)
    ids[:, -1] = 999

    with torch.no_grad():
        ref_img = ref.get_image_features(
            pixel_values=torch.tensor(np.moveaxis(pixels, -1, 1))
        ).numpy()
        ref_txt = ref.get_text_features(input_ids=torch.tensor(ids)).numpy()

    out = cv.apply_clip_vision(vision_p, vcfg, jnp.asarray(pixels))
    np.testing.assert_allclose(
        np.asarray(out["image_embeds"]), ref_img, rtol=1e-3, atol=2e-4
    )

    from instancediffusion_tpu.models.clip_text import apply_clip_text

    pooled = apply_clip_text(text_p, tcfg, jnp.asarray(ids))["pooler_output"]
    ours_txt = np.asarray(nn.linear(text_proj, pooled))
    np.testing.assert_allclose(ours_txt, ref_txt, rtol=1e-3, atol=2e-4)


def test_preprocess_shapes():
    img = np.random.default_rng(0).integers(0, 255, (300, 500, 3), dtype=np.uint8)
    out = cv.preprocess_image(img)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32
    assert cv.preprocess_image(np.zeros((0, 5, 3), np.uint8)).shape == (224, 224, 3)
