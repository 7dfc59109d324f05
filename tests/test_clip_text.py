"""Golden parity: our CLIP text transformer vs HF CLIPTextModel (torch,
random weights from config — no network)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from instancediffusion_tpu.config import TextEncoderConfig  # noqa: E402
from instancediffusion_tpu.io import torch_convert as tc  # noqa: E402
from instancediffusion_tpu.models import clip_text  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, max_position_embeddings=77,
        hidden_act="quick_gelu",
        # real CLIP pools at the EOT token (= highest BPE id, found by argmax
        # in original CLIP); newer HF searches for eos_token_id instead, so
        # align the test config's eos id with our argmax target
        eos_token_id=999,
    )
    torch.manual_seed(0)
    ref = transformers.CLIPTextModel(hf_cfg).eval()
    cfg = TextEncoderConfig(
        vocab_size=1000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
    )
    params = tc.convert_clip_text(tc.to_numpy_state_dict(ref.state_dict()), cfg)
    return ref, cfg, params


def test_last_hidden_state_parity(pair):
    ref, cfg, params = pair
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 998, size=(2, 77)).astype(np.int64)
    ids[:, -1] = 999  # EOT = max id
    with torch.no_grad():
        out_ref = ref(input_ids=torch.tensor(ids))
    out = clip_text.apply_clip_text(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        out_ref.last_hidden_state.numpy(), rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]), out_ref.pooler_output.numpy(),
        rtol=1e-3, atol=1e-4,
    )


def test_eot_pooling_position(pair):
    """pooler takes the hidden state at argmax(input_ids) per sequence."""
    ref, cfg, params = pair
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 500, size=(2, 77)).astype(np.int64)
    ids[0, 10] = 999  # EOT early in sequence 0
    ids[1, 40] = 999
    out = clip_text.apply_clip_text(params, cfg, jnp.asarray(ids))
    lhs = np.asarray(out["last_hidden_state"])
    pooled = np.asarray(out["pooler_output"])
    np.testing.assert_allclose(pooled[0], lhs[0, 10], rtol=1e-6)
    np.testing.assert_allclose(pooled[1], lhs[1, 40], rtol=1e-6)
