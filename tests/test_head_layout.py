"""Fused projection/head-layout kernels vs the unfused XLA formula
(interpret mode on CPU; the same kernels compile via Mosaic on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from instancediffusion_tpu.kernels.head_layout import merge_proj, proj_split
from instancediffusion_tpu.ops.attention import _merge_heads, _split_heads


@pytest.mark.parametrize("variant", ["reshape", "slice"])
@pytest.mark.parametrize(
    "b,m,c_in,heads,head_c,block_n",
    [
        (2, 128, 96, 4, 24, 64),     # ds1-like: head_c not lane-aligned
        (1, 100, 64, 2, 32, 64),     # ragged sequence -> zero-padded tail
    ],
)
def test_proj_split_matches_xla(variant, b, m, c_in, heads, head_c, block_n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, m, c_in), dtype=np.float32))
    ws = [
        jnp.asarray(
            rng.standard_normal((c_in, heads * head_c), dtype=np.float32)
        )
        for _ in range(3)
    ]
    outs = proj_split(
        x, tuple(ws), heads, block_n=block_n, variant=variant, interpret=True
    )
    mpad = (m + block_n - 1) // block_n * block_n
    for w, out in zip(ws, outs):
        assert out.shape == (b, heads, mpad, head_c)
        ref = _split_heads(x @ w, heads)
        np.testing.assert_allclose(
            np.asarray(out[:, :, :m]), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
        # the pad tail is REAL zeros (flash sv-matmul NaN safety)
        assert not np.any(np.asarray(out[:, :, m:]))


@pytest.mark.parametrize("variant", ["reshape", "dot_per_head"])
@pytest.mark.parametrize("with_bias", [True, False])
def test_merge_proj_matches_xla(variant, with_bias):
    rng = np.random.default_rng(1)
    b, h, n, c, c_out = 2, 4, 128, 24, 96
    o = jnp.asarray(rng.standard_normal((b, h, n, c), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((h * c, c_out), dtype=np.float32))
    bias = (
        jnp.asarray(rng.standard_normal((c_out,), dtype=np.float32))
        if with_bias else None
    )
    out = merge_proj(o, w, bias, block_n=64, variant=variant, interpret=True)
    ref = _merge_heads(o) @ w
    if with_bias:
        ref = ref + bias
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_apply_mha_fused_proj_matches_xla(monkeypatch):
    """models/unet._apply_mha with FUSED_PROJ on (interpret kernels) ==
    the plain XLA path — the exact branch the TPU inference path takes."""
    import functools

    import jax

    import instancediffusion_tpu.kernels.flash_attention as fa_mod
    import instancediffusion_tpu.kernels.head_layout as hl_mod
    import instancediffusion_tpu.models.unet as unet_mod

    monkeypatch.setattr(unet_mod, "FUSED_PROJ", True)
    monkeypatch.setattr(
        fa_mod, "flash_attention",
        functools.partial(fa_mod.flash_attention, block_q=256, block_k=256,
                          interpret=True),
    )
    monkeypatch.setattr(
        hl_mod, "proj_split",
        functools.partial(hl_mod.proj_split, block_n=256, interpret=True),
    )
    monkeypatch.setattr(
        hl_mod, "merge_proj",
        functools.partial(hl_mod.merge_proj, block_n=256, interpret=True),
    )
    b, n, h, c = 1, 1024, 4, 40
    inner = h * c
    p = unet_mod._init_mha(jax.random.PRNGKey(0), inner, inner, inner)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, inner), jnp.float32)

    ref = unet_mod._apply_mha(p, x, x, h, impl="xla")
    got = unet_mod._apply_mha(p, x, x, h, impl="pallas")
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_roundtrip_attention_parity():
    """proj_split -> flash_attention -> merge_proj == the existing unfused
    path (the exact integration the ds1 pallas branch uses)."""
    from instancediffusion_tpu.kernels.flash_attention import flash_attention
    from instancediffusion_tpu.ops.attention import sdpa_xla

    rng = np.random.default_rng(2)
    b, m, heads, head_c = 1, 128, 2, 24
    c_in = heads * head_c
    x = jnp.asarray(rng.standard_normal((b, m, c_in), dtype=np.float32))
    wq, wk, wv = (
        jnp.asarray(rng.standard_normal((c_in, c_in), dtype=np.float32) * 0.2)
        for _ in range(3)
    )
    wo = jnp.asarray(rng.standard_normal((c_in, c_in), dtype=np.float32) * 0.2)
    bo = jnp.asarray(rng.standard_normal((c_in,), dtype=np.float32))

    scale = head_c ** -0.5
    q, = proj_split(x, (wq * scale,), heads, block_n=64, interpret=True)
    k, v = proj_split(x, (wk, wv), heads, block_n=64, interpret=True)
    att = flash_attention(
        q, k, v, pre_scaled=True, block_q=64, block_k=64, interpret=True
    )
    out = merge_proj(att, wo, bo, block_n=64, interpret=True)

    qh, kh, vh = (_split_heads(x @ w, heads) for w in (wq, wk, wv))
    ref = _merge_heads(sdpa_xla(qh, kh, vh)) @ wo + bo
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_roundtrip_fuser_parity():
    """The gatedSA shape: q = visual rows only, kv = [visual | grounding]
    pre-padded to a block multiple with kv_len + instance labels — the
    exact call models/unet._apply_fuser makes on the FUSED_PROJ path."""
    from instancediffusion_tpu.kernels.flash_attention import flash_attention
    from instancediffusion_tpu.ops.attention import labels_to_dense, sdpa_xla

    rng = np.random.default_rng(3)
    b, n, g, heads, head_c = 1, 64, 20, 2, 24
    c_in = heads * head_c
    m_true = n + g            # 84 true kv tokens
    m_pad = 128               # born-aligned to the k-block multiple
    xg = np.zeros((b, m_pad, c_in), np.float32)
    xg[:, :m_true] = rng.standard_normal((b, m_true, c_in), dtype=np.float32)
    xg = jnp.asarray(xg)
    x = xg[:, :n]
    wq, wk, wv = (
        jnp.asarray(rng.standard_normal((c_in, c_in), dtype=np.float32) * 0.2)
        for _ in range(3)
    )
    wo = jnp.asarray(rng.standard_normal((c_in, c_in), dtype=np.float32) * 0.2)
    bo = jnp.asarray(rng.standard_normal((c_in,), dtype=np.float32))
    # labels over the true sequence: first instance covers rows 0:8, open
    # grounding tail
    bits = np.zeros((b, m_true), np.int32)
    open_ = np.zeros((b, m_true), np.int32)
    bits[:, :8] = 1
    open_[:, n:] = 1
    bits_j, open_j = jnp.asarray(bits), jnp.asarray(open_)

    scale = head_c ** -0.5
    q, = proj_split(x, (wq * scale,), heads, block_n=64, interpret=True)
    k, v = proj_split(xg, (wk, wv), heads, block_n=64, interpret=True)
    att = flash_attention(
        q, k, v, labels=(bits_j, open_j), pre_scaled=True, kv_len=m_true,
        block_q=64, block_k=64, interpret=True,
    )
    out = merge_proj(att, wo, bo, block_n=64, interpret=True)[:, :n]

    qh, kh, vh = (
        _split_heads(t @ w, heads)
        for t, w in ((x, wq), (xg[:, :m_true], wk), (xg[:, :m_true], wv))
    )
    mask = labels_to_dense(bits_j, open_j)[:, :, :n, :]
    ref = _merge_heads(sdpa_xla(qh, kh, vh, mask=mask)) @ wo + bo
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
