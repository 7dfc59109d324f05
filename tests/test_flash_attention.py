"""Pallas flash attention vs the XLA reference path (interpret mode on CPU;
the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instancediffusion_tpu.kernels.flash_attention import (
    flash_attention, instance_labels,
)
from instancediffusion_tpu.ops.attention import sdpa_xla
from instancediffusion_tpu.ops.instance_mask import build_fuser_mask


def _qkv(rng, b, h, n, m, c):
    q = rng.standard_normal((b, h, n, c), dtype=np.float32)
    k = rng.standard_normal((b, h, m, c), dtype=np.float32)
    v = rng.standard_normal((b, h, m, c), dtype=np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize(
    "n,m,c", [(256, 256, 40), (256, 77, 64), (300, 77, 40)]
)
def test_flash_matches_xla(n, m, c):
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng, 1, 2, n, m, c)
    ref = sdpa_xla(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_labeled_matches_masked_xla():
    s, n_objs, seg = 8, 3, 4
    ntot = s * s + 4 * n_objs + seg  # 80
    att = np.zeros((1, n_objs, s, s), np.float32)
    att[0, 0, 1:4, 2:6] = 1
    att[0, 1, 3:7, 0:3] = 1
    att[0, 2, 5:8, 5:8] = 1
    att = jnp.asarray(att)

    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng, 1, 2, ntot, ntot, 32)

    dense = build_fuser_mask(att, seg_tokens=seg)
    ref = sdpa_xla(q, k, v, mask=dense)

    labels = instance_labels(att, n_objs, seg)
    out = flash_attention(
        q, k, v, labels=labels, block_q=16, block_k=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_labeled_null_sample_unmasked():
    """A sample with all-zero att_masks must behave as unmasked attention
    (the CFG null half shares the batched forward)."""
    s, n_objs, seg = 4, 2, 4
    ntot = s * s + 4 * n_objs + seg
    att = jnp.zeros((1, n_objs, s, s), jnp.float32)
    rng = np.random.default_rng(2)
    q, k, v = _qkv(rng, 1, 1, ntot, ntot, 16)
    labels = instance_labels(att, n_objs, seg)
    out = flash_attention(
        q, k, v, labels=labels, block_q=16, block_k=16, interpret=True
    )
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def _pack(x):
    # (B,H,N,c) -> (B,N,H*c)
    b, h, n, c = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, n, h * c)


@pytest.mark.parametrize("n,m,c,h", [(256, 256, 40, 3), (300, 128, 32, 2)])
def test_flash_packed_matches_xla(n, m, c, h):
    from instancediffusion_tpu.kernels.flash_attention import (
        flash_attention_packed,
    )

    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, 2, h, n, m, c)
    ref = _pack(sdpa_xla(q, k, v))
    out = flash_attention_packed(
        _pack(q), _pack(k), _pack(v), h, block_q=128, block_k=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_packed_labeled_matches_masked_xla():
    from instancediffusion_tpu.kernels.flash_attention import (
        flash_attention_packed,
    )

    s, n_objs, seg = 8, 3, 4
    ntot = s * s + 4 * n_objs + seg  # 80
    att = np.zeros((2, n_objs, s, s), np.float32)
    att[0, 0, 1:4, 2:6] = 1
    att[0, 1, 3:7, 0:3] = 1
    att[0, 2, 5:8, 5:8] = 1
    att[1, 0, 0:2, 0:2] = 1  # second sample: one instance + open rest
    att = jnp.asarray(att)

    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng, 2, 2, ntot, ntot, 32)
    dense = build_fuser_mask(att, seg_tokens=seg)
    ref = _pack(sdpa_xla(q, k, v, mask=dense))

    labels = instance_labels(att, n_objs, seg)
    out = flash_attention_packed(
        _pack(q), _pack(k), _pack(v), 2, labels=labels,
        block_q=16, block_k=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_dense_mask_fallback_respects_pre_scaled():
    """The dense-mask branch falls back to sdpa_xla; with pre_scaled=True
    (scale folded into to_q upstream) it must not scale a second time."""
    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, 1, 2, 64, 64, 32)
    mask = jnp.asarray(rng.uniform(size=(1, 1, 64, 64)) > 0.3)
    ref = sdpa_xla(q, k, v, mask=mask)
    scale = 32 ** -0.5
    out = flash_attention(
        q * scale, k, v, mask=mask, interpret=True, pre_scaled=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_packed_labeled_single_tail_block():
    """kv_len < block_k: zero full blocks, everything in the peeled tail
    (regression: jnp.stack([]) crash)."""
    from instancediffusion_tpu.kernels.flash_attention import (
        flash_attention_packed,
    )

    s, n_objs, seg = 4, 2, 4
    ntot = s * s + 4 * n_objs + seg  # 28
    att = np.zeros((1, n_objs, s, s), np.float32)
    att[0, 0, 0:2, 1:3] = 1
    att[0, 1, 2:4, 0:2] = 1
    att = jnp.asarray(att)
    rng = np.random.default_rng(8)
    q, k, v = _qkv(rng, 1, 2, ntot, ntot, 16)
    dense = build_fuser_mask(att, seg_tokens=seg)
    ref = _pack(sdpa_xla(q, k, v, mask=dense))
    labels = instance_labels(att, n_objs, seg)
    out = flash_attention_packed(
        _pack(q), _pack(k), _pack(v), 2, labels=labels,
        block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_mha_packed64_weight_padding_matches_xla(monkeypatch):
    """The ds1 packed-64 path (models/unet._apply_mha): head channels are
    padded 40->64 INSIDE the projection weights, so the packed kernel gets
    64-aligned head slices with no head-split copies. Zero-padded q/k
    columns leave q.k^T unchanged; zero v columns emit zero output columns
    that the zero-padded to_out rows ignore — must equal the plain XLA
    attention exactly (up to fp assoc)."""
    import functools

    import instancediffusion_tpu.kernels.flash_attention as fa_mod
    import instancediffusion_tpu.models.unet as unet_mod
    from instancediffusion_tpu.models.unet import _apply_mha, _init_mha

    monkeypatch.setattr(unet_mod, "PACKED64", True)
    rng = jax.random.PRNGKey(0)
    b, n, m, h, c = 1, 1024, 512, 4, 40
    inner = h * c
    p = _init_mha(rng, inner, inner, inner)
    kx, kv_ = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (b, n, inner), jnp.float32)
    kv = jax.random.normal(kv_, (b, m, inner), jnp.float32)

    ref = _apply_mha(p, x, kv, h, impl="xla")

    monkeypatch.setattr(
        fa_mod, "flash_attention_packed",
        functools.partial(
            fa_mod.flash_attention_packed, block_q=256, block_k=256,
            interpret=True,
        ),
    )
    got = _apply_mha(p, x, kv, h, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fuser_born_aligned_kv_matches_xla(monkeypatch):
    """The gatedSA fuser pre-pads the grounding block so kv is born at the
    kernel's block multiple (models/unet._apply_fuser): the kernel-wrapper
    whole-kv pads become no-ops and the true length rides in as kv_len.
    Padded rows survive norm1 as LN(0)=beta garbage — the kernel's tail
    mask must drop them, leaving the result equal to the unpadded XLA
    fuser."""
    import functools

    import instancediffusion_tpu.kernels.flash_attention as fa_mod
    from instancediffusion_tpu.models.unet import _apply_fuser, _init_fuser

    b, n, g, ctx_dim, inner = 1, 1024, 184, 768, 320
    p = _init_fuser(jax.random.PRNGKey(0), inner, ctx_dim)
    # nonzero gates so the attention branch actually contributes
    p["alpha_attn"] = jnp.asarray(0.7, jnp.float32)
    p["alpha_dense"] = jnp.asarray(0.3, jnp.float32)
    kx, ko = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (b, n, inner), jnp.float32)
    objs = jax.random.normal(ko, (b, g, ctx_dim), jnp.float32)

    ref = _apply_fuser(p, x, objs, 8, 1.0, None, impl="xla")

    monkeypatch.setattr(
        fa_mod, "flash_attention",
        functools.partial(fa_mod.flash_attention, block_q=256, block_k=256,
                          interpret=True),
    )
    import instancediffusion_tpu.kernels.head_layout as hl_mod

    monkeypatch.setattr(
        hl_mod, "proj_split",
        functools.partial(hl_mod.proj_split, interpret=True),
    )
    monkeypatch.setattr(
        hl_mod, "merge_proj",
        functools.partial(hl_mod.merge_proj, interpret=True),
    )
    got = _apply_fuser(p, x, objs, 8, 1.0, None, impl="pallas")
    assert got.shape == ref.shape == (b, n, inner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_labeled_prepadded_kv_matches_unpadded():
    """kv pre-padded to a block multiple + kv_len: the garbage tail must be
    dropped by the tail mask even for OPEN queries (whose label predicate
    alone would keep every column)."""
    s, n_objs, seg = 8, 2, 4
    ntot = s * s + 4 * n_objs + seg  # 76 true tokens
    att = np.zeros((1, n_objs, s, s), np.float32)
    att[0, 0, 1:4, 2:6] = 1
    att = jnp.asarray(att)
    rng = np.random.default_rng(9)
    q, k, v = _qkv(rng, 1, 2, ntot, ntot, 32)
    labels = instance_labels(att, n_objs, seg)

    ref = flash_attention(
        q, k, v, labels=labels, block_q=16, block_k=16, interpret=True
    )

    pad = 16 * ((ntot + 15) // 16) - ntot  # to the 16-block multiple
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)),
                 constant_values=7.0)  # poison the tail
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=7.0)
    out = flash_attention(
        q, kp, vp, labels=labels, block_q=16, block_k=16, interpret=True,
        kv_len=ntot,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
