"""Instance attention mask: our on-device builder + label encoding vs the
reference SelfAttention's materialized mask path (attention.py:187-282),
end-to-end through a weight-copied attention forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_compat import install_reference  # noqa: E402

install_reference()

import jax.numpy as jnp  # noqa: E402

from ldm.modules.attention import SelfAttention as RefSelfAttention  # noqa: E402

from instancediffusion_tpu.kernels.flash_attention import instance_labels  # noqa: E402
from instancediffusion_tpu.ops.attention import multi_head_attention  # noqa: E402
from instancediffusion_tpu.ops.instance_mask import (  # noqa: E402
    build_fuser_mask, rasterize_boxes,
)

S = 8            # mini "64x64" visual grid
N_OBJS = 3
SEG = 4
N_TOTAL = S * S + 4 * N_OBJS + SEG


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    att_masks = np.zeros((1, N_OBJS, S, S), np.float32)
    att_masks[0, 0, 1:4, 2:6] = 1
    att_masks[0, 1, 3:7, 0:3] = 1  # overlaps instance 0
    att_masks[0, 2, 5:8, 5:8] = 1
    x = rng.randn(1, N_TOTAL, 32).astype(np.float32)
    return att_masks, x


def _reference_mask_math(att_masks, seg_tokens=SEG):
    """attention.py:206-252 formulas, NumPy."""
    b, n, s, _ = att_masks.shape
    wh = s * s
    ntot = wh + 4 * n + seg_tokens
    mv = att_masks.reshape(b * n, wh, 1)
    self_att_all = np.matmul(mv, mv.transpose(0, 2, 1))
    ind = self_att_all.reshape(b, n, wh, wh).sum(axis=1)
    allm = mv.reshape(b, n, wh, 1).sum(axis=1)
    allm[allm >= 1.0] = 1.0
    vtm = np.matmul(allm, allm.transpose(0, 2, 1)) + ind
    vtm[ind < 1.0] = 0.0
    vtm[ind >= 1.0] = 1.0

    out = np.ones((b, 1, ntot, ntot), np.float32)
    out[:, :, :wh, :wh] = vtm[:, None]
    amr = att_masks.reshape(b, 1, n, wh)
    out[:, :, wh:-seg_tokens, :wh] = np.tile(amr, (1, 1, 4, 1))
    out[:, :, wh + n : wh + n * 3, :wh] = 1
    out[:, :, :wh, wh:-seg_tokens] = np.tile(
        amr.transpose(0, 1, 3, 2), (1, 1, 1, 4)
    )
    out[:, :, :wh, wh + n : wh + n * 3] = 1
    out = out + np.eye(ntot, dtype=np.float32)[None, None] * 1e-9
    return out > 0.0


def test_builder_matches_reference_math():
    att_masks, _ = _setup()
    ref_keep = _reference_mask_math(att_masks)
    ours = np.asarray(
        build_fuser_mask(jnp.asarray(att_masks), seg_tokens=SEG)
    )
    np.testing.assert_array_equal(ours, ref_keep)


def test_labels_match_builder():
    """The flash kernel's (bits, open) label predicate reproduces the dense
    keep-mask exactly."""
    att_masks, _ = _setup()
    dense = np.asarray(
        build_fuser_mask(jnp.asarray(att_masks), seg_tokens=SEG)
    )[0, 0]
    bits, open_ = instance_labels(jnp.asarray(att_masks), N_OBJS, SEG)
    bits = np.asarray(bits)[0]
    open_ = np.asarray(open_)[0]
    i = np.arange(N_TOTAL)
    keep = (
        (open_[:, None] > 0)
        | (open_[None, :] > 0)
        | ((bits[:, None] & bits[None, :]) != 0)
        | (i[:, None] == i[None, :])
    )
    np.testing.assert_array_equal(keep, dense)


def test_zero_masks_disable_masking():
    att_masks = np.zeros((2, N_OBJS, S, S), np.float32)
    att_masks[1, 0, 2:5, 2:5] = 1
    keep = np.asarray(
        build_fuser_mask(jnp.asarray(att_masks), seg_tokens=SEG)
    )
    assert keep[0].all()            # sample 0: no masks -> unmasked
    assert not keep[1].all()        # sample 1 masked


def test_rasterize_boxes_reference_quirk():
    """utils/input.py:34-37 indexes rows by x and cols by y — reproduced."""
    boxes = jnp.asarray([[[0.25, 0.5, 0.75, 1.0]]])
    m = np.asarray(rasterize_boxes(boxes, image_size=8))[0, 0]
    # x in [2,6) -> rows; y in [4,8) -> cols
    assert m[2:6, 4:8].all()
    assert m.sum() == 16


def test_masked_attention_end_to_end():
    """Masked MHA through our dense-mask path == reference SelfAttention
    with the same (tiny) geometry, weights copied."""
    att_masks, x = _setup()
    ref = RefSelfAttention(query_dim=32, heads=4, dim_head=8,
                           efficient_attention=False).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape) * 0.05)

    keep = _reference_mask_math(att_masks)
    xt = torch.tensor(x)
    with torch.no_grad():
        # reproduce the reference masked math path with an explicit mask:
        # sim.masked_fill(mask <= 0, -inf) (attention.py:276-277)
        q = ref.to_q(xt).view(1, N_TOTAL, 4, 8).permute(0, 2, 1, 3)
        k = ref.to_k(xt).view(1, N_TOTAL, 4, 8).permute(0, 2, 1, 3)
        v = ref.to_v(xt).view(1, N_TOTAL, 4, 8).permute(0, 2, 1, 3)
        sim = torch.einsum("bhic,bhjc->bhij", q, k) * (8 ** -0.5)
        sim = sim.masked_fill(~torch.tensor(keep), float("-inf"))
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhjc->bhic", attn, v)
        out = out.permute(0, 2, 1, 3).reshape(1, N_TOTAL, 32)
        ref_out = ref.to_out(out).numpy()

    from instancediffusion_tpu.io.torch_convert import to_numpy_state_dict

    sd = to_numpy_state_dict(ref.state_dict())
    wq, wk, wv = sd["to_q.weight"].T, sd["to_k.weight"].T, sd["to_v.weight"].T
    xo = jnp.asarray(x)
    keepj = build_fuser_mask(jnp.asarray(att_masks), seg_tokens=SEG)
    ours = multi_head_attention(
        xo @ wq, xo @ wk, xo @ wv, 4, mask=keepj
    )
    ours = ours @ sd["to_out.0.weight"].T + sd["to_out.0.bias"]
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-3, atol=1e-4)


def test_labeled_flash_backward_matches_xla():
    """flash_attention_trainable_labeled (interpret mode on CPU): forward
    AND gradients must match XLA attention under the dense label mask —
    the masked-attention TRAINING path (use_masked_att=True)."""
    import jax

    from instancediffusion_tpu.kernels.flash_attention import (
        flash_attention_trainable_labeled,
    )
    from instancediffusion_tpu.ops.attention import labels_to_dense, sdpa_xla

    att_masks, _ = _setup()
    bits, open_ = instance_labels(jnp.asarray(att_masks), N_OBJS, SEG)
    rng = np.random.RandomState(1)
    b, h, c = 1, 2, 32
    q = rng.randn(b, h, N_TOTAL, c).astype(np.float32)
    k = rng.randn(b, h, N_TOTAL, c).astype(np.float32)
    v = rng.randn(b, h, N_TOTAL, c).astype(np.float32)
    g = rng.randn(b, h, N_TOTAL, c).astype(np.float32)

    def loss_kernel(q, k, v):
        out = flash_attention_trainable_labeled(
            q, k, v, bits, open_, 64, 64, True  # block sizes, interpret
        )
        return jnp.sum(out * g)

    def loss_xla(q, k, v):
        out = sdpa_xla(q, k, v, mask=labels_to_dense(bits, open_))
        return jnp.sum(out * g)

    out_k = flash_attention_trainable_labeled(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bits, open_, 64, 64,
        True,
    )
    out_x = sdpa_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask=labels_to_dense(bits, open_),
    )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_x), rtol=2e-5, atol=2e-5
    )

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    for a, b_ in zip(gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5
        )
