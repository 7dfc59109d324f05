"""Multi-head attention primitives.

Reference semantics: ldm/modules/attention.py — SelfAttention (:160-282),
CrossAttention (:98-157). Masking uses boolean keep-masks applied as -inf
before softmax (attention.py:276-277); the reference's flash path silently
*ignores* instance masks (attention.py:189 `not self.efficient_attention`);
we fix that inconsistency here: every impl honors the mask (SURVEY §7
"flash-attention parity" decision), with `parity_drop_mask_on_flash` to
reproduce the reference quirk when exact parity is required.

Implementations:
  * "xla"    — einsum + softmax; XLA fuses this well at SD1.5 sizes
  * "pallas" — fused flash-attention TPU kernel (kernels/flash_attention.py)

All inputs are (B, N, H*C) post-projection; heads are split internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e9  # fp32/bf16-safe large negative (torch uses -finfo.max / -inf)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, n, hc = x.shape
    c = hc // num_heads
    return x.reshape(b, n, num_heads, c).transpose(0, 2, 1, 3)  # (B,H,N,C)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, n, c = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * c)


def sdpa_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    pre_scaled: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B,H,N,C) tensors.

    mask: optional boolean (B,1,N,M) keep-mask (True = attend). Scores are
    computed in fp32 for softmax stability (matches AMP fp32 softmax).
    pre_scaled: 1/sqrt(c) was already folded into q by the caller.
    """
    c = q.shape[-1]
    scale = 1.0 if pre_scaled else c ** -0.5
    sim = jnp.einsum(
        "bhnc,bhmc->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        sim = jnp.where(mask, sim, _NEG_INF)
    attn = jax.nn.softmax(sim, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmc->bhnc", attn, v, preferred_element_type=q.dtype)


def labels_to_dense(bits: jnp.ndarray, open_: jnp.ndarray) -> jnp.ndarray:
    """(B,N) instance-label arrays -> dense (B,1,N,N) bool keep-mask (the
    XLA fallback for the flash kernel's in-kernel predicate)."""
    n = bits.shape[1]
    i = jnp.arange(n)
    keep = (
        (open_[:, :, None] > 0)
        | (open_[:, None, :] > 0)
        | ((bits[:, :, None] & bits[:, None, :]) != 0)
        | (i[:, None] == i[None, :])[None]
    )
    return keep[:, None]


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mask: jnp.ndarray | None = None,
    labels: tuple | None = None,
    impl: str = "xla",
    pre_scaled: bool = False,
    kv_len: int | None = None,
) -> jnp.ndarray:
    """(B,N,H*C) x (B,M,H*C) -> (B,N,H*C) attention with optional keep-mask
    (dense `mask` or per-token instance `labels` — see
    kernels/flash_attention for the encoding). pre_scaled: the caller
    folded 1/sqrt(c) into q (e.g. into the to_q weight). kv_len: true kv
    length when k/v are pre-padded to a flash block multiple (pallas
    inference paths only)."""
    n, m = q.shape[1], k.shape[1]
    # the fused kernel only pays off on long sequences; short ones (low-res
    # UNet levels, 77-token cross-attention) are faster through XLA and the
    # kernel's block padding would dominate
    big = (n >= 1024 and m >= 512) or labels is not None
    head_c = q.shape[2] // num_heads
    if impl == "pallas" and big and mask is None and head_c >= 64:
        # packed layout: heads split in-kernel, so the (B,H,N,c) arrays —
        # and XLA's copies materializing them — never exist. Measured
        # faster than split-heads from head_c >= 64 (ds2+); at ds1's
        # head_c=40 the in-kernel lane-slice relayouts cost more than
        # XLA's (parallelizable) head-split copies, so that stays split.
        from instancediffusion_tpu.kernels.flash_attention import (
            flash_attention_packed,
        )

        return flash_attention_packed(
            q, k, v, num_heads, labels=labels, pre_scaled=pre_scaled,
            kv_len=kv_len,
        )
    qh, kh, vh = (_split_heads(t, num_heads) for t in (q, k, v))
    if impl == "pallas" and big:
        from instancediffusion_tpu.kernels.flash_attention import flash_attention

        out = flash_attention(
            qh, kh, vh, mask=mask, labels=labels, pre_scaled=pre_scaled,
            kv_len=kv_len,
        )
    elif impl == "pallas_train" and big:
        # differentiable fused kernels (custom VJP); labels route to the
        # labeled variant whose backward re-applies the in-kernel keep
        # predicate (masked-attention TRAINING, use_masked_att)
        assert not pre_scaled, (
            "fold the scale only on the inference path: the training "
            "kernels' VJP computes dq = ds*k*scale from UNscaled q"
        )
        from instancediffusion_tpu.kernels.flash_attention import (
            flash_attention_trainable, flash_attention_trainable_labeled,
        )

        assert mask is None, "dense masks train through the XLA path"
        if labels is not None:
            out = flash_attention_trainable_labeled(qh, kh, vh, *labels)
        else:
            out = flash_attention_trainable(qh, kh, vh)
    else:
        assert kv_len is None, (
            "pre-padded kv (kv_len) is only valid on flash paths; the "
            "caller must not pad when this call resolves to XLA/training"
        )
        if labels is not None and mask is None:
            # labels index k-sequence positions; q covers the first n
            mask = labels_to_dense(*labels)[:, :, :n, :]
        out = sdpa_xla(qh, kh, vh, mask=mask, pre_scaled=pre_scaled)
    return _merge_heads(out)
