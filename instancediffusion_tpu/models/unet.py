"""SD1.5 UNet with UniFusion grounding injection and ScaleU, TPU-native.

Functional re-design of the reference UNetModel
(ldm/modules/diffusionmodules/openaimodel.py:307-566) plus its transformer
stack (ldm/modules/attention.py:98-379):

  * pure function over a parameter pytree — no module mutation. The two
    host-side mid-loop mutations of the reference become traced data:
      - `set_alpha_scale` (utils/model.py:78-81)  -> `gate_scale` scalar arg
      - `restore_first_conv_from_SD` (openaimodel.py:469-480) -> both conv
        param sets live in the pytree and are `jnp.where`-selected on
        `gate_scale == 0`
  * NHWC activations, HWIO conv kernels, (in,out) linear weights
  * norms in fp32, matmuls/convs in the activation dtype (bf16 on TPU)
  * the network structure is a static "plan" computed from UNetConfig, so
    `init` and `apply` walk identical layer lists and XLA sees fully static
    shapes/control flow

Architecture (configs/test_box.yaml:8-24): 4->320ch, channel_mult (1,2,4,4),
2 res blocks/level, depth-1 spatial transformers at ds 1,2,4, 8 heads,
context_dim 768, gatedSA fuser, ScaleU on all 12 decoder skip-joins.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from instancediffusion_tpu.config import UNetConfig
from instancediffusion_tpu.nn import core as nn
from instancediffusion_tpu.ops.attention import multi_head_attention
from instancediffusion_tpu.ops.schedules import timestep_embedding
from instancediffusion_tpu.models import unifusion

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Static structure plan
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LayerSpec:
    kind: str          # "conv_in" | "res" | "attn" | "down" | "up"
    in_ch: int = 0
    out_ch: int = 0
    ds: int = 1        # downsample factor at this layer (attn masking needs it)


def build_plan(cfg: UNetConfig):
    """Returns (input_blocks, middle_block, output_blocks): lists of
    lists-of-LayerSpec mirroring openaimodel.py:371-456."""
    mc = cfg.model_channels
    input_blocks: list[list[LayerSpec]] = [
        [LayerSpec("conv_in", cfg.in_channels, mc)]
    ]
    input_block_chans = [mc]
    ch = mc
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [LayerSpec("res", ch, mult * mc)]
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                layers.append(LayerSpec("attn", ch, ch, ds))
            input_blocks.append(layers)
            input_block_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_blocks.append([LayerSpec("down", ch, ch)])
            input_block_chans.append(ch)
            ds *= 2

    middle_block = [
        LayerSpec("res", ch, ch),
        LayerSpec("attn", ch, ch, ds),
        LayerSpec("res", ch, ch),
    ]

    output_blocks: list[list[LayerSpec]] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_block_chans.pop()
            layers = [LayerSpec("res", ch + ich, mc * mult)]
            ch = mc * mult
            if ds in cfg.attention_resolutions:
                layers.append(LayerSpec("attn", ch, ch, ds))
            if level and i == cfg.num_res_blocks:
                layers.append(LayerSpec("up", ch, ch))
                ds //= 2
            output_blocks.append(layers)

    return input_blocks, middle_block, output_blocks


# ---------------------------------------------------------------------------
# Sub-module init/apply
# ---------------------------------------------------------------------------


def _init_res_block(key, in_ch, out_ch, emb_ch) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "in_norm": nn.init_norm(in_ch),
        "in_conv": nn.init_conv2d(ks[0], in_ch, out_ch, 3),
        "emb_lin": nn.init_linear(ks[1], emb_ch, out_ch),
        "out_norm": nn.init_norm(out_ch),
        "out_conv": nn.init_conv2d(ks[2], out_ch, out_ch, 3, zero=True),
    }
    if in_ch != out_ch:
        p["skip_conv"] = nn.init_conv2d(ks[3], in_ch, out_ch, 1)
    return p


def _apply_res_block(p: Params, x, emb):
    """openaimodel.py:237-257 (no scale_shift_norm, no up/down variant —
    SD1.5 uses neither)."""
    h = nn.conv2d(p["in_conv"], nn.group_norm(p["in_norm"], x, act="silu"), padding=1)
    emb_out = nn.linear(p["emb_lin"], nn.silu(emb)).astype(h.dtype)
    h = h + emb_out[:, None, None, :]
    h = nn.conv2d(p["out_conv"], nn.group_norm(p["out_norm"], h, act="silu"), padding=1)
    skip = nn.conv2d(p["skip_conv"], x, padding=0) if "skip_conv" in p else x
    return skip + h


def _row_parallel_linear(p: Params, x):
    """Final projection of attention / GEGLU-FF. Under tensor parallelism
    (parallel/tp.py sets a 'model'-axis context inside its shard_map) the
    weight rows are sharded, so the local matmul yields partial sums: psum
    them over the model axis, THEN add the replicated bias (adding before
    the psum would scale the bias by tp). Without a TP context this is
    exactly nn.linear."""
    from instancediffusion_tpu.parallel import tp

    ax = tp.axis()
    if ax is None:
        return nn.linear(p, x)
    y = jax.lax.psum(nn.linear({"w": p["w"]}, x), ax)
    return y + p["b"].astype(y.dtype) if "b" in p else y


def _init_mha(key, query_dim, kv_dim, inner_dim) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "to_q": nn.init_linear(ks[0], query_dim, inner_dim, bias=False),
        "to_k": nn.init_linear(ks[1], kv_dim, inner_dim, bias=False),
        "to_v": nn.init_linear(ks[2], kv_dim, inner_dim, bias=False),
        "to_out": nn.init_linear(ks[3], inner_dim, query_dim),
    }


def _pad_head_cols(w, num_heads: int, c: int, cpad: int):
    """(in, H*c) projection weight -> (in, H*cpad) with zero-padded
    per-head column groups."""
    wh = w.reshape(w.shape[0], num_heads, c)
    wh = jnp.pad(wh, ((0, 0), (0, 0), (0, cpad - c)))
    return wh.reshape(w.shape[0], num_heads * cpad)


def _pad_head_rows(w, num_heads: int, c: int, cpad: int):
    """(H*c, out) output-projection weight -> (H*cpad, out) with zero rows
    at the padded per-head positions."""
    wh = w.reshape(num_heads, c, w.shape[1])
    wh = jnp.pad(wh, ((0, 0), (0, cpad - c), (0, 0)))
    return wh.reshape(num_heads * cpad, w.shape[1])


# Measured OFF (tools/fwd_bench.py, r3): full-forward 99.3 ms packed64 vs
# 98.3 ms split-heads — the (B,H,N,40) head-split copies the packed layout
# eliminates were already hidden behind the async copy engines, and the
# padded projections add 60% projection FLOPs. Kept (with interpret-mode
# parity test) because the layout wins whenever head_c >= 64 natively.
PACKED64 = False

# Fused projection + in-kernel head split/merge for the ds1 (head_c=40)
# inference path: kills the (B,H,N,40) layout copies XLA materializes
# around the flash kernels (~6.4 ms/fwd at B=8, docs/traces/r3b) by doing
# the 40-channel head shuffle on one VMEM tile at a time inside the
# projection kernels (kernels/head_layout.py). Unlike PACKED64 this adds
# ZERO projection FLOPs — the dots stay full-width. Default OFF until the
# Mosaic-compiled variants are measured on a real chip (tools/fwd_bench.py
# --fused-proj); interpret-mode parity is pinned in tests/test_head_layout.py.
FUSED_PROJ = False


def _apply_mha(p: Params, x, kv, num_heads, mask=None, labels=None, impl="xla",
               kv_len=None):
    inner = p["to_q"]["w"].shape[1]
    c = inner // num_heads
    n, m = x.shape[1], kv.shape[1]
    big = (n >= 1024 and m >= 512) or labels is not None
    from instancediffusion_tpu.parallel import tp

    if (FUSED_PROJ and not PACKED64 and impl == "pallas" and big
            and mask is None and c < 64 and tp.axis() is None):
        from instancediffusion_tpu.kernels.flash_attention import (
            flash_attention,
        )
        from instancediffusion_tpu.kernels.head_layout import (
            merge_proj, proj_split,
        )

        from instancediffusion_tpu.kernels import head_layout

        (q,) = proj_split(x, (p["to_q"]["w"] * (c ** -0.5),), num_heads,
                          variant=head_layout.SPLIT_VARIANT)
        k, v = proj_split(kv, (p["to_k"]["w"], p["to_v"]["w"]), num_heads,
                          variant=head_layout.SPLIT_VARIANT)
        out = flash_attention(
            q, k, v, labels=labels, pre_scaled=True,
            kv_len=m if kv_len is None else kv_len,
        )
        merged = merge_proj(out, p["to_out"]["w"], p["to_out"]["b"],
                            variant=head_layout.MERGE_VARIANT)
        return merged[:, :n]
    if PACKED64 and impl == "pallas" and big and mask is None and c < 64:
        # ds1 (head_c=40) packed-64 path: pad every head to 64 channels BY
        # PADDING THE PROJECTION WEIGHTS — the matmuls then emit the packed
        # (B, N, H*64) layout directly, so neither XLA's (B,H,N,40)
        # head-split copies nor any pad op ever exist. The MXU cost of
        # qk^T/sv is IDENTICAL at c=40 and c=64 (any contraction/output dim
        # <= 128 occupies one 128-wide pass), and the packed kernel's
        # in-kernel head slices become 64-aligned. Zero-padded q/k cols
        # don't change q.k^T; zero v cols produce zero out cols
        # which the zero-padded to_out ROWS ignore — bitwise-equal math.
        from instancediffusion_tpu.kernels.flash_attention import (
            flash_attention_packed,
        )

        cpad = 64
        wq = _pad_head_cols(p["to_q"]["w"] * (c ** -0.5), num_heads, c, cpad)
        q = nn.linear({"w": wq}, x)
        k = nn.linear({"w": _pad_head_cols(p["to_k"]["w"], num_heads, c, cpad)}, kv)
        v = nn.linear({"w": _pad_head_cols(p["to_v"]["w"], num_heads, c, cpad)}, kv)
        out = flash_attention_packed(
            q, k, v, num_heads, labels=labels, pre_scaled=True, kv_len=kv_len
        )
        wo = _pad_head_rows(p["to_out"]["w"], num_heads, c, cpad)
        return _row_parallel_linear({"w": wo, "b": p["to_out"]["b"]}, out)
    pre_scaled = impl == "pallas"
    if pre_scaled:
        # fold 1/sqrt(c) into the (bias-free) to_q weight: saves the
        # kernels a whole-q scaling pass. Inference only — the training
        # kernels' VJP algebra assumes unscaled q (ops/attention.py).
        q = nn.linear({"w": p["to_q"]["w"] * (c ** -0.5)}, x)
    else:
        q = nn.linear(p["to_q"], x)
    k = nn.linear(p["to_k"], kv)
    v = nn.linear(p["to_v"], kv)
    out = multi_head_attention(
        q, k, v, num_heads, mask=mask, labels=labels, impl=impl,
        pre_scaled=pre_scaled, kv_len=kv_len,
    )
    return _row_parallel_linear(p["to_out"], out)


def _init_ff_geglu(key, dim, mult=4) -> Params:
    ks = jax.random.split(key, 2)
    inner = dim * mult
    return {
        "proj": nn.init_linear(ks[0], dim, inner * 2),
        "out": nn.init_linear(ks[1], inner, dim),
    }


def _apply_ff_geglu(p: Params, x):
    from instancediffusion_tpu.parallel import tp

    tp_ax = tp.axis()
    if x.dtype == jnp.bfloat16 and nn.fused_kernels_enabled():
        from instancediffusion_tpu.kernels.geglu_ff import (
            ff_fits, fused_ff_geglu,
        )

        n, c = x.shape[1], x.shape[2]
        inner = p["out"]["w"].shape[0]
        if ff_fits(n, c, inner):
            # single-kernel FF: the (N, 2*inner) projection never leaves
            # VMEM (kernels/geglu_ff.py). Under TP the kernel runs on the
            # local column shard; the down-proj bias moves after the psum
            # (the kernel would otherwise add it once per rank).
            if tp_ax is not None:
                y = fused_ff_geglu(
                    x, p["proj"]["w"], p["proj"]["b"],
                    p["out"]["w"], jnp.zeros_like(p["out"]["b"]),
                )
                return jax.lax.psum(y, tp_ax) + p["out"]["b"].astype(y.dtype)
            return fused_ff_geglu(
                x, p["proj"]["w"], p["proj"]["b"],
                p["out"]["w"], p["out"]["b"],
            )
    h = nn.linear(p["proj"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    return _row_parallel_linear(p["out"], a * nn.gelu(gate))


def _init_fuser(key, query_dim, context_dim) -> Params:
    """GatedSelfAttentionDense (attention.py:285-311)."""
    ks = jax.random.split(key, 3)
    return {
        "linear": nn.init_linear(ks[0], context_dim, query_dim),
        "attn": _init_mha(ks[1], query_dim, query_dim, query_dim),
        "ff": _init_ff_geglu(ks[2], query_dim),
        "norm1": nn.init_norm(query_dim),
        "norm2": nn.init_norm(query_dim),
        "alpha_attn": jnp.zeros((), jnp.float32),
        "alpha_dense": jnp.zeros((), jnp.float32),
    }


def _apply_fuser(p, x, objs, num_heads, gate_scale, fuser_mask, impl):
    """x: (B,N,C) visual tokens; objs: (B,G,ctx) grounding tokens.
    gate_scale: traced scalar (the reference's per-step `.scale`).
    fuser_mask: instance masking — either a dense (B,1,N+G,N+G) bool
    keep-mask or a (bits, open) label tuple for the flash kernel."""
    n_visual = x.shape[1]
    objs_p = nn.linear(p["linear"], objs.astype(x.dtype))
    mask, labels = (
        (None, fuser_mask) if isinstance(fuser_mask, tuple) else (fuser_mask, None)
    )
    # born-aligned kv: pad the SMALL grounding block so [x | objs] lands
    # exactly on the flash kernel's k-block multiple — the whole-kv
    # (B,H,M,c) pads inside the kernel wrapper (2.2 ms/fwd of HBM copies
    # at ds1, docs/traces/r3) become no-ops. Rows >= kv_len are LN(0)=beta
    # garbage after norm1; the kernel's existing tail mask drops them.
    # Only when the call takes a flash path (mirrors multi_head_attention's
    # `big` gate): the XLA/training fallbacks expect unpadded kv.
    m_true = n_visual + objs_p.shape[1]
    kv_len = None
    if (
        impl == "pallas"
        and mask is None
        and ((n_visual >= 1024 and m_true >= 512) or labels is not None)
    ):
        from instancediffusion_tpu.kernels.flash_attention import aligned_kv_len

        m_pad = aligned_kv_len(n_visual, m_true)
        if m_pad > m_true:
            objs_p = jnp.pad(
                objs_p, ((0, 0), (0, m_pad - m_true), (0, 0))
            )
            kv_len = m_true
    cat = nn.layer_norm(p["norm1"], jnp.concatenate([x, objs_p], axis=1))
    if mask is not None:
        mask = mask[:, :, :n_visual, :]
    # query only the visual rows: the reference computes the grounding-token
    # rows too and then discards them (attention.py:309 `[:, 0:N]`) — ~4%
    # of the fuser's attention FLOPs for nothing, and it keeps N at an
    # exact q-block multiple
    attn_out = _apply_mha(
        p["attn"], cat[:, :n_visual], cat, num_heads, mask=mask,
        labels=labels, impl=impl, kv_len=kv_len,
    )
    g1 = (gate_scale * jnp.tanh(p["alpha_attn"])).astype(x.dtype)
    x = x + g1 * attn_out
    g2 = (gate_scale * jnp.tanh(p["alpha_dense"])).astype(x.dtype)
    x = x + g2 * _apply_ff_geglu(p["ff"], nn.layer_norm(p["norm2"], x))
    return x


def _init_transformer_block(
    key, query_dim, context_dim, with_fuser: bool = True
) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "attn1": _init_mha(ks[0], query_dim, query_dim, query_dim),
        "attn2": _init_mha(ks[2], query_dim, context_dim, query_dim),
        "ff": _init_ff_geglu(ks[3], query_dim),
        "norm1": nn.init_norm(query_dim),
        "norm2": nn.init_norm(query_dim),
        "norm3": nn.init_norm(query_dim),
    }
    if with_fuser:
        p["fuser"] = _init_fuser(ks[1], query_dim, context_dim)
    return p


def _apply_transformer_block(
    p, x, context, objs, num_heads, gate_scale, fuser_mask, impl
):
    """attention.py:333-338: self-attn -> fuser -> cross-attn -> FF.

    When the per-step gate hits 0 (the alpha schedule's final stage,
    utils/model.py:83-117) the fuser's output is multiplied by zero — the
    reference still pays for the full [visual|grounding] attention; here a
    lax.cond skips the whole fuser at runtime for those steps."""
    xn = nn.layer_norm(p["norm1"], x)
    x = _apply_mha(p["attn1"], xn, xn, num_heads, impl=impl) + x
    if "fuser" not in p:
        pass  # plain SD/SDXL block (sdxl_refiner.py reuses this stack)
    elif isinstance(gate_scale, (int, float)):
        # static gate (training / fixed-alpha inference): resolve at trace
        # time — also keeps jax.checkpoint differentiable (cond + remat
        # don't compose for linearization)
        if gate_scale != 0.0:
            x = _apply_fuser(
                p["fuser"], x, objs, num_heads, gate_scale, fuser_mask, impl
            )
    else:
        x = jax.lax.cond(
            jnp.asarray(gate_scale) != 0.0,
            lambda xx: _apply_fuser(
                p["fuser"], xx, objs, num_heads, gate_scale, fuser_mask, impl
            ),
            lambda xx: xx,
            x,
        )
    x = _apply_mha(
        p["attn2"], nn.layer_norm(p["norm2"], x), context.astype(x.dtype),
        num_heads, impl=impl,
    ) + x
    x = _apply_ff_geglu(p["ff"], nn.layer_norm(p["norm3"], x)) + x
    return x


def _init_spatial_transformer(
    key, in_ch, context_dim, depth, with_fuser: bool = True
) -> Params:
    ks = jax.random.split(key, depth + 2)
    return {
        "norm": nn.init_norm(in_ch),
        "proj_in": nn.init_conv2d(ks[0], in_ch, in_ch, 1),
        "blocks": [
            _init_transformer_block(ks[1 + d], in_ch, context_dim, with_fuser)
            for d in range(depth)
        ],
        "proj_out": nn.init_conv2d(ks[depth + 1], in_ch, in_ch, 1, zero=True),
    }


def _apply_spatial_transformer(
    p, x, context, objs, num_heads, gate_scale, fuser_mask, impl
):
    """attention.py:366-379. x: NHWC."""
    b, h, w, c = x.shape
    x_in = x
    x = nn.group_norm(p["norm"], x, eps=1e-6)
    x = nn.conv2d(p["proj_in"], x, padding=0)
    x = x.reshape(b, h * w, c)
    for blk in p["blocks"]:
        x = _apply_transformer_block(
            blk, x, context, objs, num_heads, gate_scale, fuser_mask, impl
        )
    x = x.reshape(b, h, w, c)
    x = nn.conv2d(p["proj_out"], x, padding=0)
    return x + x_in


# ---------------------------------------------------------------------------
# ScaleU Fourier filter (openaimodel.py:25-48)
# ---------------------------------------------------------------------------


def fourier_filter(x: jnp.ndarray, threshold: int, scale: jnp.ndarray) -> jnp.ndarray:
    """Low-frequency rescale of an NHWC tensor (openaimodel.py:25-48
    semantics). `scale` may be a traced scalar (a ScaleU parameter).

    For the live configuration (threshold=1) the FFT mask touches exactly
    the frequency bins {0, -1} x {0, -1}, so instead of a full 2D FFT pair
    (~17% of UNet forward time on TPU) we project onto those four Fourier
    modes with four small contractions:
        filtered = x + (s - 1) * P(x),
        P(x) = Re[ conj(A) (A^T x B) conj(B)^T ] / (H*W),
    with A = [1, e^{-2pi i r/H}], B = [1, e^{-2pi i c/W}] — algebraically
    identical to the masked-FFT result (see test_scaleu_filter)."""
    if threshold != 1:
        return _fourier_filter_fft(x, threshold, scale)
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    _, h, w, _ = x.shape
    # complex bases as stacked (real, imag): shape (H, 2 modes, 2 parts)
    rh = jnp.arange(h, dtype=jnp.float32) * (2.0 * jnp.pi / h)
    rw = jnp.arange(w, dtype=jnp.float32) * (2.0 * jnp.pi / w)
    a = jnp.stack(
        [jnp.stack([jnp.ones_like(rh), jnp.zeros_like(rh)], -1),
         jnp.stack([jnp.cos(rh), -jnp.sin(rh)], -1)], 1
    )  # (H, 2, 2): A[r, m] = e^{-2pi i m r / H} as (re, im)
    b = jnp.stack(
        [jnp.stack([jnp.ones_like(rw), jnp.zeros_like(rw)], -1),
         jnp.stack([jnp.cos(rw), -jnp.sin(rw)], -1)], 1
    )  # (W, 2, 2)

    # inner[m, n] = sum_{r,c} A[r,m] * x[r,c] * B[c,n]  (complex)
    t_re = jnp.einsum("bhwc,hm->bmwc", xf, a[..., 0])
    t_im = jnp.einsum("bhwc,hm->bmwc", xf, a[..., 1])
    in_re = jnp.einsum("bmwc,wn->bmnc", t_re, b[..., 0]) - jnp.einsum(
        "bmwc,wn->bmnc", t_im, b[..., 1]
    )
    in_im = jnp.einsum("bmwc,wn->bmnc", t_re, b[..., 1]) + jnp.einsum(
        "bmwc,wn->bmnc", t_im, b[..., 0]
    )
    # proj = Re[ conj(A) inner conj(B)^T ]: conj flips the sign of im parts
    u_re = jnp.einsum("hm,bmnc->bhnc", a[..., 0], in_re) + jnp.einsum(
        "hm,bmnc->bhnc", a[..., 1], in_im
    )
    proj = (
        jnp.einsum("bhnc,wn->bhwc", u_re, b[..., 0])
        + jnp.einsum(
            "bhnc,wn->bhwc",
            jnp.einsum("hm,bmnc->bhnc", a[..., 0], in_im)
            - jnp.einsum("hm,bmnc->bhnc", a[..., 1], in_re),
            b[..., 1],
        )
    ) / (h * w)
    out = xf + (scale.astype(jnp.float32) - 1.0) * proj
    return out.astype(dtype)


def _fourier_filter_fft(x, threshold, scale):
    """General-threshold FFT path (reference formulation)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    _, h, w, _ = x.shape
    x_freq = jnp.fft.fftn(xf, axes=(1, 2))
    x_freq = jnp.fft.fftshift(x_freq, axes=(1, 2))
    crow, ccol = h // 2, w // 2
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    in_r = (rows >= crow - threshold) & (rows < crow + threshold)
    in_c = (cols >= ccol - threshold) & (cols < ccol + threshold)
    region = in_r[:, None] & in_c[None, :]
    mask = jnp.where(region[None, :, :, None], jnp.asarray(scale, jnp.float32), 1.0)
    x_freq = x_freq * mask
    x_freq = jnp.fft.ifftshift(x_freq, axes=(1, 2))
    out = jnp.fft.ifftn(x_freq, axes=(1, 2)).real
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# UNet init / apply
# ---------------------------------------------------------------------------


def init_unet(key, cfg: UNetConfig) -> Params:
    input_plan, middle_plan, output_plan = build_plan(cfg)
    emb_ch = cfg.model_channels * 4
    keys = iter(jax.random.split(key, 4096))

    def init_layer(spec: LayerSpec) -> Params:
        if spec.kind == "conv_in":
            return {"conv": nn.init_conv2d(next(keys), spec.in_ch, spec.out_ch, 3)}
        if spec.kind == "res":
            return _init_res_block(next(keys), spec.in_ch, spec.out_ch, emb_ch)
        if spec.kind == "attn":
            return _init_spatial_transformer(
                next(keys), spec.out_ch, cfg.context_dim, cfg.transformer_depth
            )
        if spec.kind in ("down", "up"):
            return {"conv": nn.init_conv2d(next(keys), spec.in_ch, spec.out_ch, 3)}
        raise ValueError(spec.kind)

    params: Params = {
        "time_embed": {
            "l1": nn.init_linear(next(keys), cfg.model_channels, emb_ch),
            "l2": nn.init_linear(next(keys), emb_ch, emb_ch),
        },
        "input_blocks": [[init_layer(s) for s in blk] for blk in input_plan],
        "middle_block": [init_layer(s) for s in middle_plan],
        "output_blocks": [[init_layer(s) for s in blk] for blk in output_plan],
        "out": {
            "norm": nn.init_norm(cfg.model_channels),
            "conv": nn.init_conv2d(
                next(keys), cfg.model_channels, cfg.out_channels, 3, zero=True
            ),
        },
        # ScaleU params per output block (openaimodel.py:441-443): b over the
        # *backbone* channels entering the block (= ch before the res block),
        # s a scalar FFT gate on the skip.
        "scaleu": [
            {"b": jnp.zeros((blk[0].in_ch - ich,), jnp.float32),
             "s": jnp.zeros((1,), jnp.float32)}
            for blk, ich in zip(output_plan, _skip_channels(cfg))
        ],
        "position_net": unifusion.init_unifusion(next(keys), cfg.grounding_tokenizer),
        # Stock SD1.5 first conv for the alpha==0 hot-swap
        # (openaimodel.py:469-480); initialized = trained conv, overwritten
        # by the checkpoint converter with SD_v1_5_input_conv_weight_bias.pth.
        "first_conv_sd": nn.init_conv2d(next(keys), cfg.in_channels, cfg.model_channels, 3),
    }
    return params


def _skip_channels(cfg: UNetConfig) -> list[int]:
    """Channel count of each skip connection popped by the 12 output blocks,
    in pop order (mirrors input_block_chans bookkeeping)."""
    mc = cfg.model_channels
    chans = [mc]
    ch = mc
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            ch = mult * mc
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            chans.append(ch)
    return chans[::-1]


def apply_unet(
    params: Params,
    cfg: UNetConfig,
    x: jnp.ndarray,                  # (B, H, W, 4) latent, NHWC
    timesteps: jnp.ndarray,          # (B,) int/float
    context: jnp.ndarray,            # (B, 77, 768) text conditioning
    grounding: dict | None,          # unifusion.Grounding tensors, or None
    gate_scale: jnp.ndarray | float = 1.0,   # per-step alpha (traced scalar)
    drops: "unifusion.ModalityDrops | None" = None,
    fuser_mask: jnp.ndarray | None = None,   # (B,1,N64+G,N64+G) bool, ds=1 only
    attn_impl: str = "auto",
    precomputed_objs: jnp.ndarray | None = None,
    remat: bool = False,
) -> jnp.ndarray:
    """eps-prediction forward (openaimodel.py:482-563).

    attn_impl: "auto" picks the fused Pallas flash kernel on TPU when
    cfg.efficient_attention (the reference's flash/SDPA switch,
    attention.py:134-144), XLA einsum attention otherwise.

    precomputed_objs: grounding tokens computed once outside a sampling
    scan — they are timestep-invariant, so samplers hoist UniFusion
    (including the ConvNeXt seg encoder) out of the 50-step loop instead of
    re-running it per step like the reference (openaimodel.py:494)."""
    on_cpu = jax.devices()[0].platform == "cpu"
    if attn_impl == "auto":
        attn_impl = "pallas" if (cfg.efficient_attention and not on_cpu) else "xla"
    elif attn_impl == "auto_train":
        # differentiable fused kernel on TPU, XLA on CPU
        attn_impl = "pallas_train" if (cfg.efficient_attention and not on_cpu) else "xla"
    gcfg = cfg.grounding_tokenizer

    if precomputed_objs is not None:
        objs = precomputed_objs
    else:
        if grounding is None:
            grounding = unifusion.null_grounding(x.shape[0], cfg.max_objs, gcfg)
        if drops is None:
            drops = unifusion.ModalityDrops.test_defaults(gcfg)
        # Grounding tokens: (B, G, out_dim); G = 4*max_objs + 64 seg tokens
        objs, drop_box_mask = unifusion.apply_unifusion(
            params["position_net"], gcfg, grounding, drops
        )
        del drop_box_mask  # folded into fuser_mask by the mask builder

    # keep Python scalars static (trace-time gate resolution + remat
    # compatibility); only traced gates stay traced
    if not isinstance(gate_scale, (int, float)):
        gate_scale = jnp.asarray(gate_scale, jnp.float32)

    # Time embedding
    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = nn.linear(
        params["time_embed"]["l2"],
        nn.silu(nn.linear(params["time_embed"]["l1"], t_emb)),
    )

    input_plan, middle_plan, output_plan = build_plan(cfg)

    # gradient checkpointing (training): rematerialize res/transformer block
    # activations in the backward pass (the reference checkpoints the same
    # blocks: openaimodel.py:231-234, attention.py:328-331)
    if remat:
        res_fn = jax.checkpoint(_apply_res_block)
        # gate_scale is closed over statically (training uses a Python 1.0):
        # passing it as a checkpoint argument would re-trace it and route
        # through lax.cond, which doesn't linearize under remat. The fuser
        # mask (dense array or label tuple) is a checkpoint ARGUMENT so
        # masked-attention training works under remat.
        attn_fn = jax.checkpoint(
            lambda p, h, ctx, ob, mask: _apply_spatial_transformer(
                p, h, ctx, ob, cfg.num_heads, gate_scale, mask, attn_impl
            )
        )
    else:
        res_fn = _apply_res_block
        attn_fn = None

    def run_layer(spec: LayerSpec, p: Params, h):
        if spec.kind == "conv_in":
            # Select trained vs stock-SD first conv on gate_scale == 0
            use_sd = gate_scale == 0.0
            w = jnp.where(use_sd, params["first_conv_sd"]["w"], p["conv"]["w"])
            b = jnp.where(use_sd, params["first_conv_sd"]["b"], p["conv"]["b"])
            return nn.conv2d({"w": w, "b": b}, h, padding=1)
        if spec.kind == "res":
            return res_fn(p, h, emb)
        if spec.kind == "attn":
            mask = fuser_mask if spec.ds == 1 else None
            if remat:
                return attn_fn(p, h, context, objs, mask)
            return _apply_spatial_transformer(
                p, h, context, objs, cfg.num_heads, gate_scale, mask, attn_impl
            )
        if spec.kind == "down":
            return nn.conv2d(p["conv"], h, stride=2, padding=1)
        if spec.kind == "up":
            return nn.conv2d(p["conv"], nn.upsample_nearest_2x(h), padding=1)
        raise ValueError(spec.kind)

    hs = []
    h = x
    for specs, ps in zip(input_plan, params["input_blocks"]):
        for spec, p in zip(specs, ps):
            h = run_layer(spec, p, h)
        hs.append(h)

    for spec, p in zip(middle_plan, params["middle_block"]):
        h = run_layer(spec, p, h)

    for idx, (specs, ps) in enumerate(zip(output_plan, params["output_blocks"])):
        # ScaleU (openaimodel.py:519-539): channelwise backbone rescale +
        # low-frequency FFT rescale of the skip, both tanh-gated around 1.
        hs_ = hs.pop()
        su = params["scaleu"][idx]
        b = (jnp.tanh(su["b"]) + 1.0).astype(h.dtype)
        s = jnp.tanh(su["s"]) + 1.0
        h = h * b
        hs_ = fourier_filter(hs_, threshold=1, scale=s)
        h = jnp.concatenate([h, hs_], axis=-1)
        for spec, p in zip(specs, ps):
            h = run_layer(spec, p, h)

    h = nn.group_norm(params["out"]["norm"], h, act="silu")
    return nn.conv2d(params["out"]["conv"], h, padding=1)
