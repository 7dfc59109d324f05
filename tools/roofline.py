"""Analytic roofline for the bench UNet forward (B = CFG batch, 64x64
latents): walks the exact layer plan (models/unet.build_plan) and counts
every matmul/conv FLOP and every unavoidable HBM byte, then divides by the
v5e ceilings to get the per-family floor the measured trace is judged
against (docs/PERF.md roofline table).

No TPU needed — pure arithmetic. Run: python tools/roofline.py [--batch 8]

v5e numbers (public: cloud.google.com/tpu/docs/v5e):
  197 TF/s bf16 MXU peak, 819 GB/s HBM.
MXU contraction/output dims use 128-wide passes, so a dot with contraction
dim d < 128 can reach at most 197 * d/128 (the d=40 attention wall).
"""


from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import argparse

PEAK_TFS = 197.0
HBM_GBS = 819.0


def mxu_eff(d: int) -> float:
    """Fraction of MXU peak reachable when the contraction dim is d."""
    import math

    passes = math.ceil(d / 128)
    return d / (passes * 128)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.models.unet import build_plan

    cfg = apply_test_preset(Config(), "box").model
    b = args.batch
    res0 = 64                     # latent side at ds=1
    heads = cfg.num_heads
    ctx = cfg.context_dim         # 768
    g_tokens = 184                # UniFusion grounding tokens

    plan_in, plan_mid, plan_out = build_plan(cfg)

    fam = {
        "conv": 0.0,            # all 3x3/1x1 convs incl. proj_in/out, res
        "attn_mm": {},          # {head_dim: flops} qk^T + sv (self+fuser)
        "attn_proj": 0.0,       # q/k/v/out projections (self+cross+fuser)
        "cross_mm": {},         # {head_dim: flops} cross-attn qk+sv (M=77)
        "ff": 0.0,              # GEGLU feed-forwards (block + fuser)
        "emb": 0.0,             # time-embedding MLP + per-res emb linears
    }
    norm_bytes = 0.0            # group/layer-norm HBM traffic (mem-bound)

    def conv(hw, cin, cout, k):
        fam["conv"] += 2.0 * b * hw * hw * cout * (k * k * cin)

    def linear(n_tok, cin, cout):
        return 2.0 * b * n_tok * cin * cout

    def res_block(hw, cin, cout):
        nonlocal norm_bytes
        conv(hw, cin, cout, 3)
        conv(hw, cout, cout, 3)
        if cin != cout:
            conv(hw, cin, cout, 1)
        fam["emb"] += linear(1, 4 * cfg.model_channels, cout)
        norm_bytes += 4.0 * b * hw * hw * (cin + cout)  # 2 GN in+out, bf16

    def attn_layer(hw, ch, ds):
        nonlocal norm_bytes
        n = hw * hw
        d = ch // heads
        # spatial transformer shell: GN + proj_in/out 1x1 convs
        conv(hw, ch, ch, 1)
        conv(hw, ch, ch, 1)
        # self-attention
        fam["attn_proj"] += 3 * linear(n, ch, ch) + linear(n, ch, ch)
        fam["attn_mm"][d] = fam["attn_mm"].get(d, 0.0) + 2 * (
            2.0 * b * heads * n * n * d
        )
        # cross-attention (M = 77 text tokens)
        fam["attn_proj"] += (
            linear(n, ch, ch) + 2 * linear(77, ctx, ch) + linear(n, ch, ch)
        )
        fam["cross_mm"][d] = fam["cross_mm"].get(d, 0.0) + 2 * (
            2.0 * b * heads * n * 77 * d
        )
        # block FF (GEGLU, mult 4)
        fam["ff"] += linear(n, ch, 8 * ch) + linear(n, 4 * ch, ch)
        # fuser (gatedSA): objs linear + self-attn over n+G (q = visual
        # rows only) + its own FF
        m = n + g_tokens
        fam["attn_proj"] += (
            linear(g_tokens, ctx, ch)            # objs projection
            + linear(n, ch, ch)                  # q (visual rows)
            + 2 * linear(m, ch, ch)              # k, v
            + linear(n, ch, ch)                  # out
        )
        fam["attn_mm"][d] = fam["attn_mm"].get(d, 0.0) + 2 * (
            2.0 * b * heads * n * m * d
        )
        fam["ff"] += linear(n, ch, 8 * ch) + linear(n, 4 * ch, ch)
        # 3 LN in block + 2 LN in fuser, in+out bf16
        norm_bytes += 5.0 * 2 * 2 * b * n * ch

    for block in plan_in + [plan_mid] + plan_out:
        specs = block if isinstance(block, list) else [block]
        for s in specs:
            hw = res0 // s.ds if s.kind == "attn" else None
            if s.kind == "conv_in":
                conv(res0, s.in_ch, s.out_ch, 3)
            elif s.kind == "res":
                # ds isn't stored on res specs; recover from neighbors
                pass
            elif s.kind == "attn":
                attn_layer(hw, s.out_ch, s.ds)

    # res blocks/down/up need the running ds; walk again with state
    ds = 1
    for block in plan_in:
        for s in block:
            if s.kind == "res":
                res_block(res0 // ds, s.in_ch, s.out_ch)
            elif s.kind == "down":
                ds *= 2
                conv(res0 // ds, s.in_ch, s.out_ch, 3)
    for s in plan_mid:
        if s.kind == "res":
            res_block(res0 // ds, s.in_ch, s.out_ch)
    for block in plan_out:
        for s in block:
            if s.kind == "res":
                res_block(res0 // ds, s.in_ch, s.out_ch)
            elif s.kind == "up":
                ds //= 2
                conv(res0 // ds, s.in_ch, s.out_ch, 3)
    conv(res0, cfg.model_channels, cfg.in_channels, 3)  # out head

    # time-embedding MLP (once per fwd)
    fam["emb"] += linear(1, cfg.model_channels, 4 * cfg.model_channels)
    fam["emb"] += linear(1, 4 * cfg.model_channels, 4 * cfg.model_channels)

    tot_tf = 0.0
    floor_ms = 0.0
    print(f"B={b} analytic forward cost (TFLOP) and v5e floor (ms):")
    rows = []
    for name, val in fam.items():
        if isinstance(val, dict):
            for d, fl in sorted(val.items()):
                eff = mxu_eff(d)
                ms = fl / (PEAK_TFS * eff) / 1e9
                rows.append((f"{name}[d={d}]", fl / 1e12,
                             PEAK_TFS * eff, ms))
                tot_tf += fl / 1e12
                floor_ms += ms
        else:
            ms = val / PEAK_TFS / 1e9
            rows.append((name, val / 1e12, PEAK_TFS, ms))
            tot_tf += val / 1e12
            floor_ms += ms
    norm_ms = norm_bytes / HBM_GBS / 1e6
    rows.append(("norms (HBM)", 0.0, 0.0, norm_ms))
    floor_ms += norm_ms
    for name, tf, peak, ms in rows:
        peak_s = f"@{peak:5.0f} TF/s" if peak else " (mem-bound)"
        print(f"  {name:18s} {tf:7.3f} TF {peak_s}  -> {ms:6.2f} ms")
    print(f"  {'TOTAL':18s} {tot_tf:7.3f} TF            -> {floor_ms:6.2f} ms")
    n_img = b // 2  # CFG halves
    steps = 50
    ceil_rate = n_img / (steps * floor_ms / 1e3)
    print(f"\n50-step {n_img}-image ceiling at this floor: "
          f"{ceil_rate:.2f} img/s/chip (UNet only; +VAE/sampler overhead)")


if __name__ == "__main__":
    main()
