"""LoRA adapter merging tests (io/lora.py): kohya + diffusers/PEFT key
formats, exact delta math, block-index mapping, error paths, and the
pipeline-level merge on the tiny config."""

import numpy as np
import pytest

from instancediffusion_tpu.io.lora import merge_lora


def _lin(c_in, c_out, seed):
    r = np.random.default_rng(seed)
    return {"w": r.normal(size=(c_in, c_out)).astype(np.float32),
            "b": np.zeros(c_out, np.float32)}


def _spatial(c=8, inner=16, seed=0):
    blk = {
        "attn1": {k: _lin(c, c, seed + i) for i, k in
                  enumerate(["to_q", "to_k", "to_v", "to_out"])},
        "attn2": {k: _lin(c, c, seed + 10 + i) for i, k in
                  enumerate(["to_q", "to_k", "to_v", "to_out"])},
        "ff": {"proj": _lin(c, 2 * inner, seed + 20),
               "out": _lin(inner, c, seed + 21)},
    }
    return {
        "proj_in": {"w": np.random.default_rng(seed + 30)
                    .normal(size=(1, 1, c, c)).astype(np.float32)},
        "proj_out": {"w": np.random.default_rng(seed + 31)
                     .normal(size=(1, 1, c, c)).astype(np.float32)},
        "blocks": [blk],
    }


def _fake_unet(c=8):
    """SD1.5-shaped block lists: attentions where the diffusers mapping
    expects them (input 1..9 -> down i attn j at 3i+j+1; output 3..11)."""
    res = {"in_conv": {"w": np.zeros((3, 3, c, c), np.float32)}}
    inp = [[{"conv": None}]] + [
        [dict(res), _spatial(c, seed=i)] if i in
        {1, 2, 4, 5, 7, 8} else [dict(res)]
        for i in range(1, 12)
    ]
    out = [
        [dict(res), _spatial(c, seed=100 + i)] if i >= 3 else [dict(res)]
        for i in range(12)
    ]
    return {
        "input_blocks": inp,
        "middle_block": [dict(res), _spatial(c, seed=50), dict(res)],
        "output_blocks": out,
    }


def _pair(prefix, c_in, c_out, rank=4, alpha=2.0, seed=0):
    r = np.random.default_rng(seed)
    down = r.normal(size=(rank, c_in)).astype(np.float32)
    up = r.normal(size=(c_out, rank)).astype(np.float32)
    return {
        f"{prefix}.lora_down.weight": down,
        f"{prefix}.lora_up.weight": up,
        f"{prefix}.alpha": np.float32(alpha),
    }, (down.T @ up.T) * (alpha / rank)


def test_kohya_unet_mapping_and_math():
    unet = _fake_unet()
    sd = {}
    k1, d1 = _pair(
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q",
        8, 8, seed=1)
    k2, d2 = _pair(
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_ff_net_2",
        16, 8, seed=2)
    k3, d3 = _pair(
        "lora_unet_up_blocks_1_attentions_2_transformer_blocks_0_attn2_to_out_0",
        8, 8, seed=3)
    sd.update(k1), sd.update(k2), sd.update(k3)

    w1 = unet["input_blocks"][1][1]["blocks"][0]["attn1"]["to_q"]["w"].copy()
    w2 = unet["middle_block"][1]["blocks"][0]["ff"]["out"]["w"].copy()
    w3 = unet["output_blocks"][5][1]["blocks"][0]["attn2"]["to_out"]["w"].copy()

    stats = merge_lora(unet, sd, scale=0.5)
    assert stats["applied_unet"] == 3 and not stats["unknown"]
    np.testing.assert_allclose(
        unet["input_blocks"][1][1]["blocks"][0]["attn1"]["to_q"]["w"],
        w1 + 0.5 * d1, rtol=1e-6)
    np.testing.assert_allclose(
        unet["middle_block"][1]["blocks"][0]["ff"]["out"]["w"],
        w2 + 0.5 * d2, rtol=1e-6)
    np.testing.assert_allclose(
        unet["output_blocks"][5][1]["blocks"][0]["attn2"]["to_out"]["w"],
        w3 + 0.5 * d3, rtol=1e-6)


def test_conv1x1_and_unknown_keys():
    unet = _fake_unet()
    r = np.random.default_rng(7)
    down = r.normal(size=(4, 8, 1, 1)).astype(np.float32)
    up = r.normal(size=(8, 4, 1, 1)).astype(np.float32)
    sd = {
        "lora_unet_down_blocks_0_attentions_1_proj_in.lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_1_proj_in.lora_up.weight": up,
        "lora_unet_down_blocks_0_attentions_1_proj_in.alpha": np.float32(4),
        "lora_unet_time_embed_whatever.lora_down.weight": down,  # unmapped
        "lora_unet_time_embed_whatever.lora_up.weight": up,
        "totally_random_key": np.zeros(1, np.float32),
    }
    w0 = unet["input_blocks"][2][1]["proj_in"]["w"].copy()
    stats = merge_lora(unet, sd, scale=1.0)
    assert stats["applied_unet"] == 1
    assert "totally_random_key" in stats["unknown"]
    assert any("time_embed" in u for u in stats["unknown"])
    expect = (down[..., 0, 0].T @ up[..., 0, 0].T).reshape(1, 1, 8, 8)
    np.testing.assert_allclose(
        unet["input_blocks"][2][1]["proj_in"]["w"], w0 + expect, rtol=1e-6)


def test_peft_format_and_text_encoder():
    unet = _fake_unet()
    clip = {"layers": [{k: _lin(8, 8, i) for i, k in
                        enumerate(["q", "k", "v", "out", "fc1", "fc2"])}]}
    r = np.random.default_rng(9)
    a = r.normal(size=(4, 8)).astype(np.float32)   # lora_A = down
    b = r.normal(size=(8, 4)).astype(np.float32)   # lora_B = up
    sd = {
        "unet.up_blocks.3.attentions.0.transformer_blocks.0.attn1.to_v"
        ".lora_A.weight": a,
        "unet.up_blocks.3.attentions.0.transformer_blocks.0.attn1.to_v"
        ".lora_B.weight": b,
        "text_encoder.text_model.encoder.layers.0.self_attn.q_proj"
        ".lora_A.weight": a,
        "text_encoder.text_model.encoder.layers.0.self_attn.q_proj"
        ".lora_B.weight": b,
    }
    wq0 = clip["layers"][0]["q"]["w"].copy()
    wv0 = unet["output_blocks"][9][1]["blocks"][0]["attn1"]["to_v"]["w"].copy()
    stats = merge_lora(unet, sd, scale=1.0, clip_params=clip)
    assert stats["applied_unet"] == 1 and stats["applied_te"] == 1
    delta = a.T @ b.T  # alpha defaults to rank -> factor 1
    np.testing.assert_allclose(
        unet["output_blocks"][9][1]["blocks"][0]["attn1"]["to_v"]["w"],
        wv0 + delta, rtol=1e-6)
    np.testing.assert_allclose(clip["layers"][0]["q"]["w"], wq0 + delta,
                               rtol=1e-6)

    # te keys without clip_params are counted, not applied
    stats2 = merge_lora(_fake_unet(), sd, scale=1.0)
    assert stats2["skipped_te"] == 1


def test_shape_mismatch_raises():
    unet = _fake_unet()
    keys, _ = _pair(
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q",
        16, 16, seed=1)  # wrong width for the 8-wide fake model
    with pytest.raises(ValueError, match="does not match weight"):
        merge_lora(unet, keys)


@pytest.mark.heavy
def test_pipeline_load_lora_changes_generation(tmp_path):
    from tests.test_pipeline import _patch_meta, tiny_config
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline
    import instancediffusion_tpu.data.grounding_input as gi

    pipe = InstanceDiffusionPipeline.random_init(tiny_config(), seed=0)
    meta = _patch_meta(pipe)
    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    try:
        # A RANDOM-INIT SD UNet's output is insensitive to its interior:
        # the final out.conv is zero-initialized (SD zero_module,
        # openaimodel.py:460-463 — the reference does the same), so eps is
        # a constant and every upstream weight is gradient-dead until
        # training. Make the head nonzero so a merged LoRA is observable;
        # similarly target proj_out (the other zero_module) so the spatial
        # block itself becomes live.
        oc = pipe.params.unet["out"]["conv"]
        rng = np.random.default_rng(1)
        oc["w"] = (np.asarray(oc["w"], np.float32)
                   + 0.1 * rng.normal(size=oc["w"].shape)).astype(
                       np.asarray(oc["w"]).dtype)

        before = pipe.generate(meta, num_images=1, steps=4, mis=0.0, seed=1)
        # tiny config: input_blocks[1] holds the (32-wide) spatial block,
        # exactly where down_blocks_0_attentions_0 maps
        rng = np.random.default_rng(0)
        lora = {
            "lora_unet_down_blocks_0_attentions_0_proj_out"
            ".lora_down.weight":
                rng.normal(size=(4, 32, 1, 1)).astype(np.float32),
            "lora_unet_down_blocks_0_attentions_0_proj_out"
            ".lora_up.weight":
                (5.0 * rng.normal(size=(32, 4, 1, 1))).astype(np.float32),
            "lora_unet_down_blocks_0_attentions_0_proj_out"
            ".alpha": np.float32(4),
        }
        import torch

        path = str(tmp_path / "lora.pt")
        torch.save(
            {k: torch.from_numpy(np.asarray(v)) for k, v in lora.items()},
            path,
        )

        stats = pipe.load_lora(path, scale=1.0)
        assert stats["applied_unet"] == 1, stats
        after = pipe.generate(meta, num_images=1, steps=4, mis=0.0, seed=1)
        assert not np.array_equal(before, after)
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old
