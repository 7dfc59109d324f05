"""LoRA adapter loading: merge community SD1.5 LoRA files into the
converted param trees.

Beyond the reference (which has no adapter story): the SD1.5 ecosystem
distributes thousands of LoRA fine-tunes, and since InstanceDiffusion's
backbone IS frozen SD1.5 (only fuser/UniFusion/ScaleU retrain —
utils/optimizer.py:15-42), a style/subject LoRA merged into the frozen
backbone composes directly with instance conditioning.

Merged, not runtime-adapted: production serving here merges ΔW = up@down
into the weights at load time — zero per-step cost, no new compiled
graphs, works unchanged under TP sharding and the Pallas kernels.

Supported key formats (auto-detected per key):
  * kohya / sd-scripts: ``lora_unet_<module>_...{.lora_down|.lora_up}.weight``
    + per-module ``.alpha`` scalars, diffusers module topology with
    underscore separators; ``lora_te_...`` for the text encoder
  * diffusers / PEFT:   ``unet.<module>.lora_A.weight`` / ``.lora_B.weight``
    (A = down, B = up; alpha assumed = rank), ``text_encoder.`` prefix for
    the text tower

Covered modules: attn1/attn2 q/k/v/out, GEGLU ff proj/out, proj_in /
proj_out 1x1 convs (UNet); q/k/v/out/fc1/fc2 (CLIP text). Unknown keys
are counted and reported, never silently dropped.

Scaling: ΔW_torch = up @ down * (alpha / rank) * scale; our linear layout
is the transpose (w = W_torch.T), conv1x1 reshapes to (1, 1, in, out).

Diffusers -> LDM block index mapping (SD1.5 topology):
  down_blocks[i].attentions[j] -> input_blocks[3*i + j + 1]
  mid_block.attentions[0]      -> middle_block
  up_blocks[i].attentions[j]   -> output_blocks[3*i + j]
"""

from __future__ import annotations

import re

import numpy as np

# -- key parsing ---------------------------------------------------------------

_LEAF = (
    r"(?P<leaf>attn[12]_to_(?:q|k|v|out_0)|ff_net_(?:0_proj|2))"
)
_UNET_RES = [
    re.compile(
        r"down_blocks_(?P<i>\d+)_attentions_(?P<j>\d+)"
        r"_transformer_blocks_(?P<d>\d+)_" + _LEAF + r"$"
    ),
    re.compile(
        r"mid_block_attentions_(?P<j>0)"
        r"_transformer_blocks_(?P<d>\d+)_" + _LEAF + r"$"
    ),
    re.compile(
        r"up_blocks_(?P<i>\d+)_attentions_(?P<j>\d+)"
        r"_transformer_blocks_(?P<d>\d+)_" + _LEAF + r"$"
    ),
    re.compile(
        r"down_blocks_(?P<i>\d+)_attentions_(?P<j>\d+)_(?P<leaf>proj_in|proj_out)$"
    ),
    re.compile(
        r"mid_block_attentions_(?P<j>0)_(?P<leaf>proj_in|proj_out)$"
    ),
    re.compile(
        r"up_blocks_(?P<i>\d+)_attentions_(?P<j>\d+)_(?P<leaf>proj_in|proj_out)$"
    ),
]
_TE_RE = re.compile(
    r"text_model_encoder_layers_(?P<i>\d+)_"
    r"(?P<leaf>self_attn_(?:q|k|v|out)_proj|mlp_fc1|mlp_fc2)$"
)

_TE_LEAF = {
    "self_attn_q_proj": "q", "self_attn_k_proj": "k",
    "self_attn_v_proj": "v", "self_attn_out_proj": "out",
    "mlp_fc1": "fc1", "mlp_fc2": "fc2",
}


def _parse_unet_module(mod: str):
    """kohya-style underscore module name -> (block_kind, block_idx,
    leaf_path) in OUR tree, or None if unrecognized."""
    for rx in _UNET_RES:
        m = rx.match(mod)
        if not m:
            continue
        g = m.groupdict()
        if mod.startswith("down_"):
            loc = ("input_blocks", 3 * int(g["i"]) + int(g["j"]) + 1)
        elif mod.startswith("mid_"):
            loc = ("middle_block", None)
        else:
            loc = ("output_blocks", 3 * int(g["i"]) + int(g["j"]))
        leaf = g["leaf"]
        if leaf in ("proj_in", "proj_out"):
            return loc + ((leaf,),)
        d = int(g["d"])
        if leaf.startswith("attn"):
            attn, _, tail = leaf.partition("_to_")
            target = "to_out" if tail == "out_0" else "to_" + tail
            return loc + (("blocks", d, attn, target),)
        # ff_net_0_proj / ff_net_2
        return loc + (("blocks", d, "ff",
                       "proj" if leaf == "ff_net_0_proj" else "out"),)
    return None


def _collect_pairs(sd: dict[str, np.ndarray]):
    """Group raw LoRA keys into {(tower, module): {down, up, alpha}}.
    tower is 'unet' or 'te'; module is the kohya-style underscore name."""
    mods: dict[tuple, dict] = {}
    unknown = []

    def put(tower, mod, part, v):
        mods.setdefault((tower, mod), {})[part] = v

    for k, v in sd.items():
        if k.startswith(("lora_unet_", "lora_te_")):  # kohya
            tower = "unet" if k.startswith("lora_unet_") else "te"
            body = k.split("_", 2 if tower == "unet" else 2)[2]
            if body.endswith(".lora_down.weight"):
                put(tower, body[: -len(".lora_down.weight")], "down", v)
            elif body.endswith(".lora_up.weight"):
                put(tower, body[: -len(".lora_up.weight")], "up", v)
            elif body.endswith(".alpha"):
                put(tower, body[: -len(".alpha")], "alpha", float(v))
            else:
                unknown.append(k)
        elif k.startswith(("unet.", "text_encoder.")):  # diffusers/peft
            tower = "unet" if k.startswith("unet.") else "te"
            body = k.split(".", 1)[1]
            for tag, part in ((".lora_A.weight", "down"),
                              (".lora_B.weight", "up"),
                              (".lora_A.default.weight", "down"),
                              (".lora_B.default.weight", "up")):
                if body.endswith(tag):
                    mod = body[: -len(tag)].replace(".", "_")
                    put(tower, mod, part, v)
                    break
            else:
                unknown.append(k)
        else:
            unknown.append(k)
    return mods, unknown


def _delta(pair: dict, scale: float) -> np.ndarray | None:
    """ΔW in OUR (in, out) linear layout; None if the pair is incomplete."""
    if "down" not in pair or "up" not in pair:
        return None
    down = np.asarray(pair["down"], np.float32)
    up = np.asarray(pair["up"], np.float32)
    if down.ndim == 4:  # conv1x1 lora: (r, in, 1, 1) / (out, r, 1, 1)
        down = down[..., 0, 0]
        up = up[..., 0, 0]
    r = down.shape[0]
    alpha = float(pair.get("alpha", r))
    return (down.T @ up.T) * (alpha / r) * scale  # (in, out)


def _find_spatial(entry):
    """Locate the SpatialTransformer dict inside a block's layer list."""
    if isinstance(entry, dict):
        entry = [entry]
    for layer in entry:
        if isinstance(layer, dict) and "blocks" in layer:
            return layer
    return None


def _add_into(tree, path, delta, conv: bool):
    node = tree
    for p in path[:-1]:
        node = node[p]
    leaf = node[path[-1]]
    w = leaf["w"]
    if conv:  # (1, 1, in, out) 1x1 conv
        delta = delta.reshape(w.shape)
    if delta.shape != tuple(w.shape):
        raise ValueError(
            f"LoRA shape {delta.shape} does not match weight {tuple(w.shape)} "
            f"at {'/'.join(map(str, path))} — wrong base model?"
        )
    leaf["w"] = (np.asarray(w, np.float32) + delta).astype(
        np.asarray(w).dtype
    )


def merge_lora(
    unet_params,
    lora_sd: dict[str, np.ndarray],
    scale: float = 1.0,
    clip_params=None,
) -> dict:
    """Merge a LoRA state dict into unet_params (and clip_params when
    given) IN PLACE (numpy trees from the converter). Returns stats:
    {applied_unet, applied_te, skipped_te, unknown: [keys]}."""
    mods, unknown = _collect_pairs(lora_sd)
    stats = {"applied_unet": 0, "applied_te": 0, "skipped_te": 0,
             "unknown": unknown}
    for (tower, mod), pair in sorted(mods.items()):
        delta = _delta(pair, scale)
        if delta is None:
            stats["unknown"].append(mod)
            continue
        if tower == "unet":
            parsed = _parse_unet_module(mod)
            if parsed is None:
                stats["unknown"].append(mod)
                continue
            kind, idx, leaf_path = parsed
            entry = (unet_params[kind] if idx is None
                     else unet_params[kind][idx])
            spatial = _find_spatial(entry)
            if spatial is None:
                stats["unknown"].append(mod)
                continue
            _add_into(spatial, leaf_path, delta,
                      conv=leaf_path[-1] in ("proj_in", "proj_out"))
            stats["applied_unet"] += 1
        else:
            m = _TE_RE.match(mod)
            if m is None:
                stats["unknown"].append(mod)
                continue
            if clip_params is None:
                stats["skipped_te"] += 1
                continue
            layer = clip_params["layers"][int(m.group("i"))]
            _add_into(layer, (_TE_LEAF[m.group("leaf")],), delta, conv=False)
            stats["applied_te"] += 1
    return stats


def load_lora_file(path: str) -> dict[str, np.ndarray]:
    """Read a LoRA checkpoint (.safetensors / torch pickle) to numpy."""
    from instancediffusion_tpu.io.torch_convert import load_torch_checkpoint

    return load_torch_checkpoint(path)
