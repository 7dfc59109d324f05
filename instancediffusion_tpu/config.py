"""Typed configuration for InstanceDiffusion-TPU.

Replaces the reference's OmegaConf YAML + reflective `target:` instantiation
(`ldm/util.py:71-86`, `configs/train_sd15.yaml`) with plain dataclasses that
are YAML-loadable but never import classes by string. The knob set mirrors
`configs/{train_sd15,test_box,test_point,test_scribble,test_mask,test_sd15}.yaml`
— the five test configs differ from train only in the `test_drop_*` modality
flags and `prob_use_caption`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class DiffusionConfig:
    # configs/test_box.yaml:1-6
    beta_schedule: str = "linear"
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.012


@dataclass
class UniFusionConfig:
    # configs/test_box.yaml:26-40 (text_grounding_net.py:7-44 hyperparams)
    in_dim: int = 768
    out_dim: int = 768
    mid_dim: int = 3072
    fourier_freqs: int = 16            # text_grounding_net.py:20 (hardcoded 16)
    fourier_freqs_polygons: int = 16   # text_grounding_net.py:21
    n_scribble_points: int = 20
    n_polygon_points: int = 256
    train_add_boxes: bool = True
    train_add_points: bool = True
    train_add_scribbles: bool = True
    train_add_masks: bool = True
    test_drop_boxes: bool = False
    test_drop_points: bool = False
    test_drop_scribbles: bool = True
    test_drop_masks: bool = False
    use_seperate_tokenizer: bool = True  # (sic — reference spelling)
    # seg branch (text_grounding_net.py:31-39)
    seg_channels: int = 30  # = max_objs; stacked instance masks as channels
    seg_resize_input: int = 512
    seg_down_factor: int = 64
    convnext_feature_dim: int = 3072
    # ConvNeXt size (defaults = ConvNeXt-T, convnext.py:151-158 in the
    # reference); micro test/dryrun configs shrink these — a full -T
    # fwd+bwd costs ~35s/step on a 1-core CPU host
    convnext_depths: tuple[int, ...] = (3, 3, 9, 3)
    convnext_dims: tuple[int, ...] = (96, 192, 384, 768)

    @property
    def use_segs(self) -> bool:
        return self.train_add_masks

    @property
    def num_seg_tokens(self) -> int:
        return (self.seg_resize_input // self.seg_down_factor) ** 2  # 64


@dataclass
class UNetConfig:
    # configs/test_box.yaml:8-24
    image_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 320
    attention_resolutions: tuple[int, ...] = (4, 2, 1)
    num_res_blocks: int = 2
    channel_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    fuser_type: str = "gatedSA"
    use_checkpoint: bool = True
    sd_v1_5: bool = True
    efficient_attention: bool = True   # -> Pallas flash path on TPU
    dropout: float = 0.0
    max_objs: int = 30
    # instance attention masking in the fuser (reference return_att_masks /
    # use_masked_att, off by default upstream too: inference.py:182)
    use_masked_att: bool = False
    grounding_tokenizer: UniFusionConfig = field(default_factory=UniFusionConfig)


@dataclass
class RefinerUNetConfig:
    """SDXL-Refiner UNet (stabilityai/stable-diffusion-xl-refiner-1.0).

    Values from the public sgm config `sd_xl_refiner.yaml` (UNetModel
    params). The reference runs this model through diffusers
    (inference.py:112-129); here it is a native model family — see
    models/sdxl_refiner.py."""
    image_size: int = 128              # 1024px latents
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 384
    attention_resolutions: tuple[int, ...] = (4, 2)
    num_res_blocks: int = 2
    channel_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_head_channels: int = 64        # heads = ch // 64 per level
    transformer_depth: int = 4
    context_dim: int = 1280            # OpenCLIP bigG penultimate states
    adm_in_channels: int = 2560        # 5 x 256 fourier + 1280 pooled text
    efficient_attention: bool = True


@dataclass
class OpenCLIPTextConfig:
    """OpenCLIP ViT-bigG/14 text tower (the SDXL-Refiner conditioner)."""
    vocab_size: int = 49408
    max_length: int = 77
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 20
    activation: str = "gelu"           # CLIP-L uses quick_gelu
    projection_dim: int = 1280


@dataclass
class VAEConfig:
    # configs/test_box.yaml:42-61
    scale_factor: float = 0.18215
    embed_dim: int = 4
    double_z: bool = True
    z_channels: int = 4
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: tuple[int, ...] = ()
    dropout: float = 0.0


@dataclass
class TextEncoderConfig:
    # FrozenCLIPEmbedder, openai/clip-vit-large-patch14 text tower
    # (ldm/modules/encoders/modules.py:144-172)
    vocab_size: int = 49408
    max_length: int = 77
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12


@dataclass
class SamplerConfig:
    # inference.py:167-179 defaults
    steps: int = 50
    guidance_scale: float = 7.5
    alpha: float = 0.75           # fraction of steps with gate scale 1
    mis: float = 0.36             # fraction of steps using MIS trajectories
    negative_prompt: str = (
        "longbody, lowres, bad anatomy, bad hands, missing fingers, extra "
        "digit, fewer digits, cropped, worst quality, low quality"
    )
    num_images: int = 8
    seed: int = 0
    cascade_strength: float = 0.0  # SDXL refiner not bundled; keep the knob
    # 'plms' = reference protocol (inference.py:60-63); 'dpm' =
    # DPM-Solver++(2M) fast serving (~20 steps ~= 50-step PLMS quality);
    # 'ddim' = eta-0 ablation baseline
    sampler: str = "plms"


@dataclass
class DataConfig:
    # configs/train_sd15.yaml Grounding dataset knobs
    image_size: int = 512
    max_boxes_per_data: int = 30
    prob_use_caption: float = 1.0
    random_crop: bool = False
    random_flip: bool = True
    which_layer_text: str = "before"


@dataclass
class TrainConfig:
    # main_submitit.py:15-82 defaults
    batch_size: int = 8
    base_learning_rate: float = 5e-5
    weight_decay: float = 0.0
    warmup_steps: int = 5000
    scheduler_type: str = "constant"  # or "cosine"
    total_iters: int = 500000
    save_every_iters: int = 10000
    ckpt_every_iters: int = 2000
    ema_rate: float = 0.9999
    enable_ema: bool = True
    gradient_checkpointing: bool = True
    # ZeRO-1: shard AdamW moments + EMA over the 'data' mesh axis
    # (parallel/zero.py). No-op on one chip; ~3.9GB/chip saved at N=8.
    zero1: bool = True
    seed: int = 123
    workers: int = 4
    official_ckpt_name: str = "v1-5-pruned-emaonly.ckpt"
    name: str = "test"
    output_dir: str = "OUTPUT"
    wandb: bool = False               # main_submitit.py:112-119 (rank 0)
    # in-training sampling dump (utils/checkpoint.py:146-212): rank 0 runs
    # the full sampler on this many training batches every save_every_iters
    n_sample_batches: int = 10
    sample_steps: int = 50


@dataclass
class Config:
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    model: UNetConfig = field(default_factory=UNetConfig)
    autoencoder: VAEConfig = field(default_factory=VAEConfig)
    text_encoder: TextEncoderConfig = field(default_factory=TextEncoderConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


def _update_dataclass(obj: Any, updates: dict[str, Any]) -> Any:
    kwargs = {}
    for f in dataclasses.fields(obj):
        if f.name in updates:
            cur = getattr(obj, f.name)
            val = updates[f.name]
            if dataclasses.is_dataclass(cur) and isinstance(val, dict):
                kwargs[f.name] = _update_dataclass(cur, val)
            elif isinstance(cur, tuple) and isinstance(val, (list, tuple)):
                kwargs[f.name] = tuple(val)
            else:
                kwargs[f.name] = val
    return dataclasses.replace(obj, **kwargs)


def load_config(path: str | None = None, overrides: dict[str, Any] | None = None) -> Config:
    """Build a Config from an optional YAML file plus a flat/nested override
    dict (the reference's `config.update(vars(args))` pattern, typed)."""
    cfg = Config()
    if path is not None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _update_dataclass(cfg, data)
    if overrides:
        cfg = _update_dataclass(cfg, overrides)
    return cfg


# Preset modality selections matching the five reference test yamls
# (diff of configs/test_*.yaml — only test_drop_* flags change).
TEST_PRESETS: dict[str, dict[str, bool]] = {
    # test_box.yaml: boxes+points, no scribbles/masks
    "box": dict(test_drop_boxes=False, test_drop_points=False,
                test_drop_scribbles=True, test_drop_masks=True),
    # test_point.yaml: points only
    "point": dict(test_drop_boxes=True, test_drop_points=False,
                  test_drop_scribbles=True, test_drop_masks=True),
    # test_scribble.yaml: everything on
    "scribble": dict(test_drop_boxes=False, test_drop_points=False,
                     test_drop_scribbles=False, test_drop_masks=False),
    # test_mask.yaml / test_sd15.yaml / train_sd15.yaml: boxes+points+masks
    "mask": dict(test_drop_boxes=False, test_drop_points=False,
                 test_drop_scribbles=True, test_drop_masks=False),
    "all": dict(test_drop_boxes=False, test_drop_points=False,
                test_drop_scribbles=True, test_drop_masks=False),
}


def apply_test_preset(cfg: Config, preset: str) -> Config:
    gt = dataclasses.replace(cfg.model.grounding_tokenizer, **TEST_PRESETS[preset])
    model = dataclasses.replace(cfg.model, grounding_tokenizer=gt)
    return dataclasses.replace(cfg, model=model)
