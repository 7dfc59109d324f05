"""Demo CLI: instance-conditioned image generation from a demo JSON.

Public surface parity with the reference `inference.py` (:165-310): same
flags (--input_json/--num_images/--guidance_scale/--negative_prompt/--ckpt/
--seed/--alpha/--mis/--test_config/--output/--cascade_strength; beyond the
reference: --sampler/--lora/--img2img/--strength) and the same
demo-JSON schema (caption, width/height, annos[] with bbox/mask/point/
scribble/caption). Writes PNGs plus a box-overlay image.

Reference quirk reproduced by default: the demo path zeroes the decoded
binary masks before sampling scribbles/polygons/segs (inference.py:249-251),
so demos exercise boxes+points (+explicit scribbles) only. Pass
--use_masks to actually honor the JSON's RLE masks.

Usage:
  python -m instancediffusion_tpu.inference --input_json demos/demo.json \
      --ckpt pretrained/instancediffusion_sd15.pth --test_config mask

Without --ckpt (no pretrained weights present) the pipeline runs with
random-init weights — a smoke/latency surface, not a fidelity one.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from instancediffusion_tpu.config import Config, apply_test_preset
from instancediffusion_tpu.data import geometry as geo


def parse_demo_json(path: str, use_masks: bool = False, rng=None) -> dict:
    """inference.py:188-297 semantics -> meta dict for the pipeline."""
    rng = rng or np.random.default_rng(0)
    with open(path) as f:
        data = json.load(f)

    width, height = data["width"], data["height"]
    boxes, masks, phrases, points_list, scribbles_list = [], [], [], [], []
    for anno in data["annos"]:
        if use_masks and anno.get("mask"):
            masks.append(geo.decode_to_binary_mask(anno["mask"]).astype(np.float32))
        else:
            masks.append(np.zeros((512, 512, 1), np.float32))
        boxes.append(anno.get("bbox", [0, 0, 0, 0]))
        if "point" in anno:
            points_list.append(anno["point"])
        if "scribble" in anno:
            scribbles_list.append(anno["scribble"])
        phrases.append(anno["caption"])

    locations = [geo.rescale_box_xywh(b, width, height) for b in boxes]
    if len(points_list) == len(locations):
        points = [geo.rescale_points(p, width, height) for p in points_list]
    else:
        points = [geo.point_from_box(b) for b in locations]

    if len(scribbles_list) == len(locations):
        scribbles = [
            geo.reorder_scribbles(geo.rescale_scribbles(s, width, height))
            for s in scribbles_list
        ]
        scribbles = [np.asarray(s, np.float32).reshape(-1).tolist() for s in scribbles]
    else:
        scribbles = []
        for m in masks:
            s = geo.sample_random_points_from_mask(m, 20, rng)
            scribbles.append(geo.convert_points(s, width, height))

    polygons, segs = [], []
    for m in masks:
        poly = geo.sample_sparse_points_from_mask(m, k=256, rng=rng)
        if poly is None:
            poly = [0.0] * 512
        polygons.append(geo.convert_points(poly, width, height))
        import cv2

        seg = cv2.resize(m[:, :, 0], (512, 512), interpolation=cv2.INTER_NEAREST)
        segs.append(seg.astype(np.float32))

    return {
        "prompt": data["caption"],
        "phrases": phrases,
        "locations": locations,
        "points": points,
        "scribbles": scribbles,
        "polygons": polygons,
        "segs": segs,
    }


def draw_boxes_image(locations, phrases, caption) -> "object":
    """inference.py:151-163: white 512x512 with box outlines + labels."""
    from PIL import Image, ImageDraw

    img = Image.new("RGB", (512, 512), (255, 255, 255))
    d = ImageDraw.Draw(img)
    for box, phrase in zip(locations, phrases):
        px = [int(v * 512) for v in box]
        d.rectangle(((px[0], px[1]), (px[2], px[3])), outline=(0, 0, 0), width=2)
        d.text((px[0], px[1]), phrase, fill="black")
    if caption:
        d.text((0, 0), caption, fill=(255, 102, 102))
    return img


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output", type=str, default="OUTPUT")
    p.add_argument("--num_images", type=int, default=8)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--input_json", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--alpha", type=float, default=0.75,
                   help="fraction of steps with grounding gate on")
    p.add_argument("--mis", type=float, default=0.36,
                   help="fraction of steps using Multi-Instance Sampler")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--cascade_strength", type=float, default=0.0,
                   help="native SDXL-Refiner img2img pass (0 = off)")
    p.add_argument("--refiner_ckpt", type=str, default=None,
                   help="sd_xl_refiner_1.0.safetensors path (random-init "
                        "smoke refiner without it)")
    p.add_argument("--test_config", type=str, default="mask",
                   choices=["box", "point", "scribble", "mask", "all"],
                   help="modality preset (the reference's test_*.yaml)")
    p.add_argument("--use_masks", action="store_true",
                   help="honor demo JSON RLE masks (reference zeroes them)")
    p.add_argument("--lora", type=str, default=None,
                   help="LoRA checkpoint (kohya/diffusers .safetensors) "
                        "merged into the SD1.5 backbone at load time")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--sampler", type=str, default="plms",
                   choices=["plms", "dpm", "ddim"],
                   help="plms = reference protocol; dpm = DPM-Solver++(2M) "
                        "fast serving (use --steps 20 --mis 0); ddim = "
                        "eta-0 baseline")
    p.add_argument("--img2img", type=str, default=None,
                   help="input image path: edit THIS image under the demo "
                        "JSON's instance conditioning instead of sampling "
                        "from noise (PLMS, MIS off)")
    p.add_argument("--strength", type=float, default=0.5,
                   help="img2img: fraction of the schedule re-noised "
                        "(1.0 = full re-generation)")
    args = p.parse_args(argv)

    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

    cfg = apply_test_preset(Config(), args.test_config)
    if args.ckpt and os.path.exists(args.ckpt):
        pipe = InstanceDiffusionPipeline.from_checkpoint(args.ckpt, cfg)
    else:
        if args.ckpt:
            print(f"warning: checkpoint {args.ckpt} not found; random init")
        pipe = InstanceDiffusionPipeline.random_init(cfg, seed=args.seed)

    if args.lora:
        stats = pipe.load_lora(args.lora, scale=args.lora_scale)
        print(f"lora: merged {stats['applied_unet']} unet + "
              f"{stats['applied_te']} text-encoder modules"
              + (f", {len(stats['unknown'])} unknown keys"
                 if stats["unknown"] else ""))

    meta = parse_demo_json(args.input_json, use_masks=args.use_masks,
                           rng=np.random.default_rng(args.seed))
    meta["alpha_type"] = [args.alpha, 0.0, 1 - args.alpha]

    if args.img2img:
        from PIL import Image

        res = cfg.model.image_size * 2 ** (len(cfg.autoencoder.ch_mult) - 1)
        src = Image.open(args.img2img).convert("RGB").resize(
            (res, res), Image.LANCZOS
        )
        images = pipe.img2img(
            np.asarray(src),
            meta,
            strength=args.strength,
            num_images=args.num_images,
            steps=args.steps,
            guidance_scale=args.guidance_scale,
            alpha=args.alpha,
            seed=args.seed,
            negative_prompt=args.negative_prompt,
        )
    else:
        images = pipe.generate(
            meta,
            num_images=args.num_images,
            steps=args.steps,
            guidance_scale=args.guidance_scale,
            alpha=args.alpha,
            mis=args.mis,
            seed=args.seed,
            negative_prompt=args.negative_prompt,
            sampler=args.sampler,
        )

    folder = os.path.join(
        args.output, f"gc{args.guidance_scale}-seed{args.seed}-alpha{args.alpha}"
    )
    os.makedirs(folder, exist_ok=True)
    start = len(os.listdir(folder))

    from PIL import Image

    box_img = draw_boxes_image(
        meta["locations"], meta["phrases"],
        meta["prompt"] + ";alpha=" + str(args.alpha),
    )
    box_img.save(os.path.join(folder, f"{start}_boxes.png"))
    if args.cascade_strength > 0:
        refined = _sdxl_refine(
            images, meta["prompt"], args.cascade_strength,
            ckpt=getattr(args, "refiner_ckpt", None),
        )
        for i in range(refined.shape[0]):
            Image.fromarray(refined[i]).save(os.path.join(
                folder,
                f"{start + i}_xl_s{args.cascade_strength}_n20.png",
            ))
    for i in range(images.shape[0]):
        Image.fromarray(images[i]).save(
            os.path.join(folder, f"{start + i}.png")
        )
    print(f"saved {images.shape[0]} images to {folder}")


def _sdxl_refine(images, prompt, strength, steps=20, ckpt=None):
    """SDXL-Refiner cascade through the NATIVE refiner model family
    (pipeline_refiner.py) — the reference calls an external diffusers
    pipeline here (inference.py:112-129). `ckpt`: path to
    sd_xl_refiner_1.0.safetensors; without it the refiner runs random-init
    (a latency/smoke surface, like the rest of this weight-free env).
    Output file suffix matches the reference (_xl_s{strength}_n{steps})."""
    import numpy as np

    from instancediffusion_tpu.pipeline_refiner import SDXLRefinerPipeline

    pipe = (SDXLRefinerPipeline.from_checkpoint(ckpt) if ckpt
            else SDXLRefinerPipeline.random_init())
    out = pipe.refine(
        np.asarray(images, np.float32) / 255.0, prompt,
        strength=strength, steps=steps,
    )
    return (out * 255).astype(np.uint8)


if __name__ == "__main__":
    main()
