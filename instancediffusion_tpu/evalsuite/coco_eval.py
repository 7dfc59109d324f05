"""COCO val2017 zero-shot generation driver (the reference's eval_local.py
:22-267) — generates instance-conditioned images named after the COCO files
so an external detector (YOLOv8-seg) can score AP/AP50, and PiM /
attribute-binding scripts can run on the folder.

TPU-native differences:
  * a lightweight COCO-JSON reader (no pycocotools)
  * images are generated in device-batched groups; with a multi-chip mesh
    the batch shards over ICI (replacing the reference's --num_jobs
    process-level splitting, eval_local.py:173-177 — which is also kept,
    host-sharding image ranges for multi-host fleets)
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np

from instancediffusion_tpu.data import geometry as geo
from instancediffusion_tpu.evalsuite.attribute_binding import (
    COLOR_LIST, TEXTURE_LIST,
)


class CocoAnnotations:
    """Minimal COCO instances/captions JSON reader."""

    def __init__(self, ann_file: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.imgs = {im["id"]: im for im in data["images"]}
        self.cats = {c["id"]: c for c in data.get("categories", [])}
        self.img_anns = defaultdict(list)
        for ann in data["annotations"]:
            self.img_anns[ann["image_id"]].append(ann)

    def image_ids(self):
        return sorted(self.imgs.keys())

    def ann_to_mask(self, ann, img_info) -> np.ndarray:
        """Polygon or RLE segmentation -> (h, w, 1) binary mask."""
        seg = ann["segmentation"]
        h, w = img_info["height"], img_info["width"]
        if isinstance(seg, dict):  # RLE
            return geo.rle_decode(seg).astype(np.uint8)
        import cv2

        m = np.zeros((h, w), np.uint8)
        for poly in seg:
            pts = np.asarray(poly, np.float64).reshape(-1, 2)
            cv2.fillPoly(m, [np.round(pts).astype(np.int32)], 1)
        return m[:, :, None]


def make_a_sentence(obj_names, clean=False):
    """Category names -> 'a, b, c' caption (decode_item.py:368-385)."""
    if clean:
        obj_names = [n[:-6] if "-other" in n else n for n in obj_names]
    return ", ".join(obj_names)


def build_meta_for_image(
    coco: CocoAnnotations,
    img_id: int,
    caption: str | None = None,
    max_objs: int = 30,
    attribute_mode: str | None = None,  # None | "colors" | "textures"
    rng: np.random.Generator | None = None,
    alpha: float = 0.8,
) -> dict | None:
    """eval_local.py:181-259 semantics for one image."""
    rng = rng or np.random.default_rng(img_id)
    img_info = coco.imgs[img_id]
    anns = [a for a in coco.img_anns[img_id] if not a.get("iscrowd", 0)]
    if not anns:
        return None
    w, h = img_info["width"], img_info["height"]

    locations = [
        [b[0] / w, b[1] / h, (b[0] + b[2]) / w, (b[1] + b[3]) / h]
        for b in (ann["bbox"] for ann in anns)
    ][:max_objs]

    polygons, scribbles, segs = [], [], []
    for ann in anns[:max_objs]:
        # prepare_scribble_and_instmask (utils/input.py:161-186)
        import cv2

        m = coco.ann_to_mask(ann, img_info)
        m512 = cv2.resize(
            m[:, :, 0], (512, 512), interpolation=cv2.INTER_NEAREST
        )[:, :, None]
        scr = geo.sample_random_points_from_mask(m512, 20, rng)
        scribbles.append(geo.convert_points(scr, w, h))
        poly = geo.sample_sparse_points_from_mask(m, k=256, rng=rng)
        if poly is None:
            poly = [0.0] * 512
        polygons.append(geo.convert_points(poly, w, h))
        segs.append(m512.astype(np.float32)[:, :, 0])

    points = [geo.point_from_box(b) for b in locations]

    cat_names = [coco.cats[ann["category_id"]]["name"] for ann in anns]
    if attribute_mode == "colors":
        cat_names = [
            f"{COLOR_LIST[ann['id'] % len(COLOR_LIST)]} {n}"
            for ann, n in zip(anns, cat_names)
        ]
    elif attribute_mode == "textures":
        cat_names = [
            f"{TEXTURE_LIST[ann['id'] % len(TEXTURE_LIST)]} {n}"
            for ann, n in zip(anns, cat_names)
        ]
    phrases = cat_names[:max_objs]

    prompt = make_a_sentence(cat_names)
    if caption:
        prompt = caption + prompt

    return {
        "file_name": img_info["file_name"],
        "prompt": prompt,
        "phrases": phrases,
        "locations": locations,
        "points": points,
        "scribbles": scribbles,
        "polygons": polygons,
        "segs": segs,
        "alpha_type": [alpha, 0.0, 1.0 - alpha],
    }


def run_coco_eval(
    pipe,
    instances_json: str,
    out_dir: str,
    captions_json: str | None = None,
    num_jobs: int = 1,
    job_index: int = 0,
    limit: int | None = None,
    steps: int = 50,
    guidance_scale: float = 7.5,
    alpha: float = 0.8,
    mis: float = 0.0,
    attribute_mode: str | None = None,
    seed: int = 0,
    batch_size: int = 8,
    mesh=None,
    sampler: str | None = None,
):
    """Generate one 512x512 image per COCO val image under its COCO
    file name (eval_local.py run(), :22-99).

    Images are generated `batch_size` at a time through ONE batched sampling
    program (pipe.generate_batch); pass a jax.sharding.Mesh to shard the
    batch over devices — the TPU-native replacement for the reference's
    --num_jobs process splitting (kept as host-level sharding for
    multi-host fleets). MIS (mis > 0) has per-image trajectory counts and
    falls back to per-image generation."""
    from PIL import Image

    coco = CocoAnnotations(instances_json)
    captions = {}
    if captions_json:
        with open(captions_json) as f:
            cap_data = json.load(f)
        for ann in cap_data["annotations"]:
            captions.setdefault(ann["image_id"], ann["caption"])

    ids = coco.image_ids()
    per_job = len(ids) // num_jobs + 1
    ids = ids[job_index * per_job : min((job_index + 1) * per_job, len(ids))]
    if limit:
        ids = ids[:limit]

    os.makedirs(out_dir, exist_ok=True)
    metas = []
    for img_id in ids:
        meta = build_meta_for_image(
            coco, img_id, captions.get(img_id), attribute_mode=attribute_mode,
            rng=np.random.default_rng(seed + img_id), alpha=alpha,
        )
        if meta is not None:
            metas.append((img_id, meta))

    # mis > 0 (the test_mask protocol, eval_local.py:79) batches exactly
    # like mis == 0: generate_batch pads every image to a shared static
    # trajectory count and weights padding trajectories out of the MIS
    # merge. Sorting the chunk contents by instance count would minimize
    # padding waste, but COCO order must be kept deterministic per the
    # reference's sorted-ids protocol (eval_local.py:170-171), so chunks
    # stay in id order.
    done = 0
    for i in range(0, len(metas), batch_size):
        chunk = metas[i : i + batch_size]
        imgs = pipe.generate_batch(
            [m for _, m in chunk], steps=steps, guidance_scale=guidance_scale,
            alpha=alpha, seeds=[seed + img_id for img_id, _ in chunk],
            mesh=mesh, mis=mis, sampler=sampler,
        )
        for (_, meta), img in zip(chunk, imgs):
            Image.fromarray(img).save(os.path.join(out_dir, meta["file_name"]))
            done += 1
    return done


def main(argv=None):
    """CLI mirroring eval_local.py:118-140 flags."""
    import argparse

    p = argparse.ArgumentParser("COCO val2017 generation for AP/PiM eval")
    p.add_argument("--instances_json", type=str, required=True)
    p.add_argument("--captions_json", type=str, default=None)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--save_dir", type=str, default="generation_samples/cocoval17")
    p.add_argument("--num_jobs", type=int, default=1)
    p.add_argument("--job_index", type=int, default=0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--alpha", type=float, default=0.8)
    p.add_argument("--mis", type=float, default=0.0)
    p.add_argument("--test_config", type=str, default="mask")
    p.add_argument("--add_random_colors", action="store_true")
    p.add_argument("--add_random_textures", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--mesh", action="store_true",
                   help="shard the eval batch over all local devices")
    p.add_argument("--sampler", type=str, default="plms",
                   choices=["plms", "dpm", "ddim"],
                   help="plms = the reference eval protocol; dpm = "
                        "DPM-Solver++(2M) fast serving (requires --mis 0)")
    args = p.parse_args(argv)

    from instancediffusion_tpu.config import Config, apply_test_preset
    from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

    cfg = apply_test_preset(Config(), args.test_config)
    if args.ckpt_path and os.path.exists(args.ckpt_path):
        pipe = InstanceDiffusionPipeline.from_checkpoint(args.ckpt_path, cfg)
    else:
        pipe = InstanceDiffusionPipeline.random_init(cfg)

    attribute_mode = (
        "colors" if args.add_random_colors
        else "textures" if args.add_random_textures else None
    )
    mesh = None
    if args.mesh:
        from instancediffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    n = run_coco_eval(
        pipe, args.instances_json, args.save_dir,
        captions_json=args.captions_json, num_jobs=args.num_jobs,
        job_index=args.job_index, limit=args.limit, steps=args.steps,
        guidance_scale=args.guidance_scale, alpha=args.alpha, mis=args.mis,
        attribute_mode=attribute_mode, seed=args.seed,
        batch_size=args.batch_size, mesh=mesh, sampler=args.sampler,
    )
    print(f"generated {n} images in {args.save_dir}")


if __name__ == "__main__":
    main()
