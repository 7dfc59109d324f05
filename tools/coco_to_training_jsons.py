#!/usr/bin/env python
"""Convert a COCO-format detection/segmentation dataset into the per-image
training JSON records consumed by instancediffusion_tpu.data.jsondataset.

The reference builds its training set with an offline multi-GPU labeling
pipeline (dataset-generation/submitit_automatic_label_ram_save_json.py:
RAM tags -> GroundingDINO boxes -> SAM masks -> BLIP-2 captions -> CLIP
embeddings). Those upstream models are external; this tool provides the
SAME output format from any COCO-style source (human annotations or the
outputs of such a labeling run), plus the train.txt list builder
(dataset-generation/jsons2txt.py equivalent).

Record format (dataset/jsondataset.py + decode_item.py:284-317):
  {
    "data_id": int, "caption": str, "image": base64(png/jpg bytes),
    "annos": [{
       "bbox": [x, y, w, h],                    # pixels
       "mask": {"size": [h, w], "counts": rle}, # COCO compressed RLE
       "caption": str,                          # instance phrase
       "text_embedding_before": base64(float32[768]),  # CLIP pooled phrase
    }, ...]
  }

Phrase embeddings are computed with the framework's CLIP text tower when a
checkpoint is available, else zeros (train-time UniFusion replaces padded
embeddings with learned nulls, so zero embeddings degrade to
location-only conditioning rather than breaking).

Usage:
  python tools/coco_to_training_jsons.py --instances instances_train.json \
      --captions captions_train.json --images_dir train2017 --out DATA/train
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable uninstalled

import argparse
import base64
import json
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--instances", required=True)
    p.add_argument("--captions", default=None)
    p.add_argument("--images_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None, help="for real CLIP phrase embeddings")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args()

    import numpy as np

    from instancediffusion_tpu.evalsuite.coco_eval import CocoAnnotations
    from instancediffusion_tpu.data.geometry import rle_encode

    coco = CocoAnnotations(args.instances)
    captions = {}
    if args.captions:
        with open(args.captions) as f:
            for ann in json.load(f)["annotations"]:
                captions.setdefault(ann["image_id"], ann["caption"])

    embed = _make_phrase_embedder(args.ckpt)

    os.makedirs(args.out, exist_ok=True)
    listing = []
    ids = coco.image_ids()[: args.limit] if args.limit else coco.image_ids()
    for img_id in ids:
        info = coco.imgs[img_id]
        anns = [a for a in coco.img_anns[img_id] if not a.get("iscrowd", 0)]
        if not anns:
            continue
        img_path = os.path.join(args.images_dir, info["file_name"])
        if not os.path.exists(img_path):
            continue
        with open(img_path, "rb") as f:
            img_b64 = base64.b64encode(f.read()).decode()

        annos = []
        for ann in anns:
            phrase = coco.cats[ann["category_id"]]["name"]
            mask = coco.ann_to_mask(ann, info)[:, :, 0]
            emb = embed(phrase)
            annos.append(
                {
                    "bbox": ann["bbox"],
                    "mask": rle_encode(mask),
                    "caption": phrase,
                    "text_embedding_before": base64.b64encode(
                        np.asarray(emb, np.float32).tobytes()
                    ).decode(),
                }
            )
        rec = {
            "data_id": img_id,
            "caption": captions.get(img_id, ""),
            "image": img_b64,
            "annos": annos,
        }
        out_path = os.path.join(args.out, f"{img_id}.json")
        with open(out_path, "w") as f:
            json.dump(rec, f)
        listing.append(out_path)

    with open(os.path.join(args.out, "train.txt"), "w") as f:
        f.write("\n".join(listing) + "\n")
    print(f"wrote {len(listing)} records + train.txt under {args.out}")


def _make_phrase_embedder(ckpt: str | None):
    import numpy as np

    if ckpt and os.path.exists(ckpt):
        from instancediffusion_tpu.config import Config
        from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline

        pipe = InstanceDiffusionPipeline.from_checkpoint(ckpt, Config())
        cache: dict[str, np.ndarray] = {}

        def embed(phrase: str) -> np.ndarray:
            if phrase not in cache:
                cache[phrase] = pipe.encode_phrases([phrase])[0]
            return cache[phrase]

        return embed
    return lambda phrase: np.zeros(768, np.float32)


if __name__ == "__main__":
    main()
