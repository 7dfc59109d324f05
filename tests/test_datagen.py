"""Labeling pipeline (datagen/) vs the reference dataset-generation
contract: score filter + NMS (:493-497), caption composition (:105-126),
anno/record schema (:276-326), job sharding (:434-440), and the
round-trip into JsonDataset (the consumer the records exist for)."""

import json
import os

import numpy as np
import pytest

from instancediffusion_tpu.data import geometry as geo
from instancediffusion_tpu.datagen.backends import zero_phrase_embedder
from instancediffusion_tpu.datagen.label import (
    LabelingPipeline, box_nms, compose_instance_caption, jsons_to_txt,
    shard_bounds,
)

# -- pure pieces -------------------------------------------------------------


def test_box_nms_matches_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(20):
        xy = rng.uniform(0, 80, (12, 2)).astype(np.float32)
        wh = rng.uniform(5, 40, (12, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], 1)
        scores = rng.uniform(0.1, 1.0, 12).astype(np.float32)
        got = box_nms(boxes, scores, 0.5)
        # brute force: descending score, suppress IoU > thresh vs kept
        want = []
        for i in np.argsort(-scores, kind="stable"):
            ok = True
            for j in want:
                bi, bj = boxes[i], boxes[j]
                ix = max(0, min(bi[2], bj[2]) - max(bi[0], bj[0]))
                iy = max(0, min(bi[3], bj[3]) - max(bi[1], bj[1]))
                inter = ix * iy
                ai = (bi[2] - bi[0]) * (bi[3] - bi[1])
                aj = (bj[2] - bj[0]) * (bj[3] - bj[1])
                if inter / (ai + aj - inter + 1e-9) > 0.5:
                    ok = False
                    break
            if ok:
                want.append(int(i))
        assert got == want


def test_compose_instance_caption_rule():
    # category absent from model caption -> prefixed (reference :117-119)
    assert compose_instance_caption("cat", "a fluffy animal") == \
        "cat. a fluffy animal"
    # present (case-insensitive) -> unchanged
    assert compose_instance_caption("Cat", "a black cat sleeping") == \
        "a black cat sleeping"
    # empty model caption -> category (small-instance path :123-126)
    assert compose_instance_caption("cat", "") == "cat"


def test_shard_bounds_partition():
    n, jobs = 10, 3
    seen = []
    for j in range(jobs):
        lo, hi = shard_bounds(n, jobs, j)
        seen.extend(range(lo, hi))
    assert seen == list(range(n))


# -- pipeline with synthetic backends ---------------------------------------


def _mk_pipeline(**kw):
    def tagger(image):
        return ["cat", "ball"]

    def detector(image, tags):
        assert tags == ["cat", "ball"]
        boxes = np.array(
            [
                [4, 4, 44, 44],     # big cat
                [6, 6, 46, 46],     # duplicate cat (IoU ~0.77 with above)
                [50, 50, 58, 58],   # small ball (area 64 < 32*32)
                [0, 0, 60, 60],     # low score, filtered
            ],
            np.float32,
        )
        scores = np.array([0.9, 0.6, 0.8, 0.1], np.float32)
        return boxes, scores, ["cat", "cat", "ball", "junk"]

    def segmenter(image, boxes):
        h, w = image.shape[:2]
        out = np.zeros((len(boxes), h, w), bool)
        for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
            out[i, y1:y2, x1:x2] = True
        return out

    def captioner(image, box):
        return "a fluffy animal"

    def embedder(phrases):
        # deterministic per-phrase vectors so assignment is checkable
        return np.stack(
            [np.full(768, (hash(p) % 97) / 97.0, np.float32)
             for p in phrases]
        ) if phrases else np.zeros((0, 768), np.float32)

    return LabelingPipeline(tagger, detector, segmenter, captioner,
                            embedder, **kw)


def test_label_image_record():
    pipe = _mk_pipeline()
    image = np.zeros((64, 64, 3), np.uint8)
    rec = pipe.label_image(image, "a cat with a ball", "img0")

    # record shell: the reference's field set (:276-305)
    for key in ("caption", "width", "height", "file_name", "is_det",
                "image", "dataset_name", "data_id", "annos"):
        assert key in rec, key
    assert rec["width"] == 64 and rec["height"] == 64 and rec["is_det"] == 1

    # low score filtered, duplicate NMS'd away -> cat + ball
    annos = rec["annos"]
    assert [a["category_name"] for a in annos] == ["cat", "ball"]
    assert [a["mask_value"] for a in annos] == [1, 2]

    # anno schema (:307-326)
    for key in ("id", "isfake", "isreflected", "bbox", "mask_value",
                "mask", "pred_score", "category_id", "data_id",
                "category_name", "text_embedding_before", "caption",
                "blip_clip_embeddings", "is_stuff", "is_thing", "area"):
        assert key in annos[0], key

    # bbox xywh + area, RLE round-trips to the segmenter mask
    cat = annos[0]
    assert cat["bbox"] == [4, 4, 40, 40] and cat["area"] == 1600
    m = geo.rle_decode(cat["mask"])[:, :, 0]
    assert m[4:44, 4:44].all() and m.sum() == 1600

    # caption rule: big cat captioned + prefixed, small ball category-only
    assert cat["caption"] == "cat. a fluffy animal"
    assert cat["blip_clip_embeddings"] != ""
    ball = annos[1]
    assert ball["caption"] == "" and ball["blip_clip_embeddings"] == ""
    # text_embedding_before always present, decodes to 768 floats
    emb = np.frombuffer(
        __import__("base64").b64decode(cat["text_embedding_before"]),
        np.float32,
    )
    assert emb.shape == (768,)


def test_label_image_none_when_empty():
    pipe = _mk_pipeline(box_threshold=0.95)  # filters every detection
    assert pipe.label_image(np.zeros((32, 32, 3), np.uint8), "c", "i") is None


def test_run_shards_resumes_and_feeds_jsondataset(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    entries = []
    rng = np.random.default_rng(1)
    for i in range(5):
        arr = rng.integers(0, 255, (64, 64, 3), np.uint8)
        path = str(img_dir / f"im{i}.png")
        Image.fromarray(arr).save(path)
        entries.append({"image": path, "caption": f"scene {i}"})

    out = str(tmp_path / "labels")
    pipe = _mk_pipeline()
    # two jobs cover all entries exactly once
    w0 = pipe.run(entries, out, num_jobs=2, job_index=0)
    w1 = pipe.run(entries, out, num_jobs=2, job_index=1)
    assert len(w0) + len(w1) == 5 and not set(w0) & set(w1)

    # resume: second run rewrites nothing (mtimes unchanged)
    mtimes = {p: os.path.getmtime(p) for p in w0}
    assert pipe.run(entries, out, num_jobs=2, job_index=0) == w0
    assert {p: os.path.getmtime(p) for p in w0} == mtimes

    # jsons2txt + JsonDataset consume the records end-to-end
    lst = str(tmp_path / "train.txt")
    assert jsons_to_txt(out, lst) == 5
    from instancediffusion_tpu.data.jsondataset import (
        JsonDataset, SampleDecoder,
    )

    ds = JsonDataset(lst, SampleDecoder(image_size=64, max_boxes_per_data=4))
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert int(item["text_masks"].sum()) == 2  # cat + ball survived decode
