"""Evaluation metrics: PiM matching/scoring, attribute-binding math, COCO
meta construction."""

import json

import numpy as np

from instancediffusion_tpu.evalsuite import attribute_binding as ab
from instancediffusion_tpu.evalsuite import pim


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


def test_match_masks_greedy_one_to_one():
    gt = [_disk(32, 32, 8, 8, 5), _disk(32, 32, 24, 24, 5)]
    pred = [_disk(32, 32, 24, 23, 5), _disk(32, 32, 8, 9, 5)]
    pairs = pim.match_masks(gt, pred, 0.0)
    assert sorted(pairs) == [(0, 1), (1, 0)]


def test_point_inside():
    gt = _disk(32, 32, 16, 16, 6)
    pred_hit = _disk(32, 32, 16, 16, 8)
    pred_miss = _disk(32, 32, 4, 4, 3)
    assert pim.point_inside(pred_hit, gt) == 1
    assert pim.point_inside(pred_miss, gt) == 0
    assert pim.point_inside(pred_hit, np.zeros((32, 32), np.uint8)) is None


def test_pim_score_point_mode_perfect():
    gt = [_disk(32, 32, 16, 16, 6)]
    score = pim.pim_score([(gt, gt)], mode="point")
    assert score == 1.0


def test_pim_score_scribble_mode():
    gt = _disk(64, 64, 32, 32, 12)
    pred_half = _disk(64, 64, 32, 32, 12).copy()
    pred_half[:, 32:] = 0  # covers ~half the gt disk
    s = pim.pim_score(
        [([gt], [pred_half])], mode="scribble", rng=np.random.default_rng(0)
    )
    assert 0.2 < s < 0.8


def test_attach_attributes_deterministic():
    anns = [{"id": 3, "category_name": "dog"}, {"id": 10, "category_name": "cat"}]
    phrases = ab.attach_attributes(anns, "colors")
    assert phrases == [
        f"{ab.COLOR_LIST[3]} dog", f"{ab.COLOR_LIST[10 % 8]} cat",
    ]


def test_attribute_binding_scores():
    # fake CLIP: text feature = one-hot of color index; image feature =
    # one-hot of the crop's dominant channel intensity bucket
    attrs = ab.COLOR_LIST

    def encode_text(t):
        word = t.split(" ")[1] if t.startswith("a ") else t.split(" ")[0]
        v = np.zeros(8, np.float32)
        v[attrs.index(word)] = 1
        return v

    def encode_image(crop):
        v = np.zeros(8, np.float32)
        v[int(crop[0, 0, 0]) % 8] = 1
        return v

    img = np.zeros((64, 64, 3), np.uint8)
    img[:32] = 2   # instance 0 crop -> bucket 2 ("red")
    img[32:] = 5   # instance 1 crop -> bucket 5 ("blue")
    per_image = [(
        img,
        [(0.0, 0.0, 1.0, 0.5), (0.0, 0.5, 1.0, 1.0)],
        ["red thing", "blue thing"],
    )]
    res = ab.attribute_binding_eval(per_image, "colors", encode_image, encode_text)
    assert res["accuracy"] == 1.0
    assert res["clip_score"] == 1.0


def test_coco_meta_build(tmp_path):
    from instancediffusion_tpu.data.geometry import rle_encode
    from instancediffusion_tpu.evalsuite.coco_eval import (
        CocoAnnotations, build_meta_for_image, make_a_sentence,
    )

    mask = np.zeros((100, 200), np.uint8)
    mask[20:60, 30:90] = 1
    data = {
        "images": [{"id": 1, "file_name": "000001.jpg", "width": 200, "height": 100}],
        "categories": [{"id": 7, "name": "dog"}],
        "annotations": [
            {
                "id": 11, "image_id": 1, "category_id": 7,
                "bbox": [30, 20, 60, 40], "segmentation": rle_encode(mask),
                "iscrowd": 0,
            }
        ],
    }
    p = tmp_path / "inst.json"
    p.write_text(json.dumps(data))
    coco = CocoAnnotations(str(p))
    meta = build_meta_for_image(coco, 1, caption="a photo. ")
    assert meta["phrases"] == ["dog"]
    np.testing.assert_allclose(meta["locations"][0], [0.15, 0.2, 0.45, 0.6])
    assert meta["prompt"].startswith("a photo. ")
    assert len(meta["polygons"][0]) == 512
    assert meta["segs"][0].shape == (512, 512)
    assert make_a_sentence(["a", "b-other"], clean=True) == "a, b"
