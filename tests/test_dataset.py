"""Training data pipeline: JSON record decode, crop/flip box recalc,
largest-N selection, batch collation."""

import base64
import io
import json

import numpy as np
import pytest

from instancediffusion_tpu.data import geometry as geo
from instancediffusion_tpu.data.jsondataset import (
    JsonDataset, Prefetcher, SampleDecoder, collate, recalc_box,
)


def _fake_record(w=640, h=480, n_annos=3, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    annos = []
    for i in range(n_annos):
        x, y = rng.integers(0, w // 2), rng.integers(0, h // 2)
        bw, bh = rng.integers(60, w // 2), rng.integers(60, h // 2)
        mask = np.zeros((h, w), np.uint8)
        mask[y : y + bh, x : x + bw] = 1
        emb = rng.standard_normal(768, dtype=np.float32)
        annos.append(
            {
                "bbox": [int(x), int(y), int(bw), int(bh)],
                "mask": geo.rle_encode(mask),
                "caption": f"object {i}",
                "text_embedding_before": base64.b64encode(
                    emb.tobytes()
                ).decode(),
            }
        )
    return {
        "data_id": seed,
        "image": base64.b64encode(buf.getvalue()).decode(),
        "caption": "a synthetic scene",
        "annos": annos,
    }


@pytest.fixture(scope="module")
def sample():
    decoder = SampleDecoder(image_size=128, max_boxes_per_data=4)
    return decoder(_fake_record(), np.random.default_rng(0)), decoder


def test_decode_shapes(sample):
    out, decoder = sample
    s = decoder.image_size
    assert out["image"].shape == (s, s, 3)
    assert -1.0 <= out["image"].min() and out["image"].max() <= 1.0
    assert out["boxes"].shape == (4, 4)
    assert out["segs"].shape == (4, s, s)
    assert out["scribbles"].shape == (4, 40)
    assert out["polygons"].shape == (4, 512)
    assert out["text_embeddings"].shape == (4, 768)
    assert out["masks"].sum() == 3  # all three annos survive the crop here
    # coordinates normalized
    assert (out["boxes"] >= 0).all() and (out["boxes"] <= 1).all()
    assert (out["scribbles"] >= 0).all() and (out["scribbles"] <= 1).all()


def test_largest_instances_first(sample):
    out, _ = sample
    b = out["boxes"][out["masks"] > 0]
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    assert (np.diff(areas) <= 1e-6).all()  # descending by area


def test_decode_deterministic():
    decoder = SampleDecoder(image_size=128, max_boxes_per_data=4)
    rec = _fake_record(seed=3)
    a = decoder(json.loads(json.dumps(rec, default=str)), np.random.default_rng(7))
    b = decoder(json.loads(json.dumps(rec, default=str)), np.random.default_rng(7))
    for k in ("image", "boxes", "scribbles", "polygons", "segs"):
        np.testing.assert_array_equal(a[k], b[k])


def test_recalc_box_flip_and_crop():
    info = {
        "performed_scale": 0.5, "crop_x": 10, "crop_y": 0,
        "performed_flip": True,
    }
    valid, (x0, y0, x1, y1) = recalc_box(40, 20, 200, 100, info, 128, 0.01)
    assert valid
    # scale: (20,10)-(120,60); crop_x: (10,10)-(110,60); flip: (18,10)-(118,60)
    np.testing.assert_allclose([x0, y0, x1, y1], [18, 10, 118, 60])
    # fully cropped-out box -> invalid
    valid, _ = recalc_box(500, 500, 10, 10, info, 128, 0.01)
    assert not valid


def test_loader_and_collate(tmp_path):
    files = []
    for i in range(4):
        p = tmp_path / f"r{i}.json"
        p.write_text(json.dumps(_fake_record(seed=i), default=str))
        files.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(files))

    from instancediffusion_tpu.data.tokenizer import CLIPTokenizer

    ds = JsonDataset(str(lst), SampleDecoder(image_size=64, max_boxes_per_data=4))
    loader = Prefetcher(ds, batch_size=2, tokenizer=CLIPTokenizer.load_default())
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["caption_ids"].shape == (2, 77)
    assert b["caption_mask"].shape == (2,)


def test_att_masks_raster_quirk():
    """att_masks must reproduce the reference's [x1:x2, y1:y2] row=x quirk
    (decode_item.py:699-703)."""
    decoder = SampleDecoder(
        image_size=128, max_boxes_per_data=4, return_att_masks=True
    )
    out = decoder(_fake_record(), np.random.default_rng(0))
    assert out["att_masks"].shape == (4, 64, 64)
    for i in range(int(out["masks"].sum())):
        x1, y1, x2, y2 = np.round(out["boxes"][i] * 64).astype(int)
        expect = np.zeros((64, 64), np.float32)
        expect[x1:x2, y1:y2] = 1
        np.testing.assert_array_equal(out["att_masks"][i], expect)


def test_random_drop_embedding_invariants():
    """'both' never drops image AND text of the same token; 'image' keeps
    text (decode_item.py:388-420)."""
    from instancediffusion_tpu.data.jsondataset import (
        random_drop_embedding_masks,
    )

    rng = np.random.default_rng(0)
    masks = np.ones(30, np.float32)
    saw_img_drop = saw_txt_drop = False
    for _ in range(50):
        im, tm = random_drop_embedding_masks(masks, "both", rng)
        assert ((im + tm) >= 1).all()  # at least one feature per token
        saw_img_drop |= (im == 0).any()
        saw_txt_drop |= (tm == 0).any()
    assert saw_img_drop and saw_txt_drop
    im, tm = random_drop_embedding_masks(masks, "image", rng)
    np.testing.assert_array_equal(tm, masks)
    im, tm = random_drop_embedding_masks(masks, "none", rng)
    np.testing.assert_array_equal(im, masks)
    np.testing.assert_array_equal(tm, masks)


def test_detection_caption_builder():
    """Pseudo captions from category names with dup counting + instance
    captions with stop-word filtering (decode_item.py:357-385,741-762)."""
    from instancediffusion_tpu.data.jsondataset import (
        make_a_sentence, make_a_sentence_count_nums, remove_stop_words,
    )

    assert make_a_sentence(["dog", "dog", "cat"]) == "dog, dog, cat"
    assert make_a_sentence_count_nums(["dog", "dog", "cat"]) == "2 dog, 1 cat"
    assert make_a_sentence(["wall-other"], clean=True) == "wall"
    assert (
        remove_stop_words("a dog is on the mat") == "dog mat"
    )

    rec = _fake_record(n_annos=2)
    rec["is_det"] = True
    for i, a in enumerate(rec["annos"]):
        a["category_name"] = "dog"
    out = SampleDecoder(image_size=128, max_boxes_per_data=4,
                        count_dups_make_a_sentence=True)(
        rec, np.random.default_rng(0)
    )
    assert out["caption"].startswith("2 dog. ")
    # per-instance captions ride along
    assert out["obj_captions"][0].startswith("dog, object")


def test_random_crop_decode():
    decoder = SampleDecoder(
        image_size=128, max_boxes_per_data=4, random_crop=True,
        random_flip=False,
    )
    out = decoder(_fake_record(), np.random.default_rng(0))
    assert out["image"].shape == (128, 128, 3)
    assert (out["boxes"] >= 0).all() and (out["boxes"] <= 1).all()
    # at least one instance should survive a 0.8-1.0 crop of this layout
    assert out["masks"].sum() >= 1


def test_instance_grounding_from_batch():
    from instancediffusion_tpu.data.grounding_input import (
        instance_grounding_from_batch,
    )

    decoder = SampleDecoder(image_size=64, max_boxes_per_data=4)
    samples = [
        decoder(_fake_record(seed=i), np.random.default_rng(i))
        for i in range(2)
    ]
    batch = collate(samples)
    g = instance_grounding_from_batch(batch, k=1)
    assert g["boxes"].shape == batch["boxes"].shape
    np.testing.assert_array_equal(g["boxes"][:, 0], batch["boxes"][:, 1])
    np.testing.assert_array_equal(g["segs"][:, 0], batch["segs"][:, 1])
    np.testing.assert_array_equal(
        g["positive_embeddings"][:, 0], batch["text_embeddings"][:, 1]
    )
    assert g["masks"][:, 1:].sum() == 0  # only slot 0 populated
    np.testing.assert_array_equal(g["text_masks"], g["masks"])


def test_collate_is_device_puttable():
    """String leaves (caption) and string-list leaves (obj_captions) must
    never reach the stacked batch — device_put on a numpy unicode array
    raises on the first training step."""
    import jax

    from instancediffusion_tpu.data.jsondataset import collate

    sample = {
        "image": np.zeros((8, 8, 3), np.float32),
        "boxes": np.zeros((2, 4), np.float32),
        "caption": "a cat",
        "obj_captions": ["a cat", "a dog"],
    }
    batch = collate([sample, sample])
    assert "caption" not in batch and "obj_captions" not in batch
    for v in batch.values():
        assert v.dtype.kind in "fiu", v.dtype
    jax.tree_util.tree_map(jax.device_put, batch)  # must not raise

    kept = collate([sample, sample], keep_caption=True)
    assert kept["caption"] == ["a cat", "a cat"]
    assert kept["obj_captions"][0] == ["a cat", "a dog"]
