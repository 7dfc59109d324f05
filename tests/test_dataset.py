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
