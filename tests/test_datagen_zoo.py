"""Zoo adapter contracts (datagen/backends_zoo.py) vs the reference
labeling fleet (dataset-generation/submitit_automatic_label_ram_save_json
.py:366-516), exercised with fake models: preprocessing tensors
(ImageNet normalize, 384 RAM resize, DINO shortest-side-800 resize),
DINO sigmoid-max scoring + posmap phrase decoding + cxcywh->xyxy pixel
rescale, SAM's box-transform/predict_torch call shape, BLIP crop
geometry — and the full fake fleet through LabelingPipeline end to end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from instancediffusion_tpu.datagen.backends_zoo import (
    Blip2Captioner, GroundingDinoDetector, RamTagger, SamSegmenter,
    boxes_cxcywh_to_xyxy_pixels, imagenet_chw_tensor, phrase_from_posmap,
    resize_shortest,
)
from instancediffusion_tpu.datagen.label import LabelingPipeline


def _image(h=240, w=320, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


# -- pure preprocessing -------------------------------------------------------


def test_imagenet_tensor_contract():
    img = _image(16, 24)
    x = imagenet_chw_tensor(img)
    assert x.shape == (3, 16, 24) and x.dtype == torch.float32
    # reference Normalize([0.485,...],[0.229,...]) after /255 (:388-393)
    want = (img[3, 5].astype(np.float32) / 255.0 - [0.485, 0.456, 0.406]) / [
        0.229, 0.224, 0.225,
    ]
    np.testing.assert_allclose(x[:, 3, 5].numpy(), want, rtol=1e-5)


def test_resize_shortest_800_max_1333():
    # short side -> 800 when the long side stays under 1333
    out = resize_shortest(_image(240, 320))
    assert min(out.shape[:2]) == 800 and out.shape[:2] == (800, 1067)
    # long-side cap kicks in for extreme aspect ratios (3200/240*800 > 1333)
    out = resize_shortest(_image(240, 3200))
    assert max(out.shape[:2]) == 1333 and out.shape[:2] == (100, 1333)


def test_cxcywh_to_xyxy_pixels():
    boxes = np.array([[0.5, 0.5, 0.5, 0.25]], np.float32)
    got = boxes_cxcywh_to_xyxy_pixels(boxes, width=320, height=240)
    np.testing.assert_allclose(got, [[80, 90, 240, 150]], atol=1e-4)


class _FakeTokenizer:
    """dict-mode tokenizer like HF's BertTokenizer on a plain string."""

    def __call__(self, caption):
        return {"input_ids": [101] + list(range(1, len(caption.split()) + 1))}

    def decode(self, ids):
        return " ".join(f"tok{i}" for i in ids)


def test_phrase_from_posmap_decodes_thresholded_tokens():
    tok = _FakeTokenizer()
    ids = tok("a dog on grass")["input_ids"]
    posmap = np.array([False, True, False, True, False])
    assert phrase_from_posmap(posmap, ids, tok) == "tok1 tok3"


# -- RAM ----------------------------------------------------------------------


def test_ram_tagger_resizes_and_splits_tags():
    seen = {}

    def fake_inference(tensor, model):
        seen["shape"] = tuple(tensor.shape)
        return ("dog | grass  | park", "unused-confidences")

    tags = RamTagger(model=None, inference_fn=fake_inference)(_image())
    assert seen["shape"] == (1, 3, 384, 384)  # reference :469-470
    assert tags == ["dog", "grass", "park"]


# -- GroundingDINO ------------------------------------------------------------


class _FakeDino(torch.nn.Module):
    """Two strong queries + one sub-prefilter query; per-token logits are
    crafted so the posmap picks different caption words per query."""

    def __init__(self):
        super().__init__()
        self.captions_seen = []
        self.input_shape = None

    def forward(self, image, captions):
        self.captions_seen += captions
        self.input_shape = tuple(image.shape)
        nq, ntok = 3, 256
        logits = torch.full((1, nq, ntok), -9.0)
        logits[0, 0, 1] = 2.0    # q0: token 1 ("tok1"), score sig(2.0)=.88
        logits[0, 1, 2] = 0.5    # q1: token 2,          score sig(.5)=.62
        logits[0, 2, 2] = -4.0   # q2: below prefilter   score sig(-4)=.018
        boxes = torch.tensor([[[0.5, 0.5, 0.5, 0.25],
                               [0.25, 0.25, 0.1, 0.1],
                               [0.9, 0.9, 0.05, 0.05]]])
        return {"pred_logits": logits, "pred_boxes": boxes}


def test_dino_detector_contract():
    model = _FakeDino()
    det = GroundingDinoDetector(model, tokenizer=_FakeTokenizer())
    img = _image(240, 320)
    boxes, scores, phrases = det(img, ["Dog", "grass"])

    # caption rule: lowercased ', '-join + trailing '.' (reference :181-184)
    assert model.captions_seen == ["dog, grass."]
    # input went through the 800/1333 resize (240,320) -> (800,1067)
    assert model.input_shape == (1, 3, 800, 1067)
    # the sub-prefilter query is gone; scores are sigmoid maxima
    assert boxes.shape == (2, 4) and len(phrases) == 2
    np.testing.assert_allclose(
        scores, [1 / (1 + np.exp(-2.0)), 1 / (1 + np.exp(-0.5))], atol=1e-5
    )
    # posmap phrase decoding picked the per-query hot token
    assert phrases == ["tok1", "tok2"]
    # cxcywh (normalized to the ORIGINAL image) -> pixel xyxy
    np.testing.assert_allclose(boxes[0], [80, 90, 240, 150], atol=1e-3)
    # pipeline-side consumption: scores/boxes/phrases stay aligned
    assert scores.dtype == np.float32 and boxes.dtype == np.float32


# -- SAM ----------------------------------------------------------------------


class _FakeSamTransform:
    def apply_boxes_torch(self, boxes, orig_hw):
        self.orig_hw = orig_hw
        return boxes * 2.0  # fake 1024-frame rescale


class _FakeSamPredictor:
    def __init__(self):
        self.transform = _FakeSamTransform()
        self.image = None
        self.boxes_seen = None

    def set_image(self, image):
        self.image = image

    def predict_torch(self, point_coords, point_labels, boxes,
                      multimask_output):
        assert point_coords is None and point_labels is None
        assert multimask_output is False  # reference :503-508
        self.boxes_seen = boxes
        h, w = self.image.shape[:2]
        masks = torch.zeros((boxes.shape[0], 1, h, w), dtype=torch.bool)
        masks[:, :, : h // 2] = True
        return masks, None, None


def test_sam_segmenter_contract():
    pred = _FakeSamPredictor()
    seg = SamSegmenter(pred)
    img = _image(64, 48)
    boxes = np.array([[4, 4, 20, 20], [8, 8, 40, 40]], np.float32)
    masks = seg(img, boxes)
    assert masks.shape == (2, 64, 48) and masks.dtype == bool
    assert pred.transform.orig_hw == (64, 48)
    np.testing.assert_allclose(pred.boxes_seen.numpy(), boxes * 2.0)
    # empty boxes short-circuit without touching the predictor
    assert seg(img, np.zeros((0, 4), np.float32)).shape == (0, 64, 48)


# -- BLIP-2 -------------------------------------------------------------------


class _FakeBlip:
    def __init__(self):
        self.image_shapes = []

    def generate(self, batch):
        self.image_shapes.append(tuple(batch["image"].shape))
        return ["a fluffy dog", "ignored-second-beam"]


def test_blip2_captioner_crops_box():
    sizes = []

    def vis_processor(pil_crop):
        sizes.append(pil_crop.size)  # (W,H)
        return torch.zeros((3, 224, 224))

    cap = Blip2Captioner(_FakeBlip(), vis_processor)
    out = cap(_image(), np.array([10.0, 20.0, 110.0, 70.0]))
    assert out == "a fluffy dog"
    assert sizes == [(100, 50)]  # crop(10,20,110,70) -> 100x50


# -- the whole fake fleet through LabelingPipeline ----------------------------


def test_fake_zoo_fleet_end_to_end(tmp_path):
    model = _FakeDino()
    pipe = LabelingPipeline(
        tagger=RamTagger(None, lambda t, m: ("dog | grass", None)),
        detector=GroundingDinoDetector(model, tokenizer=_FakeTokenizer()),
        segmenter=SamSegmenter(_FakeSamPredictor()),
        captioner=Blip2Captioner(
            _FakeBlip(), lambda c: torch.zeros((3, 224, 224))
        ),
        embedder=lambda texts: np.zeros((len(texts), 768), np.float32),
        box_threshold=0.25, iou_threshold=0.5,
    )
    record = pipe.label_image(_image(240, 320), "a dog on grass", "img0")
    assert record is not None and len(record["annos"]) == 2
    a0 = record["annos"][0]
    assert a0["category_name"] == "tok1"
    assert a0["bbox"] == [80, 90, 160, 60]  # xywh of the q0 box
    assert 0.8 < a0["pred_score"] < 0.9
    # big box (160x60 >= 32x32) got a composed caption; small one didn't
    assert record["annos"][0]["caption"].endswith("a fluffy dog")
    assert record["annos"][1]["caption"] == ""
