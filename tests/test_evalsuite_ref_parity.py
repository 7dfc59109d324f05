"""Metric-implementation parity vs the reference's OWN eval code
(VERDICT r4 #4): PiM greedy matching / point / scribble scoring against
eval/eval_pim.py:28-120 extracted verbatim, and attribute-binding
crop/score/argmax rules against eval/eval_attribute_binding.py:19-60 —
randomized masks and predictions, including IoU ties and empty masks.
If the matching loop or scoring diverges (ties, thresholds, ordering),
every parity claim built on these metrics is wrong; these tests pin them.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_compat import load_ref_function  # noqa: E402

from instancediffusion_tpu.evalsuite import attribute_binding as ab  # noqa: E402
from instancediffusion_tpu.evalsuite import pim  # noqa: E402

ref_calculate_iou = load_ref_function("eval/eval_pim.py", "calculate_iou")
ref_mask_2_box_point = load_ref_function("eval/eval_pim.py", "mask_2_box_point")
ref_point_inside = load_ref_function(
    "eval/eval_pim.py", "calculate_point_inside_or_not",
    extra_globals={"mask_2_box_point": ref_mask_2_box_point},
)
ref_scribble_inside = load_ref_function(
    "eval/eval_pim.py", "calculate_scribble_inside_or_not"
)
ref_match_masks = load_ref_function(
    "eval/eval_pim.py", "match_masks",
    extra_globals={"calculate_iou": ref_calculate_iou},
)
ref_sample_points = load_ref_function(
    "eval/eval_pim.py", "sample_random_points_from_mask"
)


def _random_masks(rng, n, h=24, w=24, p_empty=0.2):
    """Blocky random masks with deliberate duplicates (IoU ties) and empties."""
    masks = []
    for _ in range(n):
        r = rng.rand()
        if r < p_empty:
            masks.append(np.zeros((h, w), np.uint8))
        elif r < 0.35 and masks:  # exact duplicate -> guaranteed IoU tie
            masks.append(masks[rng.randint(len(masks))].copy())
        else:
            m = np.zeros((h, w), np.uint8)
            y0, x0 = rng.randint(0, h - 4), rng.randint(0, w - 4)
            y1, x1 = rng.randint(y0 + 1, h), rng.randint(x0 + 1, w)
            m[y0:y1, x0:x1] = 1
            masks.append(m)
    return masks


@pytest.mark.parametrize("threshold", [0.0, 0.3, 0.5])
def test_match_masks_parity(threshold):
    """Greedy one-to-one matching: identical pairs across 100 randomized
    cases per threshold, incl. duplicate masks (ties), empty GTs/preds,
    and unequal list lengths."""
    for seed in range(100):
        rng = np.random.RandomState(seed)
        gt = _random_masks(rng, rng.randint(0, 6))
        pred = _random_masks(rng, rng.randint(0, 6))
        ours = pim.match_masks(gt, pred, threshold)
        theirs = ref_match_masks(gt, pred, threshold)
        assert ours == [tuple(p) for p in theirs], (
            f"seed {seed} thr {threshold}: {ours} != {theirs}"
        )


def test_point_scoring_parity():
    for seed in range(100):
        rng = np.random.RandomState(1000 + seed)
        gt = _random_masks(rng, 1)[0]
        pred = _random_masks(rng, 1)[0]
        assert pim.point_inside(pred, gt) == ref_point_inside(
            predicted_mask=pred, ground_truth_mask=gt
        ), f"seed {seed}"


def test_scribble_scoring_parity():
    """Same scribble points (sampled by the REFERENCE sampler) scored by
    both implementations."""
    for seed in range(100):
        rng = np.random.RandomState(2000 + seed)
        gt = _random_masks(rng, 1, p_empty=0.1)[0]
        pred = _random_masks(rng, 1)[0]
        np.random.seed(seed)
        scribbles = ref_sample_points(gt, 20)
        if np.sum(scribbles) == 0:  # empty-mask sentinel (flat zero list)
            continue
        ours = pim.scribble_inside_fraction(pred, scribbles)
        theirs = ref_scribble_inside(predicted_mask=pred, scribbles=scribbles)
        np.testing.assert_allclose(ours, theirs)


def test_scribble_sampler_parity():
    """Our sampler draws from a different RNG stream, but must preserve the
    reference's CONTRACT (eval_pim.py:92-120): k foreground points in
    [x, y] order, sorted by distance to the origin; flat zero list for an
    empty mask."""
    rng = np.random.default_rng(0)
    for seed in range(50):
        r = np.random.RandomState(3000 + seed)
        m = _random_masks(r, 1, p_empty=0.1)[0]
        pts = pim.sample_scribble_points(m, 20, rng)
        if m.sum() == 0:
            assert pts == [0] * 40
            continue
        assert len(pts) == 20
        d_prev = -1.0
        for x, y in pts:
            assert m[y, x] == 1  # foreground, [x, y] order
            d = float(np.hypot(x, y))
            assert d >= d_prev - 1e-9
            d_prev = d


def test_pim_point_mode_composition_parity():
    """Full per-image PiM aggregation (point mode — no RNG in the loop) vs
    the reference's main-loop logic (eval_pim.py:145-183) rebuilt from its
    own extracted functions."""
    for seed in range(30):
        rng = np.random.RandomState(4000 + seed)
        per_image = [
            (
                _random_masks(rng, rng.randint(0, 5)),
                _random_masks(rng, rng.randint(0, 5)),
            )
            for _ in range(rng.randint(1, 6))
        ]
        ours = pim.pim_score(per_image, mode="point")

        acc_all = []
        for gt_list, pred_list in per_image:
            pairs = ref_match_masks(gt_list, pred_list, 0.0)
            acc = []
            for gi, pi in pairs:
                a = ref_point_inside(
                    predicted_mask=pred_list[pi], ground_truth_mask=gt_list[gi]
                )
                if a is not None:
                    acc.append(a)
            if acc:
                acc_all.append(np.mean(acc))
        acc_all = [a for a in acc_all if str(a) != "nan"]
        theirs = float(np.mean(acc_all)) if acc_all else float("nan")
        if np.isnan(theirs):
            assert np.isnan(ours)
        else:
            np.testing.assert_allclose(ours, theirs)


# --- attribute binding (eval_attribute_binding.py) --------------------------


def test_attribute_lists_and_attach_rule():
    """Color/texture vocab and the id-modulo attach rule
    (eval_attribute_binding.py:81-84,126-133)."""
    import re

    with open("/root/reference/eval/eval_attribute_binding.py") as f:
        src = f.read()
    colors = re.search(r"color_list = \[(.*?)\]", src).group(1)
    textures = re.search(r"texture_list = \[(.*?)\]", src).group(1)
    assert [c.strip().strip('"') for c in colors.split(",")] == ab.COLOR_LIST
    assert [t.strip().strip('"') for t in textures.split(",")] == ab.TEXTURE_LIST

    anns = [{"id": i * 7 + 3, "category_name": f"cat{i}"} for i in range(10)]
    phrases = ab.attach_attributes(anns, "colors")
    for ann, ph in zip(anns, phrases):
        # reference: color_list[cat_inst_id % len(color_list)] + " " + name
        assert ph == f"{ab.COLOR_LIST[ann['id'] % 8]} {ann['category_name']}"
    assert ab.label_prompts("colors") == [
        f"a {c} object" for c in ab.COLOR_LIST
    ]
    assert ab.label_prompts("textures") == [
        f"a {t} object" for t in ab.TEXTURE_LIST
    ]


def test_crop_parity_with_pil():
    """crop_instances must match PIL's image.crop((x0*w, y0*h, x1*w, y1*h))
    (eval_attribute_binding.py:185-189) on random boxes."""
    from PIL import Image

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (37, 53, 3), np.uint8)
    pil = Image.fromarray(img)
    for _ in range(50):
        x0, y0 = rng.rand() * 0.8, rng.rand() * 0.8
        x1, y1 = x0 + rng.rand() * (1 - x0), y0 + rng.rand() * (1 - y0)
        ref_crop = np.asarray(
            pil.crop((x0 * pil.width, y0 * pil.height,
                      x1 * pil.width, y1 * pil.height))
        )
        ours = ab.crop_instances(img, [[x0, y0, x1, y1]])[0]
        if ref_crop.size == 0 or ours.size == 0:
            assert ref_crop.size == ours.size == 0 or (
                ref_crop.size == 0 and ours.size == 0
            )
            continue
        np.testing.assert_array_equal(ours, ref_crop)


def _fake_encoders(dim=16):
    """Deterministic fake CLIP: text -> hash feature, image -> stats feature.
    Shared by both scoring implementations so only the METRIC math differs."""
    import hashlib

    def text_feat(text: str) -> np.ndarray:
        h = hashlib.sha256(text.encode()).digest()
        v = np.frombuffer(h[:dim * 4], np.uint8)[:dim].astype(np.float64)
        return v - v.mean() + 0.1

    def image_feat(img: np.ndarray) -> np.ndarray:
        flat = img.astype(np.float64).reshape(-1)
        chunks = np.array_split(flat, dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks]) + 0.1

    return text_feat, image_feat


def test_attribute_scoring_parity():
    """score_image's CLIP-score + 8-way argmax accuracy vs the reference's
    clip_score (eval_attribute_binding.py:19-60) extracted verbatim, driven
    by identical fake encoders."""
    text_feat, image_feat = _fake_encoders()
    mode = "colors"
    labels = ab.label_prompts(mode)
    label_feats_t = torch.stack(
        [
            torch.tensor(text_feat(lp))[None]
            / torch.linalg.norm(torch.tensor(text_feat(lp))[None],
                                axis=-1, keepdims=True)
            for lp in labels
        ]
    )

    class _FakeModel:
        def encode_text(self, tok):
            return tok  # tokenizer already produced the feature

        def encode_image(self, img):
            return img

    fake_ns = {
        "use_open_clip": True,
        "tokenizer": lambda text: torch.tensor(text_feat(text))[None],
        "model": _FakeModel(),
        "preprocess": lambda img: _Unsqueezable(
            torch.tensor(image_feat(np.asarray(img, np.float64)))
        ),
        "color_list": ab.COLOR_LIST,
        "texture_list": ab.TEXTURE_LIST,
        "label_prompts_feats": label_feats_t,
        "PIL": __import__("PIL"),
        "argparse": __import__("argparse"),  # signature annotations
    }
    ref_clip_score = load_ref_function(
        "eval/eval_attribute_binding.py", "clip_score", extra_globals=fake_ns
    )
    args = types.SimpleNamespace(test_random_colors=True,
                                 test_random_textures=False)

    rng = np.random.RandomState(7)
    for seed in range(30):
        color = ab.COLOR_LIST[seed % 8]
        phrase = f"{color} thing{seed}"
        crop = rng.randint(0, 256, (12, 9, 3), np.uint8)
        ref_s, ref_a = ref_clip_score(phrase, crop, args)
        s, a = ab.score_image(
            [crop], [phrase], mode,
            encode_image=lambda c: image_feat(c.astype(np.float64)),
            encode_text=text_feat,
        )
        np.testing.assert_allclose(s, ref_s, rtol=1e-6)
        assert a == ref_a, f"seed {seed}: acc {a} != {ref_a}"


class _Unsqueezable:
    """Mimics preprocess(image) -> tensor supporting .unsqueeze(0).cuda()."""

    def __init__(self, t):
        self._t = t

    def unsqueeze(self, dim):
        return self._t.unsqueeze(dim)


@pytest.fixture(autouse=True)
def _cpu_cuda(monkeypatch):
    """The extracted reference functions call .cuda(); run them on CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
