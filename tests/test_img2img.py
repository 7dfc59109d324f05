"""Instance-conditioned img2img tests (pipeline.img2img): shape,
determinism, input-image dependence, strength mechanics, validation."""

import numpy as np
import pytest

from tests.test_pipeline import _patch_meta


@pytest.fixture()
def pipe(tiny_pipe):
    # session-shared instance (tests/conftest.py); img2img never mutates
    return tiny_pipe


def _with_dims(pipe):
    import instancediffusion_tpu.data.grounding_input as gi

    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    return old


@pytest.mark.heavy
def test_img2img_end_to_end(pipe):
    import instancediffusion_tpu.data.grounding_input as gi

    old = _with_dims(pipe)
    try:
        meta = _patch_meta(pipe)
        size = pipe.cfg.model.image_size * 2
        rng = np.random.default_rng(0)
        img_a = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        img_b = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)

        out = pipe.img2img(img_a, meta, strength=0.5, num_images=2,
                           steps=4, seed=3)
        assert out.shape == (2, size, size, 3) and out.dtype == np.uint8

        # deterministic
        out2 = pipe.img2img(img_a, meta, strength=0.5, num_images=2,
                            steps=4, seed=3)
        np.testing.assert_array_equal(out, out2)

        # depends on the INPUT image (the encode path is live even at
        # random init — unlike interior UNet weights, see test_lora.py)
        out_b = pipe.img2img(img_b, meta, strength=0.5, num_images=2,
                             steps=4, seed=3)
        assert not np.array_equal(out, out_b)

        # strength changes how much of the schedule runs
        lo = pipe.img2img(img_a, meta, strength=0.25, num_images=1,
                          steps=4, seed=3)
        hi = pipe.img2img(img_a, meta, strength=1.0, num_images=1,
                          steps=4, seed=3)
        assert not np.array_equal(lo, hi)
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old


def test_img2img_validation(pipe):
    old = _with_dims(pipe)
    import instancediffusion_tpu.data.grounding_input as gi

    try:
        meta = _patch_meta(pipe)
        size = pipe.cfg.model.image_size * 2
        img = np.zeros((size, size, 3), np.uint8)
        with pytest.raises(ValueError, match="strength"):
            pipe.img2img(img, meta, strength=0.0, steps=4)
        with pytest.raises(ValueError, match="image must be"):
            pipe.img2img(np.zeros((8, 8, 3), np.uint8), meta,
                         strength=0.5, steps=4)
        with pytest.raises(ValueError, match="num_images"):
            pipe.img2img(np.zeros((3, size, size, 3), np.uint8), meta,
                         strength=0.5, steps=4, num_images=2)
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old


def test_cli_img2img_dispatch(tmp_path, monkeypatch):
    """--img2img routes to pipeline.img2img with the resized source image
    and --strength; pipeline construction is stubbed (full-config init is
    a TPU-scale job, covered by the real-pipeline tests above)."""
    import json

    from PIL import Image

    import instancediffusion_tpu.inference as inf
    import instancediffusion_tpu.pipeline as pl

    demo = {
        "caption": "a scene", "width": 64, "height": 64,
        "annos": [{"bbox": [8, 8, 32, 32], "mask": [], "caption": "a dog"}],
    }
    dj = tmp_path / "demo.json"
    dj.write_text(json.dumps(demo))
    src = tmp_path / "src.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ).save(src)

    calls = {}

    class StubPipe:
        def __init__(self):
            from instancediffusion_tpu.config import Config

            self.cfg = Config()

        def img2img(self, image, meta, strength, num_images, **kw):
            calls["image"] = np.asarray(image)
            calls["strength"] = strength
            calls["meta"] = meta
            res = calls["image"].shape[0]
            return np.zeros((num_images, res, res, 3), np.uint8)

        def generate(self, *a, **kw):  # must NOT be hit
            raise AssertionError("generate called in --img2img mode")

    monkeypatch.setattr(
        pl.InstanceDiffusionPipeline, "random_init",
        classmethod(lambda cls, cfg, seed=0: StubPipe()),
    )
    inf.main([
        "--input_json", str(dj), "--img2img", str(src), "--strength", "0.3",
        "--num_images", "1", "--steps", "2", "--output", str(tmp_path / "o"),
    ])
    expect = StubPipe().cfg
    res = expect.model.image_size * 2 ** (len(expect.autoencoder.ch_mult) - 1)
    assert calls["image"].shape == (res, res, 3)
    assert calls["strength"] == 0.3
    assert calls["meta"]["prompt"] == "a scene"
