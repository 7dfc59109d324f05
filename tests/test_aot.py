"""jax.export AOT program cache (aot.py + pipeline.enable_aot):

  * save path: first generate() under AOT exports the program, writes the
    blob, and produces bitwise-identical images to the plain jit path
  * load path: a "restarted" cache (fresh AOTProgramCache over the same
    directory) reuses the blob instead of re-exporting
  * fallback: a corrupt blob must never break generation — the variant
    drops back to plain jit and the images are still identical

The reference has no analogue (one-shot CLI, inference.py:165-310); the
hardware numbers motivating this live in docs/PERF.md r5 cold-start.
"""

import glob
import os

import numpy as np
import pytest

from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline
from tests.test_pipeline import tiny_config, _patch_meta


@pytest.fixture()
def own_pipe(monkeypatch):
    # own instance: enable_aot mutates _aot/_sample_cache, so the shared
    # session tiny_pipe is off-limits (see tests/conftest.py)
    pipe = InstanceDiffusionPipeline.random_init(tiny_config(), seed=0)
    import instancediffusion_tpu.data.grounding_input as gi

    g = pipe.cfg.model.grounding_tokenizer
    monkeypatch.setattr(gi, "N_SCRIBBLE_POINTS", g.n_scribble_points)
    monkeypatch.setattr(gi, "N_POLYGON_POINTS", g.n_polygon_points)
    monkeypatch.setattr(gi, "SEG_SIZE", g.seg_resize_input)
    return pipe


def _gen(pipe, meta):
    return pipe.generate(meta, num_images=2, steps=5, mis=0.0, seed=1)


@pytest.mark.heavy
def test_aot_save_load_bitwise(own_pipe, tmp_path):
    pipe = own_pipe
    meta = _patch_meta(pipe)
    imgs_jit = _gen(pipe, meta)

    # save path: export + write blob, images bitwise-equal to jit
    pipe.enable_aot(str(tmp_path))
    imgs_save = _gen(pipe, meta)
    np.testing.assert_array_equal(imgs_jit, imgs_save)
    assert pipe._aot.stats == {"loads": 0, "saves": 1, "fallbacks": 0}
    blobs = glob.glob(str(tmp_path / "*.jaxexport"))
    assert len(blobs) == 1 and os.path.getsize(blobs[0]) > 0
    assert "plms-" in os.path.basename(blobs[0])

    # "restart": a fresh cache over the same directory loads, not saves
    pipe.enable_aot(str(tmp_path))
    imgs_load = _gen(pipe, meta)
    np.testing.assert_array_equal(imgs_jit, imgs_load)
    assert pipe._aot.stats == {"loads": 1, "saves": 0, "fallbacks": 0}
    assert len(glob.glob(str(tmp_path / "*.jaxexport"))) == 1

    # a different static signature (sampler) gets its own blob
    imgs_dpm = pipe.generate(meta, num_images=2, steps=5, seed=1,
                             sampler="dpm")
    assert imgs_dpm.shape == imgs_jit.shape
    assert pipe._aot.stats["saves"] == 1
    assert any(
        os.path.basename(b).startswith("dpm-")
        for b in glob.glob(str(tmp_path / "*.jaxexport"))
    )


@pytest.mark.heavy
def test_aot_corrupt_blob_falls_back(own_pipe, tmp_path):
    pipe = own_pipe
    meta = _patch_meta(pipe)
    imgs_jit = _gen(pipe, meta)

    pipe.enable_aot(str(tmp_path))
    _gen(pipe, meta)
    [blob] = glob.glob(str(tmp_path / "*.jaxexport"))
    with open(blob, "wb") as f:
        f.write(b"not a stablehlo blob")

    pipe.enable_aot(str(tmp_path))
    imgs = _gen(pipe, meta)
    np.testing.assert_array_equal(imgs_jit, imgs)
    assert pipe._aot.stats["fallbacks"] == 1
