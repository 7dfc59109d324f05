"""End-to-end pipeline smoke tests on a tiny config (CPU): demo meta ->
images, PLMS and MIS paths, determinism, CLI demo-JSON parsing."""

import json
import os

import numpy as np
import pytest

from instancediffusion_tpu.config import (
    Config, TextEncoderConfig, UNetConfig, UniFusionConfig, VAEConfig,
)
from instancediffusion_tpu.pipeline import InstanceDiffusionPipeline


def tiny_config() -> Config:
    gcfg = UniFusionConfig(
        in_dim=32, out_dim=32, mid_dim=32, fourier_freqs=4,
        fourier_freqs_polygons=4, n_scribble_points=4, n_polygon_points=8,
        seg_channels=4, seg_resize_input=64,
        # micro ConvNeXt: full -T costs ~35s/forward on this 1-core host
        convnext_depths=(1, 1), convnext_dims=(8, 16),
        convnext_feature_dim=1024,
    )
    return Config(
        model=UNetConfig(
            image_size=8, model_channels=32, num_heads=4, context_dim=32,
            max_objs=4, grounding_tokenizer=gcfg,
            # single level, no remat: each extra level costs minutes of
            # XLA:CPU compile on this host; full structure is covered by
            # test_parallel's slow tier + the model-parity suite
            channel_mult=(1,), num_res_blocks=1, attention_resolutions=(1,),
            use_checkpoint=False,
        ),
        autoencoder=VAEConfig(ch=32, ch_mult=(1, 2), resolution=64),
        text_encoder=TextEncoderConfig(
            vocab_size=512, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
        ),
    )


META = {
    "prompt": "two shapes",
    "phrases": ["a red square", "a blue circle"],
    "locations": [[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]],
    "points": [[0.3, 0.3], [0.75, 0.75]],
    "alpha_type": [0.75, 0.0, 0.25],
}


@pytest.fixture()
def pipe(tiny_pipe):
    # session-shared instance (tests/conftest.py) — generate/generate_batch
    # never mutate params, and sharing its _sample_cache removes duplicate
    # random_init + tracing across test files on this 1-core host
    return tiny_pipe


def _patch_meta(pipe):
    # tiny config has shorter scribble/polygon/seg dims; adapt meta
    g = pipe.cfg.model.grounding_tokenizer
    meta = dict(META)
    meta["scribbles"] = [[0.2] * (g.n_scribble_points * 2)] * 2
    meta["polygons"] = [[0.3] * (g.n_polygon_points * 2)] * 2
    meta["segs"] = None
    return meta


def test_generate_plms(pipe):
    import instancediffusion_tpu.data.grounding_input as gi

    meta = _patch_meta(pipe)
    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    try:
        imgs = pipe.generate(meta, num_images=2, steps=5, mis=0.0, seed=1)
        # VAE upscale = 2^(len(ch_mult)-1) = 2 for the tiny (1,2) config
        size = pipe.cfg.model.image_size * 2
        assert imgs.shape == (2, size, size, 3)
        assert imgs.dtype == np.uint8
        # determinism: same seed -> same images
        imgs2 = pipe.generate(meta, num_images=2, steps=5, mis=0.0, seed=1)
        np.testing.assert_array_equal(imgs, imgs2)
        # different seed -> different images
        imgs3 = pipe.generate(meta, num_images=2, steps=5, mis=0.0, seed=2)
        assert not np.array_equal(imgs, imgs3)

        # MIS path: 2 instances -> 3 trajectories
        imgs4 = pipe.generate(meta, num_images=1, steps=5, mis=0.4, seed=1)
        assert imgs4.shape == (1, size, size, 3)
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old


def test_demo_json_parsing(tmp_path):
    from instancediffusion_tpu.inference import parse_demo_json

    demo = {
        "caption": "a scene",
        "width": 256,
        "height": 256,
        "annos": [
            {"bbox": [10, 20, 100, 120], "mask": [], "caption": "a dog"},
            {"bbox": [150, 30, 80, 90], "mask": [], "caption": "a cat",
             "point": [190, 75]},
        ],
    }
    p = tmp_path / "demo.json"
    p.write_text(json.dumps(demo))
    meta = parse_demo_json(str(p), rng=np.random.default_rng(0))
    assert meta["prompt"] == "a scene"
    assert meta["phrases"] == ["a dog", "a cat"]
    np.testing.assert_allclose(
        meta["locations"][0],
        [10 / 256, 20 / 256, 110 / 256, 140 / 256],
    )
    # explicit point honored when ALL annos have points; here only one anno
    # has a point -> box centers used (inference.py:243-246 semantics)
    np.testing.assert_allclose(
        meta["points"][0], [(10 + 110) / 2 / 256, (20 + 140) / 2 / 256]
    )
    # masks are zeroed by default (reference quirk) -> polygons all zero
    assert all(v == 0 for v in meta["polygons"][0])
    assert len(meta["scribbles"][0]) == 40


@pytest.mark.heavy
def test_generate_batch_matches_per_image_and_shards(pipe):
    """Batched eval generation: a 2-meta batch equals the two per-image
    samples row-for-row (same per-meta seeds and schedule), and the same
    call runs sharded over the 8-device mesh with identical output."""
    import jax

    import instancediffusion_tpu.data.grounding_input as gi
    from instancediffusion_tpu.parallel.mesh import make_mesh

    meta = _patch_meta(pipe)
    meta2 = dict(meta)
    meta2["prompt"] = "other shapes"
    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    try:
        batch = pipe.generate_batch(
            [meta, meta2], steps=5, seeds=[11, 22], alpha=0.75
        )
        size = pipe.cfg.model.image_size * 2
        assert batch.shape == (2, size, size, 3)
        assert not np.array_equal(batch[0], batch[1])

        if len(jax.devices()) >= 2:
            mesh = make_mesh(devices=jax.devices()[:2])
            sharded = pipe.generate_batch(
                [meta, meta2], steps=5, seeds=[11, 22], alpha=0.75, mesh=mesh
            )
            np.testing.assert_array_equal(batch, sharded)
            # padding path: 3 metas on a 2-device mesh
            three = pipe.generate_batch(
                [meta, meta2, meta], steps=5, seeds=[11, 22, 33], mesh=mesh
            )
            assert three.shape == (3, size, size, 3)
            np.testing.assert_array_equal(three[0], batch[0])
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old


_DEMO_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "demos")


@pytest.mark.parametrize("name", sorted(os.listdir(_DEMO_DIR)))
def test_all_shipped_demos_parse(name):
    """Every demo JSON in demos/ must parse into a complete meta — the
    reference ships 12 demos as its manual integration suite
    (/root/reference/demos/, SURVEY §4.4); ours must match in coverage:
    iterative rounds, pose-by-part-boxes pairs, explicit points, explicit
    scribbles, and part-level RLE masks."""
    from instancediffusion_tpu.inference import parse_demo_json

    path = os.path.join(_DEMO_DIR, name)
    use_masks = "masks" in name
    meta = parse_demo_json(path, use_masks=use_masks,
                           rng=np.random.default_rng(0))
    k = len(meta["phrases"])
    assert k >= 1
    assert len(meta["locations"]) == k
    assert len(meta["points"]) == k
    assert len(meta["polygons"]) == k
    assert len(meta["segs"]) == k
    for loc in meta["locations"]:
        assert all(0.0 <= v <= 1.0 for v in loc)
    for p in meta["points"]:
        assert all(0.0 <= v <= 1.0 for v in p)
    if use_masks:
        # mask demos must light up the seg branch: nonzero segs + polygons
        assert any(np.asarray(s).sum() > 0 for s in meta["segs"])
        assert any(np.abs(np.asarray(pg)).sum() > 0 for pg in meta["polygons"])
    if "scribble" in name:
        assert len(meta["scribbles"]) == k
        assert all(len(s) == 40 for s in meta["scribbles"])


def test_demo_inventory_matches_reference_count():
    assert len([f for f in os.listdir(_DEMO_DIR) if f.endswith(".json")]) >= 12


@pytest.mark.heavy
def test_generate_batch_mis_matches_per_image_and_shards(pipe):
    """Batched MIS (VERDICT r2 missing #4): metas with DIFFERENT instance
    counts share one compiled program (padded to a static trajectory count,
    null trajectories weighted out of the merge) and reproduce the
    per-image generate(mis>0) results; the same call shards over a mesh."""
    import jax

    import instancediffusion_tpu.data.grounding_input as gi
    from instancediffusion_tpu.parallel.mesh import make_mesh

    meta2 = _patch_meta(pipe)          # 2 instances
    meta1 = dict(meta2)                # 1 instance
    meta1["phrases"] = meta2["phrases"][:1]
    meta1["locations"] = meta2["locations"][:1]
    meta1["points"] = meta2["points"][:1]
    meta1["scribbles"] = meta2["scribbles"][:1]
    meta1["polygons"] = meta2["polygons"][:1]

    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    try:
        batch = pipe.generate_batch(
            [meta2, meta1], steps=5, seeds=[11, 22], alpha=0.75, mis=0.4
        )
        size = pipe.cfg.model.image_size * 2
        assert batch.shape == (2, size, size, 3)

        solo2 = pipe.generate(meta2, num_images=1, steps=5, mis=0.4, seed=11)
        solo1 = pipe.generate(meta1, num_images=1, steps=5, mis=0.4, seed=22)
        # same math, different static trajectory padding -> tiny fp jitter
        assert np.max(np.abs(batch[0].astype(int) - solo2[0].astype(int))) <= 1
        assert np.max(np.abs(batch[1].astype(int) - solo1[0].astype(int))) <= 1

        if len(jax.devices()) >= 2:
            mesh = make_mesh(devices=jax.devices()[:2])
            sharded = pipe.generate_batch(
                [meta2, meta1], steps=5, seeds=[11, 22], alpha=0.75,
                mis=0.4, mesh=mesh,
            )
            np.testing.assert_array_equal(batch, sharded)
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old


def test_single_encode_dispatch(pipe):
    """The conditioning path issues exactly ONE text-encode dispatch per
    generate()/generate_batch() call (incl. MIS instance prompts) — every
    eager jit call costs a round trip over the remote-device link
    (docs/PERF.md r4 itemization: the old 3-call + per-phrase-fetch path
    was ~130ms/batch)."""
    import instancediffusion_tpu.data.grounding_input as gi

    meta = _patch_meta(pipe)
    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    calls = []
    real = pipe._encode_text_jit
    pipe._encode_text_jit = lambda *a, **kw: (calls.append(1), real(*a, **kw))[1]
    try:
        pipe.generate(meta, num_images=2, steps=5, mis=0.0, seed=1)
        assert len(calls) == 1, f"generate: {len(calls)} encode dispatches"
        calls.clear()
        pipe.generate(meta, num_images=1, steps=5, mis=0.4, seed=1)
        assert len(calls) == 1, f"generate(mis): {len(calls)} dispatches"
        calls.clear()
        pipe.generate_batch([meta, meta], steps=5, seeds=[1, 2], mis=0.4)
        assert len(calls) == 1, f"generate_batch: {len(calls)} dispatches"
    finally:
        pipe._encode_text_jit = real
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old


def test_generate_async_pipelined(pipe):
    """block=False double-buffering (VERDICT r4 #1): dispatch N+1 before
    fetching N. Handles must be independent and bitwise-equal to the
    blocking path (the async path shares the same compiled program; only
    the fetch moves)."""
    import instancediffusion_tpu.data.grounding_input as gi

    from instancediffusion_tpu.pipeline import PendingImages

    meta = _patch_meta(pipe)
    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    try:
        blocking = pipe.generate(meta, num_images=2, steps=5, mis=0.0, seed=1)
        # enqueue two batches back-to-back, then fetch in order
        h1 = pipe.generate(meta, num_images=2, steps=5, mis=0.0, seed=1,
                           block=False)
        h2 = pipe.generate(meta, num_images=2, steps=5, mis=0.0, seed=2,
                           block=False)
        assert isinstance(h1, PendingImages)
        assert "fetch" not in h1.timings  # nothing read back yet
        a, b = h1.fetch(), h2.fetch()
        np.testing.assert_array_equal(a, blocking)
        assert not np.array_equal(a, b)
        assert h1.timings["fetch"] >= 0.0
        # the MIS program also dispatches asynchronously
        h3 = pipe.generate(meta, num_images=1, steps=5, mis=0.4, seed=1,
                           block=False)
        mis_blocking = pipe.generate(meta, num_images=1, steps=5, mis=0.4,
                                     seed=1)
        np.testing.assert_array_equal(h3.fetch(), mis_blocking)
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old


def test_mis_fraction_below_one_step_is_plain_plms(pipe):
    """mis > 0 with int(steps*mis) == 0 must not build MIS conditioning or
    compile a separate (identical) program: it IS the plain path (ADVICE r4:
    want_mis gated on mis_step, num_traj excluded from the cache key)."""
    import instancediffusion_tpu.data.grounding_input as gi

    meta = _patch_meta(pipe)
    g = pipe.cfg.model.grounding_tokenizer
    old = (gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE)
    gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = (
        g.n_scribble_points, g.n_polygon_points, g.seg_resize_input,
    )
    try:
        plain = pipe.generate(meta, num_images=1, steps=5, mis=0.0, seed=3)
        keys_before = set(pipe._sample_cache)
        # 5 steps * 0.1 -> mis_step 0: identical program, identical images
        tiny_mis = pipe.generate(meta, num_images=1, steps=5, mis=0.1, seed=3)
        np.testing.assert_array_equal(plain, tiny_mis)
        assert set(pipe._sample_cache) == keys_before, (
            "mis_step==0 created a duplicate sample-fn cache entry"
        )
    finally:
        gi.N_SCRIBBLE_POINTS, gi.N_POLYGON_POINTS, gi.SEG_SIZE = old


def test_demo_modality_coverage_matches_reference_mix():
    """VERDICT r4 #8: the shipped demo set must cover the reference's
    modality MIX (/root/reference/demos/ + README.md:122-206), not just its
    count — >=1 demo each with explicit points, explicit scribbles,
    part-level RLE masks (the MIS-capable seg path), a part-level box
    decomposition (the eagle_left/right pose pair analogue), and the full
    5-round iterative chain with a growing instance set."""
    import json as _json

    names = sorted(f for f in os.listdir(_DEMO_DIR) if f.endswith(".json"))
    part_words = ("head", "wing", "beak", "leg", "tongue", "tail", "paw")
    has = {"points": False, "scribbles": False, "masks": False,
           "part_boxes": False}
    for name in names:
        with open(os.path.join(_DEMO_DIR, name)) as f:
            annos = _json.load(f)["annos"]
        if any(a.get("point") for a in annos):
            has["points"] = True
        if any(a.get("scribble") for a in annos):
            has["scribbles"] = True
        if any(a.get("mask") for a in annos):
            has["masks"] = True
        caps = [a["caption"].lower() for a in annos]
        if sum(any(w in c for w in part_words) for c in caps) >= 2:
            has["part_boxes"] = True
    missing = [k for k, v in has.items() if not v]
    assert not missing, f"demo set lacks modalities: {missing}"

    # iterative r1-r5 chain present, instance set growing per round
    # (README.md:166-186 iterative editing protocol)
    counts = []
    for r in range(1, 6):
        name = f"demo_iterative_r{r}.json"
        assert name in names, f"iterative chain incomplete: {name} missing"
        with open(os.path.join(_DEMO_DIR, name)) as f:
            counts.append(len(_json.load(f)["annos"]))
    assert counts == sorted(counts) and counts[-1] > counts[0], counts

    # the mask demo must light the seg path end-to-end through the parser
    from instancediffusion_tpu.inference import parse_demo_json

    mask_demos = [n for n in names if "masks" in n]
    assert mask_demos, "no RLE-mask demo shipped"
    meta = parse_demo_json(os.path.join(_DEMO_DIR, mask_demos[0]),
                           use_masks=True, rng=np.random.default_rng(0))
    assert any(np.asarray(s).sum() > 0 for s in meta["segs"])
