"""Host-side geometry: RLE codec, point sampling, rescaling."""

import numpy as np

from instancediffusion_tpu.data import geometry as geo


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        h, w = rng.integers(5, 40, 2)
        mask = (rng.random((h, w)) < 0.3).astype(np.uint8)
        rle = geo.rle_encode(mask)
        back = geo.rle_decode(rle)[:, :, 0]
        np.testing.assert_array_equal(back, mask)


def test_rle_known_example():
    # 2x2 column-major, runs: [1, 3] -> pixel (0,0)=0, rest 1
    mask = np.array([[0, 1], [1, 1]], np.uint8)
    rle = geo.rle_encode(mask)
    assert rle["size"] == [2, 2]
    np.testing.assert_array_equal(geo.rle_decode(rle)[:, :, 0], mask)


def test_rle_uncompressed_counts():
    rle = {"size": [2, 3], "counts": [1, 2, 3]}  # col-major runs
    m = geo.rle_decode(rle)[:, :, 0]
    flat = m.T.reshape(-1)
    np.testing.assert_array_equal(flat, [0, 1, 1, 0, 0, 0])


def test_sample_random_points_sorted_and_inside():
    mask = np.zeros((32, 32, 1), np.uint8)
    mask[10:20, 5:15] = 1
    pts = geo.sample_random_points_from_mask(mask, 20, np.random.default_rng(0))
    assert len(pts) == 40
    xy = np.asarray(pts).reshape(-1, 2)
    # all inside the mask (x=col, y=row)
    assert all(mask[int(y), int(x), 0] == 1 for x, y in xy)
    d = np.linalg.norm(xy, axis=1)
    assert (np.diff(d) >= -1e-6).all()  # sorted by distance to origin


def test_sample_random_points_empty_mask():
    pts = geo.sample_random_points_from_mask(
        np.zeros((16, 16, 1), np.uint8), 20, np.random.default_rng(0)
    )
    assert pts == [0.0] * 40


def test_sample_sparse_points():
    mask = np.zeros((64, 64, 1), np.uint8)
    mask[16:48, 16:48] = 1
    pts = geo.sample_sparse_points_from_mask(mask, k=256, rng=np.random.default_rng(0))
    assert pts is not None and len(pts) == 512
    xy = np.asarray(pts).reshape(-1, 2)
    d = np.linalg.norm(xy, axis=1)
    assert (np.diff(d) >= -1e-6).all()
    # points near the mask (boundary pixels can sit 1px outside via contours)
    assert (xy >= 14).all() and (xy <= 49).all()


def test_sample_sparse_points_none_for_empty():
    assert geo.sample_sparse_points_from_mask(
        np.zeros((16, 16, 1), np.uint8), 16
    ) is None


def test_reorder_scribbles():
    pts = [[5, 5], [1, 1], [3, 3], [2, 2]]
    out = geo.reorder_scribbles(pts)
    assert len(out) == 20
    d = [np.hypot(x, y) for x, y in out]
    assert d == sorted(d)


def test_rescalers():
    assert geo.rescale_box_xywh([10, 20, 30, 40], 100, 200) == [
        0.1, 0.1, 0.4, 0.3,
    ]
    np.testing.assert_allclose(
        geo.point_from_box([0.2, 0.4, 0.6, 0.8]), [0.4, 0.6], rtol=1e-12
    )
    assert geo.convert_points([50, 100, 200, 400], 100, 200) == [
        0.5, 0.5, 1.0, 1.0,
    ]
