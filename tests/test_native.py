"""Native region library tests (builds with g++ at first use)."""

import numpy as np
import pytest

from mmtrack_tpu.eval.metrics import iou_xywh
from mmtrack_tpu.native import batch_iou_xywh, load_region_lib, polygon_iou, polygon_to_xywh


def test_native_builds_and_loads():
    assert load_region_lib() is not None


def test_polygon_iou_known_values():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    # identical squares
    assert polygon_iou(sq, sq) == pytest.approx(1.0, abs=2e-3)
    # half-overlapping squares: inter 2, union 6
    sq2 = sq + [1.0, 0.0]
    assert polygon_iou(sq, sq2) == pytest.approx(1.0 / 3.0, abs=5e-3)
    # rotated square (45 deg, same center, side sqrt(2)*2): known IoU
    rot = np.array([[1, -1.0 + 1], [3 - 1, 1], [1, 3 - 1], [-1 + 1, 1]], float)
    v = polygon_iou(sq, rot)
    assert 0.4 < v < 0.6  # inscribed diamond: inter=2, union=4+2-2=4 -> 0.5
    assert v == pytest.approx(0.5, abs=5e-3)
    # disjoint
    assert polygon_iou(sq, sq + [10.0, 0.0]) == pytest.approx(0.0, abs=1e-6)


def test_batch_iou_matches_numpy():
    rng = np.random.RandomState(0)
    a = np.concatenate([rng.uniform(0, 50, (1000, 2)),
                        rng.uniform(5, 30, (1000, 2))], axis=1)
    b = np.concatenate([rng.uniform(0, 50, (1000, 2)),
                        rng.uniform(5, 30, (1000, 2))], axis=1)
    got = batch_iou_xywh(a, b)
    want = iou_xywh(a, b)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_polygon_to_xywh():
    poly = np.array([[3, 4], [9, 4], [9, 10], [3, 10]], float)
    np.testing.assert_allclose(polygon_to_xywh(poly), [3, 4, 6, 6])
