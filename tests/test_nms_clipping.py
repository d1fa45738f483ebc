"""NMS, host clipping, and exclusively-owned-areas tests."""

import math

import numpy as np
import pytest

from similari_tpu import BoundingBox, Universal2DBox
from similari_tpu.utils.clipping import (
    exclusively_owned_areas,
    exclusively_owned_areas_normalized_shares,
    intersection_area,
    sutherland_hodgman_clip,
)
from similari_tpu.utils.nms import nms


def test_nms_with_score():
    bbox1 = (BoundingBox(10.0, 11.0, 3.0, 3.8).as_xyaah(), 1.0)
    bbox2 = (BoundingBox(10.3, 11.1, 2.9, 3.9).as_xyaah(), 0.9)
    res = nms([bbox2, bbox1], nms_threshold=0.7, score_threshold=0.0)
    assert len(res) == 1
    assert res[0].as_ltwh() == BoundingBox(10.0, 11.0, 3.0, 3.8)


def test_nms_no_score_uses_height():
    bbox1 = (BoundingBox(10.0, 11.0, 3.0, 4.0).as_xyaah(), None)
    bbox2 = (BoundingBox(10.3, 11.1, 2.9, 3.9).as_xyaah(), None)
    res = nms([bbox2, bbox1], nms_threshold=0.7, score_threshold=0.0)
    assert len(res) == 1
    assert abs(res[0].height - 4.0) < 1e-6


def test_nms_keeps_disjoint():
    boxes = [
        (BoundingBox(0.0, 0.0, 5.0, 5.0).as_xyaah(), None),
        (BoundingBox(0.0, 0.0, 5.1, 5.2).as_xyaah(), None),
        (BoundingBox(20.0, 20.0, 5.0, 5.0).as_xyaah(), None),
    ]
    res = nms(boxes, nms_threshold=0.8, score_threshold=None)
    assert len(res) == 2


def test_nms_oriented():
    a = Universal2DBox(0.0, 0.0, None, 1.0, 5.0)
    b = Universal2DBox(0.1, 0.1, None, 1.0, 5.1)
    b.rotate(0.05)
    c = Universal2DBox(10.0, 10.0, None, 1.0, 4.0)
    res = nms([(a, None), (b, None), (c, None)], nms_threshold=0.5, score_threshold=None)
    assert len(res) == 2


def test_nms_score_threshold_filters():
    boxes = [
        (BoundingBox(0.0, 0.0, 5.0, 5.0).as_xyaah(), 0.9),
        (BoundingBox(20.0, 0.0, 5.0, 5.0).as_xyaah(), 0.1),
    ]
    res = nms(boxes, nms_threshold=0.8, score_threshold=0.5)
    assert len(res) == 1


def test_clip_api():
    bbox1 = BoundingBox(0.0, 0.0, 5.0, 10.0).as_xyaah()
    bbox2 = BoundingBox(0.0, 0.0, 10.0, 5.0).as_xyaah()
    clip = sutherland_hodgman_clip(bbox1, bbox2)
    assert abs(clip.area() - 25.0) < 1e-6
    assert abs(intersection_area(bbox1, bbox2) - 25.0) < 1e-6

    bbox2 = BoundingBox(0.0, 0.0, 5.0, 10.0).as_xyaah()
    bbox2.rotate(0.5)
    area = intersection_area(bbox1, bbox2)
    assert 0.0 < area < 50.0


def test_own_areas_golden():
    """Reference test `bbox_own_areas.rs:57-79`."""
    bb1 = BoundingBox(0.0, 0.0, 10.0, 10.0).as_xyaah()
    bb2 = BoundingBox(5.0, 5.0, 10.0, 10.0).as_xyaah()
    bb3 = BoundingBox(10.0, 10.0, 10.0, 10.0).as_xyaah()
    own = exclusively_owned_areas([bb1, bb2, bb3])
    assert own[0] == pytest.approx(75.0, abs=1e-4)
    assert own[1] == pytest.approx(50.0, abs=1e-4)
    assert own[2] == pytest.approx(75.0, abs=1e-4)
    shares = exclusively_owned_areas_normalized_shares([bb1, bb2, bb3], own)
    assert shares == pytest.approx([0.75, 0.50, 0.75], abs=1e-4)


def test_own_areas_triple_overlap():
    """Inclusion-exclusion depth > 1: three mutually overlapping boxes."""
    bb1 = BoundingBox(0.0, 0.0, 10.0, 10.0).as_xyaah()
    bb2 = BoundingBox(5.0, 0.0, 10.0, 10.0).as_xyaah()
    bb3 = BoundingBox(0.0, 5.0, 10.0, 10.0).as_xyaah()
    own = exclusively_owned_areas([bb1, bb2, bb3])
    # bb1 loses the right half (50) and bottom half (50) minus their common
    # 5x5 corner: own = 100 - 50 - 50 + 25 = 25
    assert own[0] == pytest.approx(25.0, abs=1e-4)


def test_native_nms_matches_device_kernel():
    """Host C++ NMS (native/nms.cpp) == device kernel, aligned + oriented."""
    import jax.numpy as jnp

    from similari_tpu import native
    from similari_tpu.ops.nms import nms_kernel

    if not native.nms_available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(4)
    for oriented in (False, True):
        for n in (5, 32, 100):
            b = np.zeros((n, 5), np.float32)
            b[:, 0] = rng.uniform(0, 200, n)
            b[:, 1] = rng.uniform(0, 200, n)
            b[:, 2] = rng.uniform(0, 0.9, n) if oriented else 0.0
            b[:, 3] = rng.uniform(0.5, 1.5, n)
            b[:, 4] = rng.uniform(15, 45, n)
            ranks = rng.uniform(0.5, 1.0, n).astype(np.float32)
            order = np.argsort(-ranks)
            bs = b[order]
            keep_host = native.nms_host(bs, 0.6, oriented)
            keep_dev = np.asarray(nms_kernel(
                jnp.asarray(bs),
                jnp.ones((n,), bool), jnp.float32(0.6), oriented))
            np.testing.assert_array_equal(keep_host, keep_dev,
                                          err_msg=f"oriented={oriented} n={n}")


def test_native_nms_batch():
    from similari_tpu import native

    if not native.nms_available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(9)
    b = np.zeros((4, 10, 5), np.float32)
    b[..., 0] = rng.uniform(0, 60, (4, 10))
    b[..., 1] = rng.uniform(0, 60, (4, 10))
    b[..., 3] = 1.0
    b[..., 4] = rng.uniform(15, 30, (4, 10))
    keep = native.nms_host_batch(b, 0.5, False)
    for i in range(4):
        np.testing.assert_array_equal(keep[i], native.nms_host(b[i], 0.5, False))
