"""Device own-area kernel vs the exact host f64 oracle.

Reference semantics `/root/reference/src/utils/clipping/bbox_own_areas.rs:8-46`;
the host oracle (`utils/clipping.py`) is the literal inclusion-exclusion port,
the device kernel (`ops/ownarea.py`) truncates the expansion at a static order
over top-K neighbors.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from similari_tpu.ops import geometry as geo
from similari_tpu.ops.ownarea import intersection_area_k, own_area_shares
from similari_tpu.utils.bbox import Universal2DBox
from similari_tpu.utils.clipping import (
    exclusively_owned_areas_normalized_shares,
)


def _to_boxes(arr):
    return [
        Universal2DBox(
            xc=float(b[0]), yc=float(b[1]), angle=float(b[2]),
            aspect=float(b[3]), height=float(b[4]),
        )
        for b in arr
    ]


def _host_shares(arr):
    return np.asarray(
        exclusively_owned_areas_normalized_shares(_to_boxes(arr)), np.float64
    )


def _random_scene(rng, d, spread, oriented):
    boxes = np.zeros((d, 5), np.float32)
    boxes[:, 0] = rng.uniform(0, spread, d)
    boxes[:, 1] = rng.uniform(0, spread, d)
    if oriented:
        boxes[:, 2] = rng.uniform(0, 1.2, d)
    boxes[:, 3] = rng.uniform(0.5, 2.0, d)
    boxes[:, 4] = rng.uniform(3, 10, d)
    return boxes


def test_intersection_area_k_pair_matches_quad_kernel():
    rng = np.random.default_rng(1)
    boxes = _random_scene(rng, 64, 15, oriented=True)
    v = geo.box_vertices(jnp.asarray(boxes))
    pair = geo.quad_intersection_area(v[:, None], v[None, :])
    stack = jnp.stack(
        [jnp.broadcast_to(v[:, None], (64, 64, 4, 2)),
         jnp.broadcast_to(v[None, :], (64, 64, 4, 2))],
        axis=-3,
    )
    k = intersection_area_k(stack)
    np.testing.assert_allclose(np.asarray(k), np.asarray(pair), atol=1e-3)


def test_intersection_area_k_identical_triple():
    """Degenerate collinear tie-break: three identical boxes."""
    b = jnp.asarray([[0.0, 0.0, 0.3, 1.5, 2.0]], jnp.float32)
    v = geo.box_vertices(b)[0]
    area = float(geo.box_area(b)[0])
    got = float(intersection_area_k(jnp.stack([v, v, v])[None])[0])
    assert got == pytest.approx(area, rel=1e-5)


@pytest.mark.parametrize("oriented", [False, True])
def test_exact_mode_matches_host_oracle(oriented):
    """With order >= D the truncation vanishes: exact parity with the host
    f64 inclusion-exclusion on dense little scenes."""
    rng = np.random.default_rng(7 if oriented else 8)
    for _ in range(20):
        d = int(rng.integers(2, 6))
        boxes = _random_scene(rng, d, 18, oriented)
        host = _host_shares(boxes)
        dev = np.asarray(
            own_area_shares(
                jnp.asarray(boxes), jnp.ones((d,), bool), order=5, neighbors=4
            )
        )
        np.testing.assert_allclose(dev, host, atol=2e-3)


def test_realistic_scene_order3():
    """Sparse-ish MOT-like scene: order-3 truncation is already exact."""
    rng = np.random.default_rng(3)
    d = 40
    boxes = np.zeros((d, 5), np.float32)
    xy = np.stack(np.meshgrid(np.arange(8), np.arange(5)), -1).reshape(-1, 2)
    boxes[:, :2] = xy * 12.0 + rng.uniform(-3, 3, (d, 2))
    boxes[:, 2] = rng.uniform(0, 0.8, d)
    boxes[:, 3] = rng.uniform(0.5, 2, d)
    boxes[:, 4] = rng.uniform(4, 9, d)
    host = _host_shares(boxes)
    dev = np.asarray(
        own_area_shares(jnp.asarray(boxes), jnp.ones((d,), bool), order=3)
    )
    np.testing.assert_allclose(dev, host, atol=2e-3)


def test_bonferroni_brackets_on_deep_stack():
    """A pile of 5 mutually-overlapping boxes exceeds the order-3/4
    truncation depth; the estimates must bracket the exact value (odd #terms
    over-, even #terms under-estimates the own area) and order-5 is exact."""
    rng = np.random.default_rng(11)
    d = 5
    boxes = np.zeros((d, 5), np.float32)
    boxes[:, 0] = rng.uniform(-2, 2, d)
    boxes[:, 1] = rng.uniform(-2, 2, d)
    boxes[:, 2] = rng.uniform(0, 0.6, d)
    boxes[:, 3] = rng.uniform(0.8, 1.4, d)
    boxes[:, 4] = rng.uniform(6, 9, d)
    host = _host_shares(boxes)
    valid = jnp.ones((d,), bool)
    b = jnp.asarray(boxes)
    over = np.asarray(own_area_shares(b, valid, order=3, neighbors=4))
    under = np.asarray(own_area_shares(b, valid, order=4, neighbors=4))
    exact = np.asarray(own_area_shares(b, valid, order=5, neighbors=4))
    tol = 2e-3
    assert np.all(over >= host - tol)
    assert np.all(under <= host + tol)
    np.testing.assert_allclose(exact, host, atol=tol)


def test_invalid_rows_get_neutral_share():
    boxes = np.zeros((4, 5), np.float32)
    boxes[:, 3] = 1.0
    boxes[:, 4] = 5.0
    boxes[:2, 0] = [0.0, 1.0]  # two overlapping valid boxes
    valid = jnp.asarray([True, True, False, False])
    dev = np.asarray(own_area_shares(jnp.asarray(boxes), valid))
    assert dev[2] == 1.0 and dev[3] == 1.0
    assert dev[0] < 1.0 and dev[1] < 1.0


def test_visual_tracker_device_vs_host_backend():
    """End-to-end: device own-area backend reproduces the host backend's
    tracking decisions on an occlusion-gated scenario."""
    from similari_tpu import BoundingBox
    from similari_tpu.trackers import PositionalMetricType
    from similari_tpu.trackers.visual import (
        VisualSort,
        VisualSortMetricType,
        VisualSortObservation,
        VisualSortObservationSet,
        VisualSortOptions,
    )

    def opts(backend):
        o = (
            VisualSortOptions()
            .max_idle_epochs(10)
            .visual_metric(VisualSortMetricType.euclidean(10.0))
            .positional_metric(PositionalMetricType.iou(0.3))
            .visual_minimal_track_length(1)
            .visual_max_observations(5)
            .visual_min_votes(1)
        )
        o.visual_minimal_own_area_percentage_use(0.6)
        o.visual_minimal_own_area_percentage_collect(0.6)
        o.own_area_backend(backend)
        return o

    rng = np.random.default_rng(5)
    frames = []
    xy = rng.uniform(0, 80, (6, 2))
    for _ in range(8):
        xy = xy + rng.uniform(-2, 2, xy.shape)
        s = VisualSortObservationSet()
        for i in range(6):
            f = np.zeros(8, np.float32)
            f[i] = 1.0
            s.add(
                VisualSortObservation(
                    f, 0.9,
                    BoundingBox(xy[i, 0], xy[i, 1], 10.0, 20.0).as_xyaah(),
                    i,
                )
            )
        frames.append(s)

    td = VisualSort(1, opts("device"))
    th = VisualSort(1, opts("host"))
    for s in frames:
        # re-build observation sets per tracker (they are consumed)
        sd = VisualSortObservationSet()
        sh = VisualSortObservationSet()
        for o in s.observations:
            sd.add(VisualSortObservation(
                o.feature, o.feature_quality, o.bounding_box, o.custom_object_id
            ))
            sh.add(VisualSortObservation(
                o.feature, o.feature_quality, o.bounding_box, o.custom_object_id
            ))
        vd = td.predict(sd)
        vh = th.predict(sh)
        assert [t.id for t in vd] == [t.id for t in vh]
        assert [t.voting_type for t in vd] == [t.voting_type for t in vh]
        assert [t.length for t in vd] == [t.length for t in vh]
