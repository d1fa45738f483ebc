"""Public Kalman wrapper API tests (parity with reference pyo3 demos)."""

import numpy as np
import pytest

from similari_tpu import (
    BoundingBox,
    Point2DKalmanFilter,
    Universal2DBox,
    Universal2DBoxKalmanFilter,
    Vec2DKalmanFilter,
    cosine,
    euclidean,
)


def test_box_filter_roundtrip():
    f = Universal2DBoxKalmanFilter()
    bbox = BoundingBox(1.0, 2.0, 5.0, 5.0)
    state = f.initiate(bbox.as_xyaah())
    assert state.bbox() == bbox


def test_box_filter_step_golden():
    f = Universal2DBoxKalmanFilter()
    state = f.initiate(BoundingBox(-10.0, 2.0, 2.0, 5.0).as_xyaah())
    state = f.predict(state)
    assert state.universal_bbox() == Universal2DBox(-9.0, 4.5, None, 0.4, 5.0)
    state = f.update(state, Universal2DBox(8.75, 52.35, None, 0.150_849_15, 100.1))
    state = f.predict(state)
    est = Universal2DBox(10.070248, 55.90909, None, 0.3951147, 107.173546)
    assert state.universal_bbox() == est


def test_box_filter_cost():
    assert Universal2DBoxKalmanFilter.calculate_cost(5.0, False) == 5.0
    assert Universal2DBoxKalmanFilter.calculate_cost(50.0, False) == 100.0
    assert Universal2DBoxKalmanFilter.calculate_cost(5.0, True) == 95.0
    assert Universal2DBoxKalmanFilter.calculate_cost(50.0, True) == 0.0


def test_point_filter():
    f = Point2DKalmanFilter()
    s = f.initiate(1.0, 2.0)
    s = f.predict(s)
    assert s.x() == pytest.approx(1.0)
    assert s.y() == pytest.approx(2.0)
    s = f.update(s, 1.5, 2.5)
    assert 1.0 < s.x() < 1.5
    assert f.distance(s, 1.5, 2.5) >= 0.0


def test_vec_filter():
    f = Vec2DKalmanFilter()
    states = f.initiate([(0.0, 0.0), (5.0, 5.0)])
    states = f.predict(states)
    states = f.update(states, [(0.1, 0.1), (5.1, 5.1)])
    assert len(states) == 2
    assert states[1].x() > 5.0
    dists = f.distance(states, [(0.1, 0.1), (5.1, 5.1)])
    costs = Vec2DKalmanFilter.calculate_cost(dists, False)
    assert len(costs) == 2


def test_distance_functions():
    assert euclidean([1, 0, 0], [0, 1, 0]) == pytest.approx(np.sqrt(2), abs=1e-5)
    assert euclidean([1, 0, 0], [1, 0, 0]) == pytest.approx(0.0, abs=1e-6)
    assert cosine([1, 0, 0], [1, 0, 0]) == pytest.approx(1.0, abs=1e-5)
    assert cosine([1, 0, 0], [-1, 0, 0]) == pytest.approx(-1.0, abs=1e-5)
    assert cosine([1, 0, 0], [0, 1, 0]) == pytest.approx(0.0, abs=1e-6)


def test_filter_sequence_matches_per_call_api():
    """Bulk `filter_sequence` (native kf_box_sequence) must reproduce the
    per-call initiate/predict/update loop exactly."""
    import numpy as np

    from similari_tpu.utils.bbox import Universal2DBox
    from similari_tpu.utils.kalman import Universal2DBoxKalmanFilter

    rng = np.random.default_rng(9)
    n = 200
    z = np.zeros((n, 5), np.float32)
    z[:, 0] = np.cumsum(rng.normal(size=n)).astype(np.float32)
    z[:, 1] = np.cumsum(rng.normal(size=n)).astype(np.float32)
    z[:, 3] = 2.0
    z[:, 4] = 5.0 + rng.uniform(0, 1, n).astype(np.float32)

    kf = Universal2DBoxKalmanFilter()
    st = kf.initiate(Universal2DBox.from_vec5(z[0]))
    want = [np.asarray(st._state.mean_pos, np.float32).copy()]
    for i in range(1, n):
        st = kf.update(kf.predict(st), Universal2DBox.from_vec5(z[i]))
        want.append(np.asarray(st._state.mean_pos, np.float32).copy())
    got = kf.filter_sequence(z)
    np.testing.assert_allclose(got, np.stack(want), rtol=1e-5, atol=1e-5)


def test_point_filter_sequence_matches_per_call_api():
    """Bulk point `filter_sequence` (native kf_point_sequence) must
    reproduce the per-call initiate/predict/update loop exactly."""
    import numpy as np

    from similari_tpu.utils.kalman import Point2DKalmanFilter

    rng = np.random.default_rng(10)
    n = 200
    z = np.cumsum(rng.normal(size=(n, 2)), axis=0).astype(np.float32)

    kf = Point2DKalmanFilter()
    st = kf.initiate(float(z[0, 0]), float(z[0, 1]))
    want = [np.asarray(st._state.mean_pos, np.float32).copy()]
    for i in range(1, n):
        st = kf.update(kf.predict(st), float(z[i, 0]), float(z[i, 1]))
        want.append(np.asarray(st._state.mean_pos, np.float32).copy())
    got = kf.filter_sequence(z)
    assert got.shape == (n, 2)
    np.testing.assert_allclose(got, np.stack(want), rtol=1e-5, atol=1e-5)
    assert kf.filter_sequence(np.zeros((0, 2), np.float32)).shape == (0, 2)


def test_vec2d_filter_sequence_matches_point_chains():
    """Vec2D bulk smoothing == per-chain point smoothing, chain by chain
    (the keypoint chains are independent by `kalman_2d_point_vec.rs:5-77`
    semantics)."""
    import numpy as np

    from similari_tpu.utils.kalman import (
        Point2DKalmanFilter, Vec2DKalmanFilter,
    )

    rng = np.random.default_rng(11)
    n, p = 60, 7
    z = np.cumsum(rng.normal(size=(n, p, 2)), axis=0).astype(np.float32)
    got = Vec2DKalmanFilter().filter_sequence(z)
    assert got.shape == (n, p, 2)
    pkf = Point2DKalmanFilter()
    for c in range(p):
        np.testing.assert_allclose(
            got[:, c], pkf.filter_sequence(z[:, c]), rtol=1e-6, atol=1e-6)
