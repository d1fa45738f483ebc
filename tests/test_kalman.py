"""Kalman filter parity tests.

Goldens come from the reference unit tests
(`/root/reference/src/utils/kalman/kalman_2d_box.rs:187-249`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from similari_tpu.ops import kalman as K
from similari_tpu.utils.bbox import BoundingBox, Universal2DBox

SPEC = K.KalmanSpec()


def as_z(b: Universal2DBox):
    return jnp.asarray(b.to_vec5())


def state_box(s: K.KalmanState, idx=None):
    mean = np.asarray(s.mean_pos)
    if idx is not None:
        mean = mean[idx]
    return Universal2DBox.from_vec5(mean)


def test_constructor_roundtrip():
    bbox = BoundingBox(1.0, 2.0, 5.0, 5.0)
    s = SPEC.initiate(as_z(bbox.as_xyaah()))
    assert state_box(s).as_ltwh() == bbox


def test_step_golden():
    bbox = BoundingBox(-10.0, 2.0, 2.0, 5.0)
    s = SPEC.initiate(as_z(bbox.as_xyaah()))
    s = SPEC.predict(s)
    assert state_box(s) == Universal2DBox(-9.0, 4.5, None, 0.4, 5.0)

    meas = Universal2DBox(8.75, 52.35, None, 0.150_849_15, 100.1)
    s = SPEC.update(s, as_z(meas))
    s = SPEC.predict(s)
    est = Universal2DBox(10.070248, 55.90909, None, 0.3951147, 107.173546)
    got = state_box(s)
    np.testing.assert_allclose(
        [got.xc, got.yc, got.aspect, got.height],
        [est.xc, est.yc, est.aspect, est.height],
        rtol=2e-5,
    )


def test_gating_distance():
    f = SPEC
    s = f.initiate(as_z(BoundingBox(-10.0, 2.0, 2.0, 5.0).as_xyaah()))
    s = f.predict(s)
    s = f.update(s, as_z(BoundingBox(-9.5, 2.1, 2.0, 5.0).as_xyaah()))
    s = f.predict(s)

    d1 = float(f.distance(s, as_z(BoundingBox(-9.0, 2.2, 2.0, 5.0).as_xyaah())))
    c1 = float(K.calculate_cost(jnp.asarray(d1), False))
    assert 0.0 <= c1 < K.CHI2INV95[4]

    d2 = float(f.distance(s, as_z(BoundingBox(-5.0, 1.5, 2.2, 5.0).as_xyaah())))
    c2 = float(K.calculate_cost(jnp.asarray(d2), False))
    assert c2 > K.CHI2INV95[4]  # clipped to CHI2_UPPER_BOUND
    assert c2 == K.CHI2_UPPER_BOUND


def test_dense_matches_blocks():
    """The decomposed 2x2 form must equal the dense 10x10 reference recurrences."""
    rng = np.random.default_rng(0)
    z0 = np.abs(rng.normal(size=5)).astype(np.float32) + 1.0
    z1 = z0 + rng.normal(size=5).astype(np.float32) * 0.1

    # dense reference implementation (numpy, mirrors kalman_2d_box.rs math)
    pw, vw = K.DEFAULT_POSITION_WEIGHT, K.DEFAULT_VELOCITY_WEIGHT
    F = np.eye(10, dtype=np.float32)
    for i in range(5):
        F[i, 5 + i] = 1.0
    H = np.eye(5, 10, dtype=np.float32)

    def stds(k, cnst, p, w):
        s = k * w * p
        return np.array([s, s, s, cnst, s], np.float32)

    mean = np.concatenate([z0, np.zeros(5, np.float32)])
    std = np.concatenate([stds(2, 1e-2, z0[4], pw), stds(10, 1e-5, z0[4], vw)])
    cov = np.diag(std * std)

    # predict
    q = np.concatenate([stds(1, 1e-2, mean[4], pw), stds(1, 1e-5, mean[4], vw)])
    cov = F @ cov @ F.T + np.diag(q * q)
    mean = F @ mean
    # update
    r = stds(1, 1e-1, mean[4], pw)
    S = H @ cov @ H.T + np.diag(r * r)
    b = (cov @ H.T).T
    gain = np.linalg.solve(np.tril(S), b)
    innov = (z1 - H @ mean)[None, :]
    mean = mean + (innov @ gain)[0]
    cov = cov - gain.T @ S @ gain

    s = SPEC.update(SPEC.predict(SPEC.initiate(jnp.asarray(z0))), jnp.asarray(z1))
    np.testing.assert_allclose(np.asarray(s.mean()), mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.dense_covariance()), cov, rtol=1e-4, atol=1e-6
    )


def test_candidate_state_mean_equals_observation():
    """initiate->predict->update(z) leaves the mean at z (zero innovation)."""
    z = jnp.asarray([[10.0, 20.0, 0.0, 0.5, 8.0], [1.0, 2.0, 0.3, 1.0, 3.0]])
    s = K.make_candidate_states(SPEC, z)
    np.testing.assert_allclose(np.asarray(s.mean_pos), np.asarray(z), rtol=1e-6)


def test_point_filter_basic():
    spec = K.KalmanSpec(kind="point")
    z = jnp.asarray([1.0, 2.0])
    s = spec.initiate(z)
    s = spec.predict(s)
    np.testing.assert_allclose(np.asarray(s.mean_pos), [1.0, 2.0], atol=1e-6)
    s = spec.update(s, jnp.asarray([1.5, 2.5]))
    m = np.asarray(s.mean_pos)
    assert 1.0 < m[0] < 1.5 and 2.0 < m[1] < 2.5
    d = float(spec.distance(s, jnp.asarray([1.5, 2.5])))
    assert d >= 0.0


def test_batched_matches_single():
    rng = np.random.default_rng(1)
    zs = np.abs(rng.normal(size=(7, 5)).astype(np.float32)) + 1.0
    batched = K.make_candidate_states(SPEC, jnp.asarray(zs))
    for i in range(7):
        single = K.make_candidate_states(SPEC, jnp.asarray(zs[i]))
        np.testing.assert_allclose(
            np.asarray(batched.cpp)[i], np.asarray(single.cpp), rtol=1e-6
        )
