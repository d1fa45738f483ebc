"""Native C++ LAP solver: builds, matches scipy exactly, batch path works."""

import numpy as np
import pytest

from similari_tpu import native
from scipy.optimize import linear_sum_assignment


def total(W, cols):
    return float(W[np.arange(W.shape[0]), cols].sum())


def test_native_builds():
    assert native.available(), "C++ toolchain present but native build failed"


@pytest.mark.parametrize("seed", range(6))
def test_lap_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    r = int(rng.integers(1, 40))
    c = r + int(rng.integers(0, 40))
    W = rng.uniform(-5, 100, size=(r, c)).astype(np.float32)
    cols = native.lap_max(W)
    assert len(set(cols.tolist())) == r
    rr, cc = linear_sum_assignment(W, maximize=True)
    assert total(W, cols) == pytest.approx(total(W, np.asarray(
        [cc[list(rr).index(i)] for i in range(r)])), abs=1e-3)


def test_lap_batch():
    rng = np.random.default_rng(0)
    W = rng.uniform(0, 10, size=(16, 20, 35)).astype(np.float32)
    cols = native.lap_max_batch(W)
    for b in range(16):
        rr, cc = linear_sum_assignment(W[b], maximize=True)
        assert total(W[b], cols[b]) == pytest.approx(float(W[b][rr, cc].sum()), abs=1e-3)


def test_lap_rectangular_tracking_shape():
    """Augmented tracking matrix: diagonal threshold + sparse matches."""
    metric = np.zeros((4, 6), np.float32)
    metric[0, 2] = 0.9
    metric[1, 2] = 0.8  # contested
    metric[2, 5] = 0.5
    d = 4
    W = np.zeros((d, d + 6), np.float32)
    np.fill_diagonal(W[:, :d], 0.3)
    W[:, d:] = metric
    cols = native.lap_max(W)
    assert cols[0] == d + 2  # winner of the contested track
    assert cols[1] == 1  # loser goes to its diagonal
    assert cols[2] == d + 5
    assert cols[3] == 3
