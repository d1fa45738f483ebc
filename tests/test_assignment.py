"""Assignment solver tests: auction vs exact Hungarian, SORT voting golden."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from similari_tpu.ops import assignment as A


def total_weight(W, cols):
    return float(sum(W[i, c] for i, c in enumerate(cols)))


@pytest.mark.parametrize("seed", range(8))
def test_auction_matches_optimal_small(seed):
    rng = np.random.default_rng(seed)
    d = int(rng.integers(2, 7))
    n = d + int(rng.integers(0, 5))
    W = rng.uniform(0, 1, size=(d, n)).astype(np.float32)
    cols = np.asarray(A.auction_lap(jnp.asarray(W)))
    assert len(set(cols.tolist())) == d  # a matching
    # brute force optimum
    best = max(
        total_weight(W, perm) for perm in itertools.permutations(range(n), d)
    )
    assert total_weight(W, cols) >= best - 1e-4


@pytest.mark.parametrize("seed", range(4))
def test_auction_matches_scipy_large(seed):
    rng = np.random.default_rng(100 + seed)
    d, n = 60, 110
    W = rng.uniform(0, 100, size=(d, n)).astype(np.float32)
    cols = np.asarray(A.auction_lap(jnp.asarray(W)))
    assert len(set(cols.tolist())) == d
    ref = A._hungarian_np(W)
    assert total_weight(W, cols) >= total_weight(W, ref) - 1e-2


def test_hungarian_host_backend():
    W = np.array([[1.0, 5.0, 0.0], [2.0, 4.0, 0.0]], np.float32)
    cols = np.asarray(A.hungarian_host(jnp.asarray(W)))
    assert total_weight(W, cols) == 7.0


def test_sort_voting_golden():
    """Reference `SortVoting` test (`sort/voting.rs:110-174`).

    Candidates (10, 11, 12) x tracks (20, 25, 30), threshold 0.3.
    Expected: 10->20, 11->25, 12->self (new track).
    """
    metric = np.array(
        [
            [0.6, 0.4, 0.4],
            [0.5, 0.69, 0.4],
            [0.2, 0.27, 0.28],
        ],
        np.float32,
    )
    W = A.augment_with_threshold(
        jnp.asarray(metric),
        0.3,
        jnp.ones(3, bool),
        jnp.ones(3, bool),
    )
    for backend in ("auction", "hungarian"):
        cols = np.asarray(A.solve_lap(W, backend))
        assert cols[0] == 3 + 0  # candidate 10 -> track 20
        assert cols[1] == 3 + 1  # candidate 11 -> track 25
        assert cols[2] == 2  # candidate 12 -> its own diagonal = new track


def test_padding_rows_stick_to_diagonal():
    metric = np.zeros((4, 2), np.float32)
    metric[0, 0] = 0.9
    row_valid = np.array([True, True, False, False])
    col_valid = np.array([True, True])
    W = A.augment_with_threshold(
        jnp.asarray(metric), 0.3, jnp.asarray(row_valid), jnp.asarray(col_valid)
    )
    cols = np.asarray(A.auction_lap(W))
    assert cols[0] == 4  # matched to track 0
    assert cols[2] == 2 and cols[3] == 3  # padding rows on their diagonals


def test_below_threshold_prefers_new_track():
    metric = np.array([[0.2]], np.float32)  # below threshold 0.3
    W = A.augment_with_threshold(
        jnp.asarray(metric), 0.3, jnp.ones(1, bool), jnp.ones(1, bool)
    )
    cols = np.asarray(A.auction_lap(W))
    assert cols[0] == 0  # diagonal: new track
