"""SpatioTemporalConstraints — epoch-delta vs distance gating.

Parity with `/root/reference/src/trackers/spatio_temporal_constraints.rs:14-59`:
a sorted list of (epoch_delta, max_dist_in_2r); validation picks the first
constraint with delta >= epoch_delta; empty list always validates.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


class SpatioTemporalConstraints:
    def __init__(self):
        self._constraints: list[Tuple[int, float]] = []

    def constraints(self, constraints: Sequence[Tuple[int, float]]):
        self.add_constraints(list(constraints))
        return self

    def add_constraints(self, constraints: Sequence[Tuple[int, float]]):
        for delta, max_distance in constraints:
            assert max_distance > 0.0, "The distance is expected to be a positive float"
            self._constraints.append((int(delta), float(max_distance)))
        self._constraints.sort(key=lambda e: e[0])
        # dedup_by keeps the *first* of each equal-delta run (Vec::dedup_by)
        dedup: list[Tuple[int, float]] = []
        for d, m in self._constraints:
            if dedup and dedup[-1][0] == d:
                continue
            dedup.append((d, m))
        self._constraints = dedup

    def validate(self, epoch_delta: int, dist: float) -> bool:
        assert dist >= 0.0, "The distance is expected to be a positive float"
        for d, max_dist in self._constraints:
            if d >= epoch_delta:
                return dist <= max_dist
        return True

    def as_tuple(self) -> Tuple[Tuple[int, float], ...]:
        return tuple(self._constraints)

    def __repr__(self):
        return f"SpatioTemporalConstraints({self._constraints})"


def allowed_distance_for_delta(
    constraints: Tuple[Tuple[int, float], ...], delta: jnp.ndarray
) -> jnp.ndarray:
    """Vectorized `validate` bound: max allowed dist per epoch-delta array.

    Returns +inf where no constraint applies (always valid).
    """
    allowed = jnp.full(delta.shape, jnp.inf, jnp.float32)
    # iterate descending so the smallest applicable delta wins (first match)
    for d, max_dist in sorted(constraints, reverse=True):
        allowed = jnp.where(delta <= d, max_dist, allowed)
    return allowed
