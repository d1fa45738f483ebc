"""SoA track-store state for the SORT-family trackers.

The reference keeps per-track Rust objects in sharded HashMaps
(`/root/reference/src/track/store.rs:113-129`); the TPU-native design is a
fixed-capacity struct-of-arrays pytree per scene: one jitted step consumes the
whole store, so there is no per-track control flow, locking, or hashing in the
hot path.  Slots are recycled via an `active` mask; histories live in on-device
ring buffers so the step never syncs with the host.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.kalman import KalmanState, empty_state


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SortState:
    """Per-scene track store: capacity T, history depth H.

    Mirrors `SortAttributes` fields (`src/trackers/sort.rs:91-109`) as columns.
    """

    kf: KalmanState  # [T, 5] components
    pred_box: jax.Array  # [T, 5] last KF-predicted box (xc,yc,angle,aspect,height)
    obs_box: jax.Array  # [T, 5] last observed box
    conf: jax.Array  # [T] confidence of the last observation
    active: jax.Array  # [T] bool
    last_epoch: jax.Array  # [T] int32
    length: jax.Array  # [T] int32 track_length
    track_id: jax.Array  # [T] int32 (sequential from 1)
    hist_obs: jax.Array  # [T, H, 5] ring buffer of observed boxes
    hist_pred: jax.Array  # [T, H, 5] ring buffer of predicted boxes
    hist_conf: jax.Array  # [T, H]
    next_id: jax.Array  # scalar int32: number of ids issued so far

    @property
    def capacity(self) -> int:
        return self.active.shape[0]

    @property
    def history(self) -> int:
        return self.hist_obs.shape[1]


def new_sort_state(capacity: int, history: int, next_id: int = 0) -> SortState:
    f = jnp.zeros
    return SortState(
        kf=empty_state(capacity, 5),
        pred_box=f((capacity, 5), jnp.float32),
        obs_box=f((capacity, 5), jnp.float32),
        conf=f((capacity,), jnp.float32),
        active=f((capacity,), bool),
        last_epoch=f((capacity,), jnp.int32),
        length=f((capacity,), jnp.int32),
        track_id=f((capacity,), jnp.int32),
        hist_obs=f((capacity, history, 5), jnp.float32),
        hist_pred=f((capacity, history, 5), jnp.float32),
        hist_conf=f((capacity, history), jnp.float32),
        next_id=jnp.int32(next_id),
    )


def grow_state(state: SortState, new_capacity: int) -> SortState:
    """Double-and-copy when the active count approaches capacity."""
    t = state.capacity
    assert new_capacity > t

    def pad(a):
        if a.ndim == 0:
            return a
        pads = [(0, new_capacity - t)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pads)

    return jax.tree.map(pad, state)
