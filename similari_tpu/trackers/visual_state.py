"""SoA state for the VisualSORT (DeepSORT-like) tracker.

Extends the SORT columns with a fixed-K ReID feature gallery per track,
replacing the reference's per-track observation Vec with quality-sorted
eviction (`/root/reference/src/trackers/visual_sort/metric.rs:129-154,297-374`).
Physical slot order is irrelevant here: the reference's "newest obs in slot 0 /
quality-sorted rest" layout only encodes *which feature set is live* and which
observation carries the bbox — we keep the live set as a (feats, quality,
valid) mask and the bbox columns separately, which preserves the voting and
eviction semantics exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.kalman import KalmanState, empty_state


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VisualState:
    # --- SORT columns (see state.SortState) ---
    kf: KalmanState
    pred_box: jax.Array  # [T, 5]
    obs_box: jax.Array  # [T, 5]
    conf: jax.Array  # [T]
    active: jax.Array  # [T] bool
    last_epoch: jax.Array  # [T] int32
    length: jax.Array  # [T] int32
    track_id: jax.Array  # [T] int32
    hist_obs: jax.Array  # [T, H, 5]
    hist_pred: jax.Array  # [T, H, 5]
    hist_conf: jax.Array  # [T, H]
    next_id: jax.Array  # scalar int32
    # --- visual columns ---
    feats: jax.Array  # [T, K, F] gallery features
    feat_quality: jax.Array  # [T, K]
    feat_valid: jax.Array  # [T, K] bool
    collected: jax.Array  # [T] int32 == visual_features_collected_count
    voting_type: jax.Array  # [T] int32 (0=Visual, 1=Positional; -1=None)
    hist_feat: jax.Array  # [T, H, F] feature history (wasted export)
    hist_feat_valid: jax.Array  # [T, H] bool

    @property
    def capacity(self) -> int:
        return self.active.shape[0]

    @property
    def history(self) -> int:
        return self.hist_obs.shape[1]

    @property
    def gallery_size(self) -> int:
        return self.feats.shape[1]

    @property
    def feature_dim(self) -> int:
        return self.feats.shape[2]


def new_visual_state(
    capacity: int,
    history: int,
    gallery: int,
    feature_dim: int,
    feature_dtype=jnp.float32,
) -> VisualState:
    """feature_dtype: storage dtype of the gallery/feature-history tensors.

    bf16 halves the state-merge HBM traffic (the dominant step cost at
    512-d features) and is exactly what the bf16 distance matmul already
    consumes; norms/accumulation stay f32.  Default f32 for strict parity.
    """
    f = jnp.zeros
    return VisualState(
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
        next_id=jnp.int32(0),
        feats=f((capacity, gallery, feature_dim), feature_dtype),
        feat_quality=f((capacity, gallery), jnp.float32),
        feat_valid=f((capacity, gallery), bool),
        collected=f((capacity,), jnp.int32),
        voting_type=jnp.full((capacity,), -1, jnp.int32),
        hist_feat=f((capacity, history, feature_dim), feature_dtype),
        hist_feat_valid=f((capacity, history), bool),
    )


def grow_visual_state(state: VisualState, new_capacity: int) -> VisualState:
    t = state.capacity
    assert new_capacity > t

    def pad(a):
        if a.ndim == 0:
            return a
        pads = [(0, new_capacity - t)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pads)

    out = jax.tree.map(pad, state)
    # keep voting_type's "unset" sentinel in padded rows
    return dataclasses.replace(
        out, voting_type=out.voting_type.at[t:].set(-1)
    )
