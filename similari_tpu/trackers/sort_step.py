"""The jitted SORT prediction step — one pure function per tracker config.

Replaces the reference's per-epoch pipeline of candidate-track objects, shard
executors, and a voting loop (`/root/reference/src/trackers/sort/simple_api.rs:110-196`)
with a single fused device program:

    (state, padded detections, epoch) -> (state', per-detection outputs)

Semantics parity notes (all verified against the reference sources):

* Candidate tracks in the reference run initiate->predict->update on their own
  Kalman filter (`sort/metric.rs:79-105` -> `kalman_prediction.rs:13-32`),
  which leaves the mean exactly at the detection box (zero innovation), so the
  distance matrix compares *detection boxes* against *track predicted boxes*
  and Mahalanobis uses the track's stored post-update state — exactly what we
  compute here without materializing candidate objects.

* On merge, `SortMetric::optimize` runs predict->update of the track state
  with the candidate's stored box (== detection box) and bumps histories; a
  lost candidate becomes a new track whose state is the candidate state.  Both
  cases are the same computation given `prev = matched ? track_state :
  initiate(z)`, which lets us scatter one masked batched KF update.

* Voting is the augmented-matrix assignment of `SortVoting`
  (`sort/voting.rs:27-100`): D x (D+T) weights, diagonal = new-track
  threshold; matched pairs always carry weight >= threshold in an optimal
  solution, which we also enforce explicitly to absorb auction epsilon-slop.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import assignment as asg
from ..ops import geometry as geo
from ..ops import kalman as kal
from ..ops import merge as mrg
from .constraints import allowed_distance_for_delta
from .state import SortState

MAHALANOBIS_NEW_TRACK_THRESHOLD = 1.0  # `src/trackers/sort.rs:379`
DEFAULT_SORT_IOU_THRESHOLD = 0.3  # `src/trackers/sort.rs:31`
DEFAULT_MINIMAL_SORT_CONFIDENCE = 0.05  # `sort/metric.rs:11`


@dataclasses.dataclass(frozen=True)
class SortConfig:
    """Static (hashable) tracker configuration; one compiled step per config."""

    method: str = "maha"  # "iou" | "maha"
    iou_threshold: float = DEFAULT_SORT_IOU_THRESHOLD
    min_confidence: float = DEFAULT_MINIMAL_SORT_CONFIDENCE
    max_idle_epochs: int = 5
    constraints: Tuple[Tuple[int, float], ...] = ()
    position_weight: float = kal.DEFAULT_POSITION_WEIGHT
    velocity_weight: float = kal.DEFAULT_VELOCITY_WEIGHT
    assignment: str = "auto"  # "hungarian" (host exact) | "auction" (device)
    # static oriented-box flag: False uses the exact axis-aligned IoU kernel
    # (~10 ops/pair) instead of the general Sutherland-Hodgman clip
    # (~700 ops/pair); the Sort API flips it automatically when a rotated
    # box is first seen in a scene.
    oriented: bool = True
    # oriented-IoU neighbor prune (geometry._universal_iou_matrix_topk):
    # clip only each detection's k nearest in-radius partners.  MEASURED
    # NEGATIVE on v5e at 500x2000 (1365 vs 2351 FPS): the [D,K,T] one-hot
    # select/scatter moves more HBM than the ~0.26 ms dense clip it avoids,
    # so the default stays 0 (dense).  Kept for the record + small-K
    # experiments; see ARCHITECTURE.md §4d.
    oriented_neighbors: int = 0
    # in-step waste (`epoch_db.rs:51-65` semantics): retire tracks idle past
    # max_idle_epochs at the top of every step so slots are recycled and the
    # static capacity bounds *live* tracks, not cumulative tracks ever
    # created.  Off by default for the host engines (which run auto_waste
    # themselves and must read wasted snapshots); on for scan pipelines.
    recycle_idle: bool = False
    # oriented block-skip matching (round-4): x-sort per-step views of both
    # axes and compute the rotated IoU with the Pallas `too_far`-block-skip
    # kernel (ops/pallas_clip.py) — in-radius pairs concentrate near the
    # diagonal so most 128x128 tiles skip the ~700-flop clip.  "auto" uses
    # it on real TPUs when oriented & method=iou & shapes clear the gate
    # (on CPU the kernel would run in slow interpret mode, so auto keeps
    # the dense XLA path there); True forces it (tests), False disables
    # (the vmapped batch engines — Mosaic's grid serializes per scene).
    oriented_block_sort: object = "auto"  # "auto" | True | False

    @property
    def new_track_threshold(self) -> float:
        return (
            self.iou_threshold
            if self.method == "iou"
            else MAHALANOBIS_NEW_TRACK_THRESHOLD
        )

    @property
    def kalman_spec(self) -> kal.KalmanSpec:
        return kal.KalmanSpec(self.position_weight, self.velocity_weight, "box")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepOutput:
    slot: jax.Array  # [D] int32 store slot per detection
    track_id: jax.Array  # [D] int32
    is_new: jax.Array  # [D] bool (new track vs merged)
    pred_box: jax.Array  # [D, 5]
    length: jax.Array  # [D] int32
    overflow: jax.Array  # [] bool — ran out of free slots (host must grow+retry)


def distance_weights(
    cfg: SortConfig, state: SortState, det_box: jax.Array, det_conf: jax.Array,
    epoch: jax.Array,
) -> jax.Array:
    """The [D, T] voting weight matrix (0 = no edge).

    Fuses the `compatible` gate (`sort.rs:250-270`), `too_far` prune and the
    IoU/Mahalanobis metric (`sort/metric.rs:38-77`).
    """
    act = state.active
    delta = epoch - state.last_epoch  # [T]
    compat = act & (delta <= cfg.max_idle_epochs)
    if cfg.constraints:
        d2r = geo.dist_in_2r(det_box[:, None, :], state.pred_box[None, :, :])
        allowed = allowed_distance_for_delta(cfg.constraints, delta)
        compat = compat[None, :] & (d2r <= allowed[None, :])
    else:
        compat = jnp.broadcast_to(compat[None, :], (det_box.shape[0], act.shape[0]))

    conf = jnp.maximum(det_conf, cfg.min_confidence)  # [D]
    if cfg.method == "iou":
        nbrs = (
            cfg.oriented_neighbors
            if cfg.oriented and state.capacity >= 4 * cfg.oriented_neighbors
            else 0
        )
        iou, valid = geo.universal_iou_matrix(
            det_box, state.pred_box, cfg.oriented, neighbors=nbrs
        )
        m = iou * conf[:, None]
        valid = valid & (m >= cfg.iou_threshold)
        return jnp.where(compat & valid, m, 0.0)

    d2 = cfg.kalman_spec.distance_matrix(state.kf, det_box)  # [D, T]
    cost = kal.calculate_cost(d2, inverted=True)
    m = cost / conf[:, None]
    tf = geo.too_far(det_box[:, None, :], state.pred_box[None, :, :])
    return jnp.where(compat & ~tf, m, 0.0)


def _match_plain(cfg, state, det_box, det_conf, det_valid, epoch):
    d = det_box.shape[0]
    t = state.capacity
    W = distance_weights(cfg, state, det_box, det_conf, epoch)
    col = asg.solve_voting(
        W, cfg.new_track_threshold, det_valid, state.active,
        asg.resolve_backend(cfg.assignment),
    )  # [D]
    tgt = jnp.clip(col - d, 0, t - 1)
    pair_w = mrg.take_at(W, tgt)
    matched = det_valid & (col >= d) & (pair_w >= cfg.new_track_threshold)
    return matched, tgt


def _match_sorted(cfg, state, det_box, det_conf, det_valid, epoch):
    """Oriented-IoU matching on x-SORTED per-step views of both axes.

    Sorting (one multi-operand `lax.sort` per axis — no [T,T] permutation
    one-hots) concentrates not-`too_far` pairs into a diagonal band so the
    Pallas block-skip clip kernel (ops/pallas_clip.py) skips most tiles.
    The auction runs in sorted space; only its [D]-shaped outputs are
    mapped back (take_rows for the track axis, one `lax.sort` by original
    index for the detection axis), so no [D,T] tensor is ever unpermuted.
    Same LP as `_match_plain` up to near-tie resolution.
    """
    from ..ops.pallas_clip import oriented_iou_blockskip

    d = det_box.shape[0]
    t = state.capacity
    big = jnp.float32(3.0e38)
    # sorted track view (inactive slots sort last)
    idx_t = jnp.arange(t, dtype=jnp.int32)
    tkey = jnp.where(state.active, state.pred_box[:, 0], big)
    (_, px, py, pa, pas, ph, le_s, act_si, tperm) = jax.lax.sort(
        (tkey, state.pred_box[:, 0], state.pred_box[:, 1],
         state.pred_box[:, 2], state.pred_box[:, 3], state.pred_box[:, 4],
         state.last_epoch, state.active.astype(jnp.int32), idx_t),
        num_keys=1,
    )
    pred_s = jnp.stack([px, py, pa, pas, ph], axis=-1)
    act_s = act_si.astype(bool)
    # sorted detection view (padding rows sort last)
    idx_d = jnp.arange(d, dtype=jnp.int32)
    dkey = jnp.where(det_valid, det_box[:, 0], big)
    (_, bx, by, ba, bas, bh, conf_s, dval_si, dperm) = jax.lax.sort(
        (dkey, det_box[:, 0], det_box[:, 1], det_box[:, 2], det_box[:, 3],
         det_box[:, 4], det_conf, det_valid.astype(jnp.int32), idx_d),
        num_keys=1,
    )
    det_s = jnp.stack([bx, by, ba, bas, bh], axis=-1)
    dval_s = dval_si.astype(bool)

    delta = epoch - le_s
    compat = act_s & (delta <= cfg.max_idle_epochs)
    if cfg.constraints:
        d2r = geo.dist_in_2r(det_s[:, None, :], pred_s[None, :, :])
        allowed = allowed_distance_for_delta(cfg.constraints, delta)
        compat = compat[None, :] & (d2r <= allowed[None, :])
    else:
        compat = jnp.broadcast_to(compat[None, :], (d, t))
    conf = jnp.maximum(conf_s, cfg.min_confidence)
    iou, valid = oriented_iou_blockskip(
        det_s, pred_s, interpret=jax.default_backend() != "tpu")
    m = iou * conf[:, None]
    valid = valid & (m >= cfg.iou_threshold)
    W = jnp.where(compat & valid, m, 0.0)

    col = asg.solve_voting(
        W, cfg.new_track_threshold, dval_s, act_s,
        asg.resolve_backend(cfg.assignment),
    )
    tgt_s = jnp.clip(col - d, 0, t - 1)
    pair_w = mrg.take_at(W, tgt_s)
    matched_s = dval_s & (col >= d) & (pair_w >= cfg.new_track_threshold)
    tgt_orig = mrg.take_rows(tperm, tgt_s)  # original slot per sorted det
    # unsort the detection axis
    (_, matched_i, tgt_o) = jax.lax.sort(
        (dperm, matched_s.astype(jnp.int32), tgt_orig.astype(jnp.int32)),
        num_keys=1,
    )
    return matched_i.astype(bool), jnp.clip(tgt_o, 0, t - 1)


def sort_step(
    cfg: SortConfig,
    state: SortState,
    det_box: jax.Array,  # [D, 5]
    det_conf: jax.Array,  # [D]
    det_valid: jax.Array,  # [D] bool
    epoch: jax.Array,  # scalar int32
) -> Tuple[SortState, StepOutput]:
    d = det_box.shape[0]
    t = state.capacity
    spec = cfg.kalman_spec

    if cfg.recycle_idle:
        # retire idle-beyond-max tracks up front (they are already
        # incompatible, so matching is unchanged — only slot reuse differs)
        state = dataclasses.replace(
            state,
            active=state.active
            & (epoch - state.last_epoch <= cfg.max_idle_epochs),
        )

    block_sort = (
        cfg.oriented_block_sort is True
        or (cfg.oriented_block_sort == "auto"
            and jax.default_backend() == "tpu")
    )
    use_sorted = (
        cfg.method == "iou" and cfg.oriented and block_sort
        and t >= 512 and d >= 64
    )
    # NOTE: every by-slot read below is a one-hot contraction (mrg.take_*) —
    # vmapped dynamic gathers serialize on TPU (ARCHITECTURE.md §4c)
    if use_sorted:
        matched, tgt = _match_sorted(
            cfg, state, det_box, det_conf, det_valid, epoch)
    else:
        matched, tgt = _match_plain(
            cfg, state, det_box, det_conf, det_valid, epoch)

    # --- slot allocation for new tracks ---------------------------------
    is_new = det_valid & ~matched
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_new = jnp.sum(is_new.astype(jnp.int32))
    n_free = jnp.sum((~state.active).astype(jnp.int32))
    overflow = n_new > n_free
    new_slot = mrg.nth_free_slot(state.active, new_rank)
    slot = jnp.where(matched, tgt, new_slot)
    safe = det_valid & ~overflow

    # --- one masked batched Kalman step for matched + new ----------------
    kf_at_slot = mrg.take_tree(state.kf, slot)
    prev = jax.tree.map(
        lambda tr, init: jnp.where(matched[:, None], tr, init),
        kf_at_slot,
        spec.initiate(det_box),
    )
    st = spec.update(spec.predict(prev), det_box)
    pred_box = st.mean_pos  # [D, 5]

    new_length = jnp.where(matched, mrg.take_rows(state.length, slot) + 1, 1)
    new_ids = jnp.where(
        matched,
        mrg.take_rows(state.track_id, slot),
        state.next_id + new_rank + 1,
    ).astype(jnp.int32)

    # --- scatter-free state merge (see ops/merge.py) ----------------------
    hit = mrg.writer_hit(slot, safe, t)
    written = jnp.any(hit, axis=1)
    h = state.history
    hix = (new_length - 1) % h
    new_state = SortState(
        kf=mrg.merge_tree(state.kf, st, hit),
        pred_box=mrg.merge_rows(state.pred_box, pred_box, hit),
        obs_box=mrg.merge_rows(state.obs_box, det_box, hit),
        conf=mrg.merge_rows(state.conf, det_conf, hit),
        active=state.active | written,
        last_epoch=jnp.where(written, epoch, state.last_epoch),
        length=mrg.merge_rows(state.length, new_length, hit),
        track_id=mrg.merge_rows(state.track_id, new_ids, hit),
        hist_obs=mrg.merge_ring(state.hist_obs, det_box, hix, hit),
        hist_pred=mrg.merge_ring(state.hist_pred, pred_box, hix, hit),
        hist_conf=mrg.merge_ring(state.hist_conf, det_conf, hix, hit),
        next_id=(state.next_id + n_new).astype(jnp.int32),
    )
    out = StepOutput(
        slot=slot.astype(jnp.int32),
        track_id=new_ids,
        is_new=is_new,
        pred_box=pred_box,
        length=new_length.astype(jnp.int32),
        overflow=overflow,
    )
    return new_state, out


@lru_cache(maxsize=None)
def compiled_sort_step(cfg: SortConfig):
    """One jitted step per config; shapes specialize on first call."""
    return jax.jit(partial(sort_step, cfg), donate_argnums=(0,))


def sort_scan(
    cfg: SortConfig,
    state: SortState,
    det_box: jax.Array,  # [S, D, 5] frame-major detection stream
    det_conf: jax.Array,  # [S, D]
    det_valid: jax.Array,  # [S, D]
    epoch0: jax.Array,  # scalar int32 (first epoch, consecutive frames) OR
    #                     int32[S] per-frame epochs (gaps advance the clock)
) -> Tuple[SortState, StepOutput]:
    """Device-resident tracking pipeline: scan the step over S frames.

    One h2d for the whole stream, one d2h for all outputs — this is how a
    production deployment runs (detections arrive from an on-device detector),
    and how throughput benchmarks are measured.  Outputs are stacked [S, D].

    Passing per-frame epochs (e.g. the MOT frame numbers) makes empty-frame
    gaps age tracks exactly like stepping every frame would
    (`epoch_db.rs:51-65` idle semantics depend on epoch deltas).
    """

    def body(st, inp):
        box, conf, valid, e = inp
        st, out = sort_step(cfg, st, box, conf, valid, e)
        return st, out

    steps = det_box.shape[0]
    idx = jnp.arange(steps, dtype=jnp.int32)
    epochs = epoch0 + idx if jnp.ndim(epoch0) == 0 else epoch0
    return jax.lax.scan(body, state, (det_box, det_conf, det_valid, epochs))


@lru_cache(maxsize=None)
def compiled_sort_scan(cfg: SortConfig):
    return jax.jit(partial(sort_scan, cfg), donate_argnums=(0,))
