"""The jitted VisualSORT step — ReID gallery matching + positional fallback.

One fused device program per predict, replacing the reference pipeline
(`/root/reference/src/trackers/visual_sort/simple_api.rs:99-230`):

1. metric: positional part vs the track's newest box + gallery feature
   distances gated by quality/own-area/area and track maturity
   (`visual_sort/metric.rs:156-295`);
2. cascade voting (`visual_sort/voting.rs:45-101`): greedy best-fit on
   feature votes (BestFitVoting, `voting/best.rs:52-128`), then Hungarian on
   the positional remainder;
3. masked state update: batched KF step, gallery insert with quality-sorted
   eviction and collect gates (`visual_sort/metric.rs:297-374`).

The greedy best-fit claim is computed in closed form: track t is claimed by
its globally heaviest (candidate, t) pair, so candidate d wins its best track
t1 iff argmax_d' weight[d', t1] == d; otherwise d becomes a new track and is
excluded from the positional stage (matching the reference's winner=self
behavior, `voting/best.rs:110-120`).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import assignment as asg
from ..ops import distances as dst
from ..ops import geometry as geo
from ..ops import kalman as kal
from ..ops import merge as mrg
from ..ops import ownarea as owna
from .constraints import allowed_distance_for_delta
from .sort_step import MAHALANOBIS_NEW_TRACK_THRESHOLD
from .visual_state import VisualState

VT_VISUAL = 0
VT_POSITIONAL = 1
_NEG = -1e30


@dataclasses.dataclass(frozen=True)
class VisualConfig:
    """Static VisualSORT configuration (defaults per `metric/builder.rs:26-42`
    and `options.rs:194-205`)."""

    positional_kind: str = "iou"  # "iou" | "maha"
    iou_threshold: float = 0.3
    positional_min_confidence: float = 0.1
    visual_kind: str = "euclidean"  # "euclidean" | "cosine"
    visual_threshold: float = 3.4e38  # f32::MAX default for euclidean
    visual_minimal_track_length: int = 3
    visual_minimal_area: float = 0.0
    visual_minimal_quality_use: float = 0.0
    visual_minimal_quality_collect: float = 0.0
    visual_min_votes: int = 1
    own_area_use: float = 0.0
    own_area_collect: float = 0.0
    # own-area computation: "device" evaluates the exclusively-owned shares
    # inside the jitted step (ops/ownarea.py — no host polygon work per
    # frame); "host" expects the caller to pass precomputed f64 shares
    # (utils/clipping.py, the exact oracle).  Order/neighbors bound the
    # device inclusion-exclusion expansion (see ops/ownarea.py docstring).
    own_area_backend: str = "device"
    own_area_order: int = 3
    own_area_neighbors: int = 8
    max_idle_epochs: int = 2
    constraints: Tuple[Tuple[int, float], ...] = ()
    position_weight: float = kal.DEFAULT_POSITION_WEIGHT
    velocity_weight: float = kal.DEFAULT_VELOCITY_WEIGHT
    assignment: str = "auto"
    # matmul precision for gallery feature distances: "f32" | "bf16".
    # bf16 doubles MXU throughput; distances shift by ~1e-3 relative, which
    # only affects exact near-ties against the visual thresholds.
    feature_precision: str = "f32"
    # static oriented-box flag (see SortConfig.oriented)
    oriented: bool = True
    # oriented-IoU neighbor prune (see SortConfig.oriented_neighbors —
    # measured negative at bench scales, default off)
    oriented_neighbors: int = 0
    # in-step waste (see SortConfig.recycle_idle): recycle idle-beyond-max
    # slots so capacity bounds live tracks in long scan pipelines
    recycle_idle: bool = False

    @property
    def new_track_threshold(self) -> float:
        return (
            self.iou_threshold
            if self.positional_kind == "iou"
            else MAHALANOBIS_NEW_TRACK_THRESHOLD
        )

    @property
    def kalman_spec(self) -> kal.KalmanSpec:
        return kal.KalmanSpec(self.position_weight, self.velocity_weight, "box")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VisualStepOutput:
    slot: jax.Array  # [D] int32
    track_id: jax.Array  # [D] int32
    is_new: jax.Array  # [D] bool
    pred_box: jax.Array  # [D, 5]
    length: jax.Array  # [D] int32
    voting_type: jax.Array  # [D] int32 (VT_VISUAL / VT_POSITIONAL)
    overflow: jax.Array  # [] bool


def _compat_matrix(cfg, state, det_box, epoch):
    """`VisualAttributes::compatible` (`track_attributes.rs:188-208`)."""
    act = state.active
    delta = epoch - state.last_epoch
    compat = act & (delta <= cfg.max_idle_epochs)
    if cfg.constraints:
        d2r = geo.dist_in_2r(det_box[:, None, :], state.pred_box[None, :, :])
        allowed = allowed_distance_for_delta(cfg.constraints, delta)
        return compat[None, :] & (d2r <= allowed[None, :])
    return jnp.broadcast_to(compat[None, :], (det_box.shape[0], act.shape[0]))


def positional_weights(cfg, state, det_box, det_conf, compat):
    """[D,T] positional metric + validity (`visual_sort/metric.rs:156-198`)."""
    conf = jnp.maximum(det_conf, cfg.positional_min_confidence)
    if cfg.positional_kind == "iou":
        nbrs = (
            cfg.oriented_neighbors
            if cfg.oriented
            and state.active.shape[0] >= 4 * cfg.oriented_neighbors
            else 0
        )
        iou, valid = geo.universal_iou_matrix(
            det_box, state.pred_box, cfg.oriented, neighbors=nbrs
        )
        m = iou * conf[:, None]
        valid = valid & (m >= cfg.iou_threshold) & compat
        return jnp.where(valid, m, 0.0), valid
    d2 = cfg.kalman_spec.distance_matrix(state.kf, det_box)
    cost = kal.calculate_cost(d2, inverted=True)
    m = cost / conf[:, None]
    tf = geo.too_far(det_box[:, None, :], state.pred_box[None, :, :])
    valid = compat & ~tf
    return jnp.where(valid, m, 0.0), valid


def visual_votes(cfg, state, det_feat, det_gate, compat):
    """Vote counts + best-fit weights from gallery feature distances.

    Returns (votes[D,T], weight[D,T]) where weight = sum(max_dist - d) over
    metric-passed gallery entries (`voting/best.rs:52-104` with the
    f32::MAX voting threshold the tracker passes, `simple_api.rs:179-186`).
    """
    q = det_feat
    g = state.feats
    if cfg.feature_precision == "bf16":
        q = q.astype(jnp.bfloat16)
        g = g.astype(jnp.bfloat16)
    if cfg.visual_kind == "euclidean":
        dmat = dst.euclidean_matrix(q, g)  # [D,T,K]
        ok = dmat <= cfg.visual_threshold
        w = dmat
    else:
        sim = dst.cosine_matrix(q, g)
        ok = sim >= cfg.visual_threshold
        w = 1.0 - sim

    track_gate = state.collected >= cfg.visual_minimal_track_length  # [T]
    valid = (
        det_gate[:, None, None]
        & compat[:, :, None]
        & track_gate[None, :, None]
        & state.feat_valid[None, :, :]
        & ok
    )
    votes = jnp.sum(valid, axis=2)
    # the reference's max_dist is the max over every metric-passed distance
    max_dist = jnp.max(jnp.where(valid, w, _NEG))
    weight = jnp.sum(jnp.where(valid, max_dist - w, 0.0), axis=2)
    return votes, weight


def visual_step(
    cfg: VisualConfig,
    state: VisualState,
    det_box: jax.Array,  # [D, 5]
    det_conf: jax.Array,  # [D]
    det_valid: jax.Array,  # [D] bool
    det_feat: jax.Array,  # [D, F]
    det_feat_valid: jax.Array,  # [D] bool
    det_quality: jax.Array,  # [D]
    det_own_area: jax.Array,  # [D] (1.0 when own-area gating is off)
    epoch: jax.Array,  # scalar int32
) -> Tuple[VisualState, VisualStepOutput]:
    new_state, out, _ = _visual_step_impl(
        cfg, False, state, det_box, det_conf, det_valid, det_feat,
        det_feat_valid, det_quality, det_own_area, epoch)
    return new_state, out


def visual_step_deferred(cfg, state, *args):
    """visual_step with the two BIG feature-array merges (gallery lanes +
    history ring) returned as operands instead of applied.

    The batched engine applies them across all scenes at once with the
    in-place Pallas row-DMA kernel (`ops/pallas_merge.py`) — the XLA
    one-hot form reads and rewrites the entire [S,T,K,F]/[S,T,H,F] arrays
    to change D rows/scene, ~28% of the batched step (ARCHITECTURE §4c).
    Returns (state, out, fmerge) where fmerge = (src[D,F] state-dtype,
    rowf[D], maskf[D], rowh[D], maskh[D]); rows are flattened into
    [T*K] / [T*H].
    """
    return _visual_step_impl(cfg, True, state, *args)


def _visual_step_impl(
    cfg: VisualConfig,
    defer_feature_merge: bool,
    state: VisualState,
    det_box: jax.Array,
    det_conf: jax.Array,
    det_valid: jax.Array,
    det_feat: jax.Array,
    det_feat_valid: jax.Array,
    det_quality: jax.Array,
    det_own_area: jax.Array,
    epoch: jax.Array,
):
    d = det_box.shape[0]
    t = state.capacity
    k = state.gallery_size
    spec = cfg.kalman_spec

    if cfg.recycle_idle:
        state = dataclasses.replace(
            state,
            active=state.active
            & (epoch - state.last_epoch <= cfg.max_idle_epochs),
        )

    compat = _compat_matrix(cfg, state, det_box, epoch)
    P, p_valid = positional_weights(cfg, state, det_box, det_conf, compat)

    # own-area shares over the frame's detection set (`simple_api.rs:111-127`)
    # — fused into the step when the device backend is selected
    if (
        cfg.own_area_use > 0.0 or cfg.own_area_collect > 0.0
    ) and cfg.own_area_backend == "device":
        det_own_area = owna.own_area_shares(
            det_box,
            det_valid,
            order=cfg.own_area_order,
            neighbors=cfg.own_area_neighbors,
        )

    # candidate-side feature gates (`visual_sort/metric.rs:227-249`)
    area_ok = geo.box_area(det_box) >= cfg.visual_minimal_area
    use_gate = (
        det_feat_valid
        & det_valid
        & (det_quality >= cfg.visual_minimal_quality_use)
        & (det_own_area >= cfg.own_area_use)
        & area_ok
    )
    collect_gate = (
        det_feat_valid
        & (det_quality >= cfg.visual_minimal_quality_collect)
        & (det_own_area >= cfg.own_area_collect)
        & area_ok
    )

    votes, vweight = visual_votes(cfg, state, det_feat, use_gate, compat)
    eligible = (votes >= cfg.visual_min_votes) & det_valid[:, None]
    w = jnp.where(eligible, vweight, _NEG)

    # --- greedy best-fit in closed form ----------------------------------
    # (by-slot reads/writes as one-hot contractions throughout — vmapped
    # dynamic gathers/scatters serialize on TPU, ARCHITECTURE.md §4c)
    t1 = jnp.argmax(w, axis=1)  # [D] best track per candidate
    t1_hot = mrg.reader_hit(t1, t)  # [D, T]
    has_any = jnp.any(eligible, axis=1)  # candidate participates in visual
    best_query = jnp.argmax(w, axis=0)  # [T] heaviest candidate per track
    bq_at_t1 = jnp.sum(jnp.where(t1_hot, best_query[None, :], 0), axis=1)
    wins_visual = has_any & (bq_at_t1 == jnp.arange(d))
    visual_decided = has_any  # winner==self still excludes from positional
    claimed = jnp.any(t1_hot & wins_visual[:, None], axis=0)  # [T]

    # --- positional Hungarian on the remainder ---------------------------
    row_open = det_valid & ~visual_decided
    col_open = state.active & ~claimed
    P_masked = jnp.where(row_open[:, None] & col_open[None, :] & p_valid, P, 0.0)
    col = asg.solve_voting(
        P_masked, cfg.new_track_threshold, det_valid, col_open,
        asg.resolve_backend(cfg.assignment),
    )
    ptgt = jnp.clip(col - d, 0, t - 1)
    pos_matched = (
        row_open
        & (col >= d)
        & (mrg.take_at(P_masked, ptgt) >= cfg.new_track_threshold)
    )

    matched = wins_visual | pos_matched
    tgt = jnp.where(wins_visual, t1, ptgt)
    vt = jnp.where(wins_visual, VT_VISUAL, VT_POSITIONAL).astype(jnp.int32)

    # --- slot allocation --------------------------------------------------
    is_new = det_valid & ~matched
    new_rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_new = jnp.sum(is_new.astype(jnp.int32))
    overflow = n_new > jnp.sum((~state.active).astype(jnp.int32))
    slot = jnp.where(matched, tgt, mrg.nth_free_slot(state.active, new_rank))
    safe = det_valid & ~overflow

    # --- Kalman update ----------------------------------------------------
    kf_at_slot = mrg.take_tree(state.kf, slot)
    prev = jax.tree.map(
        lambda tr, init: jnp.where(matched[:, None], tr, init),
        kf_at_slot,
        spec.initiate(det_box),
    )
    st = spec.update(spec.predict(prev), det_box)
    pred_box = st.mean_pos

    new_length = jnp.where(matched, mrg.take_rows(state.length, slot) + 1, 1)
    new_ids = jnp.where(
        matched, mrg.take_rows(state.track_id, slot),
        state.next_id + new_rank + 1
    ).astype(jnp.int32)

    # --- gallery update (`visual_sort/metric.rs:297-374`) -----------------
    gal_valid = jnp.where(
        matched[:, None], mrg.take_rows(state.feat_valid, slot), False
    )  # [D,K]
    gal_q = mrg.take_rows(state.feat_quality, slot)
    n_f = jnp.sum(gal_valid, axis=1)
    evict_needed = n_f >= k
    evict_k = jnp.argmin(jnp.where(gal_valid, gal_q, jnp.inf), axis=1)
    onehot_evict = jax.nn.one_hot(evict_k, k, dtype=bool)
    gal_valid = gal_valid & ~(evict_needed[:, None] & onehot_evict)
    # the first feature of a brand-new track bypasses the collect gate
    # (candidate optimize runs with is_merge=false, `track.rs:486-492`)
    keep_new = det_feat_valid & jnp.where(is_new, True, collect_gate)
    free_k = jnp.argmax(~gal_valid, axis=1)  # always exists after eviction
    onehot_new = jax.nn.one_hot(free_k, k, dtype=bool) & keep_new[:, None]
    final_valid = gal_valid | onehot_new
    final_q = jnp.where(onehot_new, det_quality[:, None], gal_q)
    collected = jnp.sum(final_valid, axis=1).astype(jnp.int32)

    h = state.history
    hix = (new_length - 1) % h

    # scatter-free state merge (see ops/merge.py); gallery-lane writes use the
    # tighter collect mask so skipped features leave the gallery row untouched
    # apart from the quality/validity bookkeeping merged below.
    hit = mrg.writer_hit(slot, safe, t)
    hit_f = hit & keep_new[None, :]
    written = jnp.any(hit, axis=1)

    if defer_feature_merge:
        feats = state.feats
        hist_feat = state.hist_feat
        slot_i = jnp.clip(slot, 0, t - 1).astype(jnp.int32)
        fmerge = (
            det_feat.astype(state.feats.dtype),
            slot_i * k + free_k.astype(jnp.int32),  # gallery lane row
            (safe & keep_new).astype(jnp.int32),
            slot_i * h + hix.astype(jnp.int32),  # history ring row
            safe.astype(jnp.int32),
        )
    else:
        feats = mrg.merge_lane(state.feats, det_feat, free_k, hit_f)
        hist_feat = mrg.merge_ring(state.hist_feat, det_feat, hix, hit)
        fmerge = None

    new_state = VisualState(
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
        feats=feats,
        feat_quality=mrg.merge_rows(state.feat_quality, final_q, hit),
        feat_valid=mrg.merge_rows(state.feat_valid, final_valid, hit),
        collected=mrg.merge_rows(state.collected, collected, hit),
        voting_type=mrg.merge_rows(state.voting_type, vt, hit),
        hist_feat=hist_feat,
        hist_feat_valid=mrg.merge_ring(
            state.hist_feat_valid, det_feat_valid, hix, hit
        ),
    )
    out = VisualStepOutput(
        slot=slot.astype(jnp.int32),
        track_id=new_ids,
        is_new=is_new,
        pred_box=pred_box,
        length=new_length.astype(jnp.int32),
        voting_type=vt,
        overflow=overflow,
    )
    return new_state, out, fmerge


@lru_cache(maxsize=None)
def compiled_visual_step(cfg: VisualConfig):
    return jax.jit(partial(visual_step, cfg), donate_argnums=(0,))


def visual_scan(
    cfg: VisualConfig,
    state: VisualState,
    det_box, det_conf, det_valid, det_feat, det_feat_valid, det_quality,
    det_own_area, epoch0,
):
    """Device-resident pipeline over a frame stream (shapes [S, D, ...])."""

    def body(st, inp):
        box, conf, valid, feat, fvalid, qual, oa, e = inp
        st, out = visual_step(
            cfg, st, box, conf, valid, feat, fvalid, qual, oa, e
        )
        return st, out

    steps = det_box.shape[0]
    idx = jnp.arange(steps, dtype=jnp.int32)
    # epoch0: scalar (consecutive frames) or int32[S] per-frame epochs
    epochs = epoch0 + idx if jnp.ndim(epoch0) == 0 else epoch0
    return jax.lax.scan(
        body,
        state,
        (det_box, det_conf, det_valid, det_feat, det_feat_valid, det_quality,
         det_own_area, epochs),
    )


@lru_cache(maxsize=None)
def compiled_visual_scan(cfg: VisualConfig):
    return jax.jit(partial(visual_scan, cfg), donate_argnums=(0,))
