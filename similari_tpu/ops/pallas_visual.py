"""Pallas VisualSORT-on-chip: ReID gallery + cascade voting fused in one kernel.

The XLA visual step (`trackers/visual_step.py`) is the general path; this
kernel fuses the *entire* VisualSORT frame — gallery feature distances
(MXU), closed-form best-fit claim, positional auction on the remainder,
Kalman update, slot allocation and the gallery insert/evict bookkeeping —
into one `pallas_call` that keeps the full tracker state (including the
`[T, K, F]` feature gallery) resident in VMEM across a chunk of C frames.
No HBM round-trips happen between the step's stages inside a chunk, which
is exactly the traffic the XLA scan still pays between its fused
sub-computations.

Reference semantics fused here (same citations as the XLA step):
  * pairwise metric: positional IoU part + quality/area/own-area-gated
    gallery distances (`/root/reference/src/trackers/visual_sort/metric.rs:156-295`);
  * cascade voting: greedy BestFit on feature weights then Hungarian-LP on
    the positional remainder (`visual_sort/voting.rs:45-101`,
    `voting/best.rs:52-128`) — the in-kernel auction solves the same
    augmented LP (`ops/pallas_sort.forward_auction`);
  * gallery maintenance: quality-sorted eviction + collect gates
    (`visual_sort/metric.rs:297-374`).

Scope (the production online-MOT configurations, mirrors `pallas_sort`):
  * positional metric = IoU or Mahalanobis on axis-aligned boxes (the KF
    state is VMEM-resident, so the chi2-gated distance is fused too),
    spatio-temporal constraints supported, history depth 1;
  * euclidean or cosine feature metric, all quality/area gates supported;
  * own-area shares must be precomputed (host backend) when own-area gating
    is on — the device own-area expansion (`ops/ownarea.py`) is not fused.
  * batch workloads stay on the XLA engine — measured, not argued:
    scenes-sequential kernels cost 31-41 us/scene-frame vs the XLA batch
    engine's 8.2 at the knee (`tools/experiment_pallas_batch.py`).

Design notes:
  * The gallery is held as K separate [T, F] planes (K is small and
    static, default 3).  Per-plane distances are K `[D,F] x [F,T]` MXU
    matmuls — identical FLOPs to the XLA `[D, T*K]` formulation but with
    no reshapes, which Mosaic's layout engine would otherwise fight.
  * All slot scatter/gather is one-hot matmuls; per-K bookkeeping
    (eviction argmin, first-free lane) is K-unrolled elementwise code.
  * Mosaic cannot lane-broadcast 1-D bools (`boolvec[:, None]` crashes the
    compiler): every [D]-indexed mask is carried as int32/f32 and compared
    after broadcasting.  [T]-indexed bools broadcast fine on sublanes
    (`vec[None, :]`).

Numerical parity with `visual_step` is property-tested (same ids, voting
types and state) in interpret mode on CPU and compiled on TPU.

Measured outcome (v5e, honest fetch-synced timing, 100 obj x 512-d,
gallery 3): 24.0-27.0k FPS vs 18.6-19.4k for the gather-free XLA scan —
**x1.3-1.45** (x1.55 vs the pre-ARCHITECTURE-§4c XLA step).  The VisualSORT
step is where per-frame HBM round-trips still live (gallery reads for
distances, feature intermediates, gallery writes for insert/evict);
keeping them in VMEM is the win the SORT kernel couldn't get (see
ops/pallas_sort.py header and ARCHITECTURE.md §5).  Captured by
`bench.py visual_sort_100x512_pallas`.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..trackers.visual_step import VisualConfig
from ..trackers.visual_state import VisualState
from .pallas_sort import NEG, _cumsum_rows, _row_argmax, forward_auction

_BIG = 3.0e38


def _col_argmax(values):
    """(max, argmax) along axis 0 without relying on argmax lowering."""
    m = jnp.max(values, axis=0, keepdims=True)  # [1,C]
    r = values.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, values.shape, 0)
    idx = jnp.min(jnp.where(values >= m, row, r), axis=0)  # first max
    return m[0], idx


def _kernel(cfg: VisualConfig, c_frames: int, k: int, *refs):
    n_state = 17 + 3 * k
    (box_ref, conf_ref, valid_ref, feat_ref, ffl_ref, qual_ref, oa_ref,
     epoch_ref) = refs[:8]
    sin = refs[8:8 + n_state]
    sout = refs[8 + n_state:8 + 2 * n_state]
    (out_ids, out_slots, out_pred, out_vt, out_new, out_len, out_ovf) = refs[
        8 + 2 * n_state:]

    (i_mp, i_mv, i_cpp, i_cpv, i_cvv, i_pred, i_obs, i_tconf, i_active,
     i_last, i_length, i_tid) = sin[:12]
    in_gf = sin[12:12 + k]
    in_gq = sin[12 + k:12 + 2 * k]
    in_gv = sin[12 + 2 * k:12 + 3 * k]
    i_coll, i_vt, i_lastf, i_lastfv, i_nid = sin[12 + 3 * k:]

    (o_mp, o_mv, o_cpp, o_cpv, o_cvv, o_pred, o_obs, o_tconf, o_active,
     o_last, o_length, o_tid) = sout[:12]
    o_gf = sout[12:12 + k]
    o_gq = sout[12 + k:12 + 2 * k]
    o_gv = sout[12 + 2 * k:12 + 3 * k]
    o_coll, o_vt, o_lastf, o_lastfv, o_nid = sout[12 + 3 * k:]

    d = box_ref.shape[1]
    t = i_pred.shape[0]
    pw, vw = cfg.position_weight, cfg.velocity_weight
    thr = cfg.new_track_threshold  # iou_threshold | maha 1.0
    euclid = cfg.visual_kind == "euclidean"
    bf16 = cfg.feature_precision == "bf16"

    # copy state into the output refs; the frame loop then updates in place
    for src, dst in zip(sin[:12] + tuple(sin[12:12 + 3 * k])
                        + (i_coll, i_vt, i_lastf, i_lastfv),
                        sout[:12] + tuple(sout[12:12 + 3 * k])
                        + (o_coll, o_vt, o_lastf, o_lastfv)):
        dst[...] = src[...]
    o_nid[0, 0] = i_nid[0, 0]  # scalar copy (SMEM)

    lane5 = jax.lax.broadcasted_iota(jnp.int32, (1, 5), 1)[0]
    cvec = (lane5 == 3).astype(jnp.float32)  # aspect slot uses constant noise
    wvec = 1.0 - cvec
    drows = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)[0]  # [D] iota

    def std2(kk, cnst, h):
        s = kk * pw * h[:, None] * wvec[None, :] + cnst * cvec[None, :]
        return s * s

    def stdv2(kk, cnst, h):
        s = kk * vw * h[:, None] * wvec[None, :] + cnst * cvec[None, :]
        return s * s

    def frame(s, _):
        box = box_ref[s]            # [D,5]
        conf = conf_ref[s]          # [D]
        valid_row = valid_ref[s]    # [D] int32
        feat = feat_ref[s]          # [D,F]
        featok_row = ffl_ref[s]     # [D] int32
        qual = qual_ref[s]          # [D]
        oa = oa_ref[s]              # [D]
        dvalid = valid_row > 0
        featok = featok_row > 0
        epoch = epoch_ref[0, 0] + s
        valid_f = (valid_row > 0).astype(jnp.float32)  # [D]
        # invalid/padded rows may carry ZERO boxes; a zero height makes the
        # KF update divide 0/0 and the resulting NaN would poison every slot
        # through the one-hot scatter matmuls (0 * NaN = NaN).  Replace them
        # with a unit box (aspect=1, h=1) — their writes are masked anyway.
        unit = (lane5 >= 3).astype(jnp.float32)  # [5] = (0,0,0,1,1)
        box = box * valid_f[:, None] + (1.0 - valid_f)[:, None] * unit[None, :]

        active = o_active[...] > 0           # [T]
        pred = o_pred[...]                   # [T,5]
        last = o_last[...]                   # [T]

        # ---- compatibility + positional weights -------------------------
        # (`track_attributes.rs:188-208`, `visual_sort/metric.rs:156-198`)
        compat = active & ((epoch - last) <= cfg.max_idle_epochs)  # [T]
        if cfg.recycle_idle:
            # in-step waste (`epoch_db.rs:51-65`): idle-beyond-max tracks are
            # retired so capacity bounds *live* tracks, not cumulative ones
            active = compat
        # det/track enclosing radii + center distance (too_far / constraints)
        hwd = box[:, 3] * box[:, 4] * 0.5
        hhd = box[:, 4] * 0.5
        r_det = jnp.sqrt(hwd * hwd + hhd * hhd)  # [D]
        hwt = pred[:, 3] * pred[:, 4] * 0.5
        hht = pred[:, 4] * 0.5
        r_trk = jnp.sqrt(hwt * hwt + hht * hht)  # [T]
        dx = box[:, 0:1] - pred[:, 0][None, :]
        dy = box[:, 1:2] - pred[:, 1][None, :]
        cd2 = dx * dx + dy * dy  # [D,T]
        rsum = r_det[:, None] + r_trk[None, :]
        if cfg.constraints:
            # SpatioTemporalConstraints::validate (`spatio_temporal_
            # constraints.rs:48-59`): first constraint with d >= delta
            delta = epoch - last  # [T]
            allowed = jnp.full(delta.shape, 3.0e38, jnp.float32)
            for dd, max_dist in sorted(cfg.constraints, reverse=True):
                allowed = jnp.where(delta <= dd, jnp.float32(max_dist),
                                    allowed)
            d2r = jnp.sqrt(cd2) / jnp.sqrt(rsum * rsum + 1e-5)
            compat_dt = compat[None, :] & (d2r <= allowed[None, :])
        else:
            compat_dt = jnp.broadcast_to(compat[None, :], (d, t))
        cc = jnp.maximum(conf, cfg.positional_min_confidence)
        if cfg.positional_kind == "iou":
            aw = box[:, 3] * box[:, 4]
            tw = pred[:, 3] * pred[:, 4]
            ix = (
                jnp.minimum(box[:, 0:1] + aw[:, None] * 0.5,
                            (pred[:, 0] + tw * 0.5)[None, :])
                - jnp.maximum(box[:, 0:1] - aw[:, None] * 0.5,
                              (pred[:, 0] - tw * 0.5)[None, :])
            )
            iy = (
                jnp.minimum(box[:, 1:2] + box[:, 4:5] * 0.5,
                            (pred[:, 1] + pred[:, 4] * 0.5)[None, :])
                - jnp.maximum(box[:, 1:2] - box[:, 4:5] * 0.5,
                              (pred[:, 1] - pred[:, 4] * 0.5)[None, :])
            )
            inter = jnp.where((ix > 0) & (iy > 0), ix * iy, 0.0)  # [D,T]
            union = ((aw * box[:, 4])[:, None] + (tw * pred[:, 4])[None, :]
                     - inter)
            iou = inter / jnp.where(inter > 0, union, 1.0)
            m = iou * cc[:, None]
            p_valid = compat_dt & (inter > 0) & (m >= thr)  # [D,T]
        else:
            # Mahalanobis vs the stored KF state (`sort/metric.rs:57-71`):
            # S is diagonal (cpp + project noise), cost = chi2-gated inverted
            mp_t = o_mp[...]   # [T,5]
            cpp_t = o_cpp[...]
            p4 = mp_t[:, 4]
            d2 = jnp.zeros((d, t), jnp.float32)
            for kk in range(5):
                rs = 1e-1 if kk == 3 else None
                rk = (jnp.full_like(p4, 1e-1) if rs else pw * p4)  # [T]
                # floor: empty track rows have cpp=0, h=0 -> S would be 0
                S = jnp.maximum(cpp_t[:, kk] + rk * rk, 1e-30)
                nu = box[:, kk:kk + 1] - mp_t[:, kk][None, :]
                d2 = d2 + nu * nu / S[None, :]
            cost = jnp.where(d2 > 11.070, 0.0, 100.0 - d2)  # CHI2INV95[4]
            m = cost / cc[:, None]
            tf = cd2 > rsum * rsum  # too_far (`bbox.rs:452-462`)
            p_valid = compat_dt & ~tf
        P = jnp.where(p_valid, m, 0.0)

        # ---- candidate feature gates (`visual_sort/metric.rs:227-249`) --
        area = box[:, 3] * box[:, 4] * box[:, 4]
        area_ok = area >= cfg.visual_minimal_area
        use_gate = (featok & dvalid
                    & (qual >= cfg.visual_minimal_quality_use)
                    & (oa >= cfg.own_area_use) & area_ok)
        collect_gate = (featok
                        & (qual >= cfg.visual_minimal_quality_collect)
                        & (oa >= cfg.own_area_collect) & area_ok)
        use_i = use_gate.astype(jnp.int32)

        # ---- gallery distances + votes (K planes, MXU) ------------------
        # (`visual_sort/metric.rs:200-225`, weights `voting/best.rs:92-103`)
        track_gate = o_coll[...] >= cfg.visual_minimal_track_length  # [T]
        featf = feat.astype(jnp.float32)
        qn = jnp.sum(featf * featf, axis=1)  # [D] f32
        q_in = feat.astype(jnp.bfloat16) if bf16 else feat
        w_ks, valid_ks = [], []
        for i in range(k):
            g = o_gf[i][...]  # [T,F]
            gf = g.astype(jnp.float32)
            gn = jnp.sum(gf * gf, axis=1)  # [T]
            g_in = g.astype(jnp.bfloat16) if bf16 else g
            dot = jax.lax.dot_general(
                q_in, g_in, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [D,T]
            if euclid:
                d2 = jnp.maximum(qn[:, None] + gn[None, :] - 2.0 * dot, 0.0)
                w = jnp.sqrt(d2)
                ok = w <= cfg.visual_threshold
            else:
                denom = jnp.sqrt(qn)[:, None] * jnp.sqrt(gn)[None, :]
                sim = dot / jnp.where(denom > 0, denom, 1.0)
                ok = sim >= cfg.visual_threshold
                w = 1.0 - sim
            fv = o_gv[i][...] > 0  # [T]
            valid = ((use_i[:, None] > 0) & compat_dt
                     & track_gate[None, :] & fv[None, :] & ok)
            w_ks.append(w)
            valid_ks.append(valid)
        # the reference's max_dist = max over every metric-passed distance
        max_dist = NEG
        for i in range(k):
            max_dist = jnp.maximum(
                max_dist, jnp.max(jnp.where(valid_ks[i], w_ks[i], NEG)))
        votes = jnp.zeros((d, t), jnp.int32)
        weight = jnp.zeros((d, t), jnp.float32)
        for i in range(k):
            votes = votes + valid_ks[i].astype(jnp.int32)
            weight = weight + jnp.where(
                valid_ks[i], max_dist - w_ks[i], 0.0)

        # ---- greedy best-fit claim in closed form -----------------------
        # (`voting/best.rs:110-120`; see trackers/visual_step.py docstring)
        eligible = (votes >= cfg.visual_min_votes) & (valid_row[:, None] > 0)
        w_m = jnp.where(eligible, weight, NEG)
        _, t1 = _row_argmax(w_m)          # [D] best track per candidate
        has_any = jnp.any(eligible, axis=1)
        _, best_q = _col_argmax(w_m)      # [T] heaviest candidate per track
        tcol = jax.lax.broadcasted_iota(jnp.int32, (d, t), 1)
        oh1 = (tcol == t1[:, None]).astype(jnp.float32)  # [D,T]
        bq_at_t1 = jnp.dot(oh1, best_q.astype(jnp.float32)[:, None],
                           preferred_element_type=jnp.float32)[:, 0]
        wins_visual = has_any & (bq_at_t1.astype(jnp.int32) == drows)
        wins_f = wins_visual.astype(jnp.float32)
        claimed = jnp.dot(wins_f[None, :], oh1,
                          preferred_element_type=jnp.float32)[0] > 0.5  # [T]

        # ---- positional auction on the remainder ------------------------
        row_open = dvalid & ~has_any
        row_open_i = row_open.astype(jnp.int32)
        col_open = active & ~claimed
        P_masked = jnp.where(
            (row_open_i[:, None] > 0) & col_open[None, :] & p_valid, P, 0.0)
        dcol = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
        drow = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        diag = jnp.where((dcol == drow) & (valid_row[:, None] > 0), thr, 0.0)
        A = jnp.concatenate([diag, P_masked], axis=1)  # [D, D+T]
        r2c = forward_auction(A, dvalid)
        ptgt = jnp.clip(r2c - d, 0, t - 1)
        pair_w = jnp.sum(jnp.where(tcol == ptgt[:, None], P_masked, 0.0),
                         axis=1)
        pos_matched = row_open & (r2c >= d) & (pair_w >= thr)

        matched = wins_visual | pos_matched
        tgt = jnp.where(wins_visual, t1, ptgt)
        vt = jnp.where(wins_visual, 0, 1)  # VT_VISUAL / VT_POSITIONAL

        # ---- slot allocation -------------------------------------------
        is_new = dvalid & ~matched
        free = ~active  # [T]
        free_rank = _cumsum_rows(free[None, :].astype(jnp.float32))[0]  # [T]
        new_rank = _cumsum_rows(is_new[None, :].astype(jnp.float32))[0]  # [D]
        want = new_rank[:, None]  # rank (1-based) needed per det
        hit = free[None, :] & (jnp.broadcast_to(free_rank[None, :], (d, t))
                               == want)
        new_slot = jnp.min(jnp.where(hit, tcol, t - 1), axis=1)
        slot = jnp.where(matched, tgt, new_slot)
        n_new = jnp.sum(is_new.astype(jnp.int32))
        n_free = jnp.sum(free.astype(jnp.int32))
        # overflow: mirror the XLA step (`visual_step.py`) — when new tracks
        # exceed free slots the whole frame's writes are dropped (next_id
        # still advances), instead of one-hot rows summing into slot t-1.
        overflow = n_new > n_free
        safe_f = 1.0 - overflow.astype(jnp.float32)  # scalar write gate

        # ---- one-hot scatter/gather matrices ---------------------------
        oh_b = (tcol == slot[:, None]) & (valid_row[:, None] > 0)  # [D,T]
        oh = oh_b.astype(jnp.float32)
        oh_w = oh * safe_f  # write-side one-hot (drops the frame on overflow)
        g = lambda a: jnp.dot(oh, a, preferred_element_type=jnp.float32)
        gv = lambda a: jnp.dot(oh, a[:, None],
                               preferred_element_type=jnp.float32)[:, 0]
        # integer by-slot read (ids/lengths stay int32 end-to-end; a float
        # matmul is only exact to 2^24)
        gi = lambda a: jnp.sum(jnp.where(oh_b, a[None, :], 0), axis=1)

        # ---- Kalman update (same block structure as pallas_sort) --------
        h = box[:, 4]
        init_cpp = std2(2.0, 1e-2, h)
        init_cvv = stdv2(10.0, 1e-5, h)
        mm = matched.astype(jnp.float32)[:, None]
        p_mp = mm * g(o_mp[...]) + (1 - mm) * box
        p_mv = mm * g(o_mv[...])
        p_cpp = mm * g(o_cpp[...]) + (1 - mm) * init_cpp
        p_cpv = mm * g(o_cpv[...])
        p_cvv = mm * g(o_cvv[...]) + (1 - mm) * init_cvv

        hh = p_mp[:, 4]
        qp = std2(1.0, 1e-2, hh)
        qv = stdv2(1.0, 1e-5, hh)
        n_mp = p_mp + p_mv
        n_cpp = p_cpp + 2.0 * p_cpv + p_cvv + qp
        n_cpv = p_cpv + p_cvv
        n_cvv = p_cvv + qv
        r = std2(1.0, 1e-1, n_mp[:, 4])
        # S > 0 for any nonzero-height box; the floor only defuses division
        # on degenerate rows (belt to the sanitized-box suspenders above)
        S = jnp.maximum(n_cpp + r, 1e-30)
        nu = box - n_mp
        gp = n_cpp / S
        gvn = n_cpv / S
        u_mp = n_mp + nu * gp
        u_mv = p_mv + nu * gvn
        u_cpp = n_cpp - n_cpp * gp
        u_cpv = n_cpv - n_cpp * gvn
        u_cvv = n_cvv - n_cpv * gvn

        new_len = jnp.where(matched, gi(o_length[...]), 0) + 1  # [D] int32
        new_ids = jnp.where(
            matched, gi(o_tid[...]),
            o_nid[0, 0] + new_rank.astype(jnp.int32),
        )  # [D] int32

        # ---- gallery bookkeeping (`visual_sort/metric.rs:297-374`) ------
        matched_i = matched.astype(jnp.int32)
        gal_v = []   # [D] per-k: live feature in the target row's lane k
        gal_q = []   # [D] per-k: its quality
        for i in range(k):
            vv = (gv(o_gv[i][...].astype(jnp.float32)) > 0.5) & matched
            gal_v.append(vv)
            gal_q.append(gv(o_gq[i][...]))
        n_f = jnp.zeros((d,), jnp.int32)
        for i in range(k):
            n_f = n_f + gal_v[i].astype(jnp.int32)
        evict_needed = n_f >= k
        minq = jnp.full((d,), _BIG, jnp.float32)
        for i in range(k):
            minq = jnp.minimum(minq, jnp.where(gal_v[i], gal_q[i], _BIG))
        evict_k = jnp.full((d,), k, jnp.int32)
        for i in reversed(range(k)):  # first min wins (argmin semantics)
            evict_k = jnp.where(gal_v[i] & (gal_q[i] <= minq), i, evict_k)
        for i in range(k):
            gal_v[i] = gal_v[i] & ~(evict_needed & (evict_k == i))
        # the first feature of a brand-new track bypasses the collect gate
        # (pure bool algebra: a where(bool, True, x) select lowers to an
        # i8->i1 truncation Mosaic rejects)
        keep_new = featok & (is_new | collect_gate)
        free_k = jnp.zeros((d,), jnp.int32)
        for i in reversed(range(k)):  # first free lane (argmax of ~valid)
            free_k = jnp.where(~gal_v[i], i, free_k)
        new_lane = []
        final_v = []
        final_q = []
        collected = jnp.zeros((d,), jnp.int32)
        for i in range(k):
            nl = (free_k == i) & keep_new
            fv = gal_v[i] | nl
            new_lane.append(nl)
            final_v.append(fv)
            final_q.append(jnp.where(nl, qual, gal_q[i]))
            collected = collected + fv.astype(jnp.int32)

        # ---- scatter back: state' = (1-upd) * state + ohT @ value -------
        # (all writes go through oh_w, which zeroes on frame overflow)
        upd_t = jnp.dot(oh_w.T, jnp.ones((d, 1), jnp.float32),
                        preferred_element_type=jnp.float32)  # [T,1]
        upd_t = jnp.minimum(upd_t, 1.0)
        sc = lambda a: jnp.dot(oh_w.T, a, preferred_element_type=jnp.float32)
        scv = lambda a: sc(a[:, None])[:, 0]
        u1 = upd_t[:, 0]
        ohw_b = oh_w > 0.5  # bool write mask [D,T]
        sci = lambda a: jnp.sum(jnp.where(ohw_b, a[:, None], 0), axis=0)

        o_mp[...] = (1 - upd_t) * o_mp[...] + sc(u_mp)
        o_mv[...] = (1 - upd_t) * o_mv[...] + sc(u_mv)
        o_cpp[...] = (1 - upd_t) * o_cpp[...] + sc(u_cpp)
        o_cpv[...] = (1 - upd_t) * o_cpv[...] + sc(u_cpv)
        o_cvv[...] = (1 - upd_t) * o_cvv[...] + sc(u_cvv)
        o_pred[...] = (1 - upd_t) * o_pred[...] + sc(u_mp)
        o_obs[...] = (1 - upd_t) * o_obs[...] + sc(box)
        o_tconf[...] = (1 - u1) * o_tconf[...] + scv(conf)
        base_active = active.astype(jnp.int32) if cfg.recycle_idle \
            else o_active[...]
        o_active[...] = jnp.maximum(base_active, u1.astype(jnp.int32))
        o_last[...] = jnp.where(u1 > 0, epoch, o_last[...])
        o_length[...] = jnp.where(u1 > 0, sci(new_len), o_length[...])
        o_tid[...] = jnp.where(u1 > 0, sci(new_ids), o_tid[...])
        o_nid[0, 0] = o_nid[0, 0] + n_new

        # feature rows of invalid/padded detections may carry junk; zero
        # them so the one-hot matmuls can't smear NaN (see ops/merge.py)
        feat_z = feat * valid_f[:, None]
        for i in range(k):
            wl = new_lane[i].astype(jnp.float32)           # [D]
            hit_i = oh_w * wl[:, None]                     # [D,T]
            upd_i = jnp.dot(hit_i.T, jnp.ones((d, 1), jnp.float32),
                            preferred_element_type=jnp.float32)  # [T,1]
            upd_i = jnp.minimum(upd_i, 1.0)
            o_gf[i][...] = ((1 - upd_i) * o_gf[i][...]
                            + jnp.dot(hit_i.T, feat_z,
                                      preferred_element_type=jnp.float32))
            o_gq[i][...] = jnp.where(u1 > 0, scv(final_q[i]), o_gq[i][...])
            o_gv[i][...] = jnp.where(
                u1 > 0, scv(final_v[i].astype(jnp.float32)).astype(jnp.int32),
                o_gv[i][...])
        o_coll[...] = jnp.where(
            u1 > 0, scv(collected.astype(jnp.float32)).astype(jnp.int32),
            o_coll[...])
        o_vt[...] = jnp.where(
            u1 > 0, scv(vt.astype(jnp.float32)).astype(jnp.int32), o_vt[...])
        o_lastf[...] = (1 - upd_t) * o_lastf[...] + sc(feat_z)
        o_lastfv[...] = jnp.where(
            u1 > 0, scv(featok_row.astype(jnp.float32)).astype(jnp.int32),
            o_lastfv[...])

        out_ids[s] = new_ids
        out_slots[s] = slot.astype(jnp.int32)
        out_pred[s] = u_mp
        out_vt[s] = vt.astype(jnp.int32)
        out_new[s] = is_new.astype(jnp.int32)
        out_len[s] = new_len
        out_ovf[s, 0] = overflow.astype(jnp.int32)
        return ()

    jax.lax.fori_loop(0, c_frames, lambda s, c: frame(s, c), ())


def pallas_visual_chunk(cfg: VisualConfig, c_frames: int, d: int, t: int,
                        k: int, f: int, interpret: bool = False):
    """Build the chunked pallas visual step.

    state_tuple layout (matches `state_to_tuple`): 12 SORT columns, K
    gallery-feature planes [T,F], K quality columns [T], K validity columns
    [T] (i32), then collected, voting_type, last_feat [T,F],
    last_feat_valid (i32), nid[1,1].
    chunk inputs: box[C,D,5], conf[C,D], valid_i32[C,D], feat[C,D,F],
    feat_valid_i32[C,D], quality[C,D], own_area[C,D], epoch0[1,1].
    """
    kernel = partial(_kernel, cfg, c_frames, k)
    tv5 = jax.ShapeDtypeStruct((t, 5), jnp.float32)
    tf32 = jax.ShapeDtypeStruct((t,), jnp.float32)
    ti32 = jax.ShapeDtypeStruct((t,), jnp.int32)
    tfeat = jax.ShapeDtypeStruct((t, f), jnp.float32)
    state_shapes = (
        [tv5] * 7 + [tf32] + [ti32] * 4
        + [tfeat] * k + [tf32] * k + [ti32] * k
        + [ti32, ti32, tfeat, ti32,
           jax.ShapeDtypeStruct((1, 1), jnp.int32)]
    )
    out_shapes = state_shapes + [
        jax.ShapeDtypeStruct((c_frames, d), jnp.int32),  # ids
        jax.ShapeDtypeStruct((c_frames, d), jnp.int32),  # slots
        jax.ShapeDtypeStruct((c_frames, d, 5), jnp.float32),  # pred boxes
        jax.ShapeDtypeStruct((c_frames, d), jnp.int32),  # voting type
        jax.ShapeDtypeStruct((c_frames, d), jnp.int32),  # is_new
        jax.ShapeDtypeStruct((c_frames, d), jnp.int32),  # length
        jax.ShapeDtypeStruct((c_frames, 1), jnp.int32),  # overflow flag
    ]
    n_state = len(state_shapes)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [vspec] * 7 + [sspec] + [vspec] * n_state
    in_specs[8 + n_state - 1] = sspec  # nid scalar lives in SMEM
    out_specs = [vspec] * n_state + [vspec] * 6 + [sspec]
    out_specs[n_state - 1] = sspec

    # VMEM budget: auction temporaries [D, D+T], K gallery planes (in+out),
    # the chunk's feature stream and the per-plane distance intermediates
    vmem_bytes = min(
        110 * 1024 * 1024,
        max(32 * 1024 * 1024,
            40 * d * (d + t) * 4
            + 4 * (2 * k + 4) * t * f
            + 8 * c_frames * d * (f + 32)),
    )

    def call(state_tuple, box, conf, valid, feat, fvalid, qual, oa, epoch0):
        return pl.pallas_call(
            kernel,
            out_shape=tuple(out_shapes),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            input_output_aliases={8 + i: i for i in range(n_state)},
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
            interpret=interpret,
        )(box, conf, valid, feat, fvalid, qual, oa, epoch0, *state_tuple)

    return call


def state_to_tuple(state: VisualState):
    k = state.gallery_size
    return (
        (state.kf.mean_pos, state.kf.mean_vel, state.kf.cpp, state.kf.cpv,
         state.kf.cvv, state.pred_box, state.obs_box, state.conf,
         state.active.astype(jnp.int32), state.last_epoch, state.length,
         state.track_id)
        + tuple(state.feats[:, i, :].astype(jnp.float32) for i in range(k))
        + tuple(state.feat_quality[:, i] for i in range(k))
        + tuple(state.feat_valid[:, i].astype(jnp.int32) for i in range(k))
        + (state.collected, state.voting_type,
           state.hist_feat[:, 0, :].astype(jnp.float32),
           state.hist_feat_valid[:, 0].astype(jnp.int32),
           jnp.reshape(state.next_id, (1, 1)))
    )


def tuple_to_state(tup, template: VisualState) -> VisualState:
    from .kalman import KalmanState

    k = template.gallery_size
    (mp, mv, cpp, cpv, cvv, pred, obs, tconf, active, last, length,
     tid) = tup[:12]
    gf = tup[12:12 + k]
    gq = tup[12 + k:12 + 2 * k]
    gvv = tup[12 + 2 * k:12 + 3 * k]
    coll, vt, lastf, lastfv, nid = tup[12 + 3 * k:]
    fdt = template.feats.dtype
    return dataclasses.replace(
        template,
        kf=KalmanState(mp, mv, cpp, cpv, cvv),
        pred_box=pred, obs_box=obs, conf=tconf,
        active=active > 0, last_epoch=last, length=length, track_id=tid,
        hist_obs=obs[:, None, :], hist_pred=pred[:, None, :],
        hist_conf=tconf[:, None],
        next_id=nid[0, 0],
        feats=jnp.stack(gf, axis=1).astype(fdt),
        feat_quality=jnp.stack(gq, axis=1),
        feat_valid=jnp.stack(gvv, axis=1) > 0,
        collected=coll, voting_type=vt,
        hist_feat=lastf[:, None, :].astype(template.hist_feat.dtype),
        hist_feat_valid=(lastfv > 0)[:, None],
    )


@lru_cache(maxsize=None)
def compiled_pallas_visual_scan(cfg: VisualConfig, chunk: int,
                                interpret: bool = False):
    """Scan-of-chunks pipeline matching `compiled_visual_scan` semantics
    (aligned-IoU or Mahalanobis positional metric, spatio-temporal
    constraints, history 1; own-area shares, if gated on, must arrive
    precomputed in the stream)."""
    assert not cfg.oriented, "rotated boxes use the XLA engine"
    gates_on = cfg.own_area_use > 0.0 or cfg.own_area_collect > 0.0
    assert not (gates_on and cfg.own_area_backend == "device"), (
        "fused kernel takes precomputed own-area shares (host backend)")

    def run(state: VisualState, det_box, det_conf, det_valid, det_feat,
            det_feat_valid, det_quality, det_own_area, epoch0):
        s, d, _ = det_box.shape
        assert s % chunk == 0, "steps must be a multiple of the chunk size"
        assert state.history == 1, "fused kernel supports history depth 1"
        t = state.capacity
        k = state.gallery_size
        f = state.feature_dim
        call = pallas_visual_chunk(cfg, chunk, d, t, k, f, interpret)

        nb = s // chunk
        boxes = det_box.reshape(nb, chunk, d, 5)
        confs = det_conf.reshape(nb, chunk, d)
        valids = det_valid.astype(jnp.int32).reshape(nb, chunk, d)
        feats = det_feat.astype(jnp.float32).reshape(nb, chunk, d, f)
        fvalids = det_feat_valid.astype(jnp.int32).reshape(nb, chunk, d)
        quals = det_quality.reshape(nb, chunk, d)
        oas = det_own_area.reshape(nb, chunk, d)

        def body(carry, inp):
            st, e0 = carry
            b, c, v, ft, fl, q, o = inp
            outs = call(st, b, c, v, ft, fl, q, o, jnp.reshape(e0, (1, 1)))
            n_state = len(st)
            st2 = tuple(outs[:n_state])
            frame_outs = outs[n_state:]
            return (st2, e0 + chunk), frame_outs

        (st2, _), (ids, slots, pred, vt, newf, length, ovf) = jax.lax.scan(
            body, (state_to_tuple(state), epoch0),
            (boxes, confs, valids, feats, fvalids, quals, oas),
        )
        new_state = tuple_to_state(st2, state)
        return new_state, (
            ids.reshape(s, d), slots.reshape(s, d), pred.reshape(s, d, 5),
            vt.reshape(s, d), newf.reshape(s, d), length.reshape(s, d),
            ovf.reshape(s) > 0,
        )

    return jax.jit(run, donate_argnums=(0,))
