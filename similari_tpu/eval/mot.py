"""MOTChallenge-format IO + tracker runners.

Mirrors the reference kit (`/root/reference/python/motchallenge/`): csv
readers/writers for the MOT det/gt format, a unified `Tracker` interface, and
sequence runners for both the interactive API and the device-resident scan
pipeline (one device roundtrip per sequence).
"""

from __future__ import annotations

import csv
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..trackers import PositionalMetricType, Sort
from ..trackers.sort_step import SortConfig, compiled_sort_scan
from ..trackers.state import new_sort_state
from ..utils.pad import pad_pow2 as _pad_pow2

Detections = Dict[int, List[Tuple[float, float, float, float, float]]]


def read_detections(file_path) -> Detections:
    """MOT csv rows: frame, id, left, top, width, height, conf, x, y, z."""
    frame_detections: Detections = {}
    with open(file_path, "r") as f:
        for row in csv.reader(f):
            frame = int(row[0])
            frame_detections.setdefault(frame, []).append(
                tuple(map(float, row[2:7]))
            )
    return frame_detections


def read_gt(file_path) -> Dict[int, List[Tuple[int, float, float, float, float]]]:
    out: Dict[int, List] = {}
    with open(file_path, "r") as f:
        for row in csv.reader(f):
            frame = int(row[0])
            tid = int(row[1])
            l, t, w, h = map(float, row[2:6])
            out.setdefault(frame, []).append((tid, l, t, w, h))
    return out


def write_csv(file_path, rows):
    with open(file_path, "w", newline="") as f:
        csv.writer(f, lineterminator="\n").writerows(rows)


def ltwh_to_vec5(dets: np.ndarray) -> np.ndarray:
    """[N, >=4] LTWH (col 4, when present, = confidence) -> [N,5]
    (xc, yc, angle, aspect, height).

    Only an EXACTLY-6-column input is the oriented format
    (l, t, w, h, conf, angle — what `eval/synthetic.py` emits); wider rows
    (e.g. raw 10-column MOT det.txt lines) keep angle 0 rather than
    silently reading class-id/visibility columns as a rotation.
    """
    out = np.zeros((len(dets), 5), np.float32)
    out[:, 0] = dets[:, 0] + dets[:, 2] / 2.0
    out[:, 1] = dets[:, 1] + dets[:, 3] / 2.0
    if dets.shape[1] == 6:
        out[:, 2] = dets[:, 5]
    out[:, 3] = dets[:, 2] / np.maximum(dets[:, 3], 1e-6)
    out[:, 4] = dets[:, 3]
    return out


def vec5_to_ltwh(v: np.ndarray) -> np.ndarray:
    out = np.zeros((len(v), 4), np.float32)
    w = v[:, 3] * v[:, 4]
    out[:, 0] = v[:, 0] - w / 2.0
    out[:, 1] = v[:, 1] - v[:, 4] / 2.0
    out[:, 2] = w
    out[:, 3] = v[:, 4]
    return out


def run_sequence_interactive(
    tracker: Sort, detections: Detections
) -> Dict[int, List[Tuple[int, float, float, float, float]]]:
    """Frame-by-frame run via the interactive array API.

    Frame-number gaps advance the epoch clock (`skip_epochs`) so idle aging
    matches a run that steps every frame.
    """
    out: Dict[int, List] = {}
    prev = None
    for frame in sorted(detections):
        if prev is not None and frame - prev > 1:
            tracker.skip_epochs_for_scene(0, int(frame - prev - 1))
        prev = frame
        dets = np.asarray(detections[frame], np.float32)
        boxes = ltwh_to_vec5(dets)
        confs = np.clip(dets[:, 4], 0.0, 1.0).astype(np.float32)
        _, ids, pred, _, _ = tracker.predict_arrays(0, boxes, confs)
        ltwh = vec5_to_ltwh(pred)
        out[frame] = [
            (int(ids[i]), *map(float, ltwh[i])) for i in range(len(ids))
        ]
    return out


def run_sequence_interactive_visual(
    tracker, detections: Detections, features: Dict[int, List],
    qualities: Optional[Dict[int, List[float]]] = None,
) -> Dict[int, List[Tuple[int, float, float, float, float]]]:
    """Frame-by-frame VisualSORT run via `VisualSort.predict_arrays`.

    `features[frame][i]` aligns with `detections[frame][i]` (None = no
    ReID); reports the OBSERVED box per track id, matching
    `run_sequence_device_visual`'s `report_observed=True` default.
    """
    out: Dict[int, List] = {}
    prev = None
    for frame in sorted(detections):
        if prev is not None and frame - prev > 1:
            tracker.skip_epochs_for_scene(0, int(frame - prev - 1))
        prev = frame
        dets = np.asarray(detections[frame], np.float32)
        boxes = ltwh_to_vec5(dets)
        confs = np.clip(dets[:, 4], 0.0, 1.0).astype(np.float32)
        frow = features.get(frame, [])
        fdim = max((len(x) for x in frow if x is not None), default=1)
        feat = np.zeros((len(dets), fdim), np.float32)
        fvalid = np.zeros((len(dets),), bool)
        for i, fv in enumerate(frow[: len(dets)]):
            if fv is not None:
                feat[i, : len(fv)] = fv
                fvalid[i] = True
        qual = np.ones((len(dets),), np.float32)
        if qualities is not None:
            q = qualities.get(frame, [])[: len(dets)]
            qual[: len(q)] = q
        _, ids, _pred, _, _, _ = tracker.predict_arrays(
            0, boxes, confs, feat, fvalid, qual)
        ltwh = np.asarray(detections[frame], np.float32)[:, :4]
        out[frame] = [
            (int(ids[i]), *map(float, ltwh[i])) for i in range(len(ids))
        ]
    return out


def _epochs_of(frames) -> np.ndarray:
    """Per-frame epochs = the actual frame numbers, rebased to start at 1.

    Using real frame numbers (not the stream index) makes empty-frame GAPS
    age tracks exactly like stepping every frame would — `max_idle_epochs`
    is defined in epochs (`epoch_db.rs:51-65`), and a 10-frame gap must be
    10 epochs, not 1.
    """
    f = np.asarray(frames, np.int64)
    return (f - f[0] + 1).astype(np.int32)


def _expand_gaps(frames, arrays):
    """Expand a frame-compressed stream to the dense frame range by inserting
    all-invalid rows for missing frames (for engines that require
    consecutive epochs, e.g. the fused Pallas scans).  Returns
    (dense_index_of_frame[S], expanded arrays)."""
    f = np.asarray(frames, np.int64)
    span = int(f[-1] - f[0] + 1)
    if span == len(f):
        return np.arange(len(f)), arrays
    if span > 8 * len(f) + 4096:
        raise ValueError(
            f"frame range {span} is far sparser than the {len(f)} detection "
            "frames; use engine=\"xla\" (per-frame epochs) instead of gap "
            "expansion")
    pos = (f - f[0]).astype(np.int64)
    out = []
    for a in arrays:
        e = np.zeros((span,) + a.shape[1:], a.dtype)
        e[pos] = a
        out.append(e)
    return pos, out


def _assemble_outputs(frames, valid, box, pred, ids, report_observed):
    out: Dict[int, List] = {}
    for s, f in enumerate(frames):
        n = int(valid[s].sum())
        src = box[s, :n] if report_observed else pred[s, :n]
        ltwh = vec5_to_ltwh(src)
        out[f] = [(int(ids[s, i]), *map(float, ltwh[i])) for i in range(n)]
    return out


def _check_overflow(overflow, capacity: int) -> None:
    """Raise if any scanned frame overflowed the static track capacity.

    With `recycle_idle=True` capacity bounds *live* tracks; an overflow then
    means the scene genuinely held more simultaneous tracks than `capacity`
    and silent drops would corrupt accuracy numbers — fail loudly so the
    caller can grow capacity and retry.
    """
    flags = np.asarray(overflow)
    if flags.any():
        first = int(np.argmax(flags))
        raise RuntimeError(
            f"track store overflow at frame index {first}: more live tracks "
            f"than capacity={capacity}; re-run with a larger capacity"
        )


def run_sequence_device(
    detections: Detections,
    method: str = "iou",
    iou_threshold: float = 0.3,
    max_idle_epochs: int = 5,
    capacity: int = 512,
    report_observed: bool = False,
    engine: str = "xla",
    assignment: str = "auction",
    recycle_idle: bool = True,
) -> Tuple[Dict[int, List[Tuple[int, float, float, float, float]]], float]:
    """Whole-sequence device pipeline: one transfer in, one scan, one out.

    `detections` may also be a path to a MOT det csv, in which case the
    native C++ loader (`native.load_sequence_soa`, one pass over the file
    bytes) produces the padded SoA buffers directly.

    engine="pallas" runs the fused SORT-on-chip kernel (`ops/pallas_sort.py`,
    state VMEM-resident across a frame chunk — the fastest single-scene SORT
    path since the round-3 hardening, ×1.1-1.2 over the XLA scan on v5e;
    aligned IoU only); "xla" is the general default.  Both are id-exact.

    Returns (per-frame outputs, frames/sec of pure device time).
    """
    import jax
    import jax.numpy as jnp

    if isinstance(detections, (str, Path)):
        from ..native import load_sequence_soa

        frames_arr, box, conf, valid = load_sequence_soa(detections)
        frames = frames_arr.tolist()
        steps = len(frames)
        conf = np.clip(conf, 0.0, 1.0) * valid
    else:
        frames = sorted(detections)
        steps = len(frames)
        if steps == 0:
            return {}, 0.0
        dpad = _pad_pow2(max(len(detections[f]) for f in frames))
        box = np.zeros((steps, dpad, 5), np.float32)
        conf = np.zeros((steps, dpad), np.float32)
        valid = np.zeros((steps, dpad), bool)
        for s, f in enumerate(frames):
            dets = np.asarray(detections[f], np.float32)
            n = len(dets)
            box[s, :n] = ltwh_to_vec5(dets)
            conf[s, :n] = np.clip(dets[:, 4], 0.0, 1.0)
            valid[s, :n] = True
    if steps == 0:
        return {}, 0.0

    cfg = SortConfig(
        method=method,
        iou_threshold=iou_threshold,
        max_idle_epochs=max_idle_epochs,
        assignment=assignment,
        oriented=False,  # MOT data is axis-aligned LTWH
        # default True: capacity bounds live tracks over long sequences
        recycle_idle=recycle_idle,
    )
    state = new_sort_state(capacity, 1)
    if engine == "pallas":
        import jax

        from ..ops.pallas_sort import compiled_pallas_sort_scan

        # the fused kernel's epoch clock is consecutive: expand frame GAPS
        # into all-invalid rows so idle aging matches real frame numbers
        pos, (box2, conf2, valid2) = _expand_gaps(frames, (box, conf, valid))
        span = len(box2)
        chunk = min(16, span) if span % 16 else 16
        pad = (-span) % chunk
        if pad:
            z = lambda a: np.concatenate(
                [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            box2, conf2, valid2 = z(box2), z(conf2), z(valid2)
        scan = compiled_pallas_sort_scan(
            cfg, chunk, interpret=jax.default_backend() == "cpu")
        args = (jnp.asarray(box2), jnp.asarray(conf2), jnp.asarray(valid2),
                jnp.int32(1))
        compiled = scan.lower(state, *args).compile()
        t0 = time.perf_counter()
        state, (kids, _slots, kpred, kovf) = compiled(state, *args)
        ids = np.asarray(kids)[pos]
        fps = steps / (time.perf_counter() - t0)
        _check_overflow(np.asarray(kovf)[:span], capacity)
        pred = np.asarray(kpred)[pos]
    else:
        scan = compiled_sort_scan(cfg)
        bj, cj, vj = jnp.asarray(box), jnp.asarray(conf), jnp.asarray(valid)
        epochs = jnp.asarray(_epochs_of(frames))  # gaps age tracks
        # AOT-compile so the timed run (fresh state) excludes it
        compiled = scan.lower(state, bj, cj, vj, epochs).compile()
        t0 = time.perf_counter()
        state, outs = compiled(state, bj, cj, vj, epochs)
        # real d2h fetch: block_until_ready can return before execution on
        # the axon dev-TPU relay (ARCHITECTURE.md §6)
        ids = np.asarray(outs.track_id)
        fps = steps / (time.perf_counter() - t0)
        _check_overflow(outs.overflow, capacity)
        pred = np.asarray(outs.pred_box)
    out = _assemble_outputs(frames, valid, box, pred, ids, report_observed)
    return out, fps


def run_sequence_device_visual(
    detections: Detections,
    features: Dict[int, List],
    visual_kind: str = "cosine",
    visual_threshold: float = 0.5,
    minimal_track_length: int = 1,
    iou_threshold: float = 0.3,
    max_idle_epochs: int = 10,
    capacity: int = 512,
    gallery: int = 3,
    report_observed: bool = True,
    engine: str = "xla",
    assignment: str = "auction",
    feature_precision: str = "bf16",
    qualities: Optional[Dict[int, List[float]]] = None,
    **cfg_overrides,
) -> Tuple[Dict[int, List[Tuple[int, float, float, float, float]]], float]:
    """VisualSORT whole-sequence device pipeline (detections + ReID features).

    `features[frame][i]` aligns with `detections[frame][i]`; None entries fall
    back to positional voting for that detection.  `qualities` optionally
    carries per-detection feature quality (default 1.0); detection rows may
    carry a 6th angle column (oriented scenarios) — pass oriented=True then.

    engine="pallas" runs the fused VisualSORT-on-chip kernel
    (`ops/pallas_visual.py`, state + gallery VMEM-resident — the fastest
    single-scene path, ×1.3-1.45 over the XLA step on v5e); "xla" is the
    general default.  Both are id-exact (property-tested parity).
    `assignment` picks the positional solver inside the cascade ("auction"
    on-device Jacobi vs "native"/"scipy" exact host JV), and remaining
    keyword args override `VisualConfig` fields directly (own-area gating,
    positional_kind, min_votes, ... — the adversarial-suite axes).
    """
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from ..trackers.visual_state import new_visual_state
    from ..trackers.visual_step import VisualConfig, compiled_visual_scan

    frames = sorted(detections)
    steps = len(frames)
    if steps == 0:
        return {}, 0.0
    fdim = max(
        (len(x) for f in frames for x in features.get(f, []) if x is not None),
        default=1,
    )
    dpad = _pad_pow2(max(len(detections[f]) for f in frames))
    box = np.zeros((steps, dpad, 5), np.float32)
    conf = np.zeros((steps, dpad), np.float32)
    valid = np.zeros((steps, dpad), bool)
    feat = np.zeros((steps, dpad, fdim), np.float32)
    fvalid = np.zeros((steps, dpad), bool)
    qual = np.ones((steps, dpad), np.float32)
    oa = np.ones((steps, dpad), np.float32)
    for s, f in enumerate(frames):
        dets = np.asarray(detections[f], np.float32)
        n = len(dets)
        box[s, :n] = ltwh_to_vec5(dets)
        conf[s, :n] = np.clip(dets[:, 4], 0.0, 1.0)
        valid[s, :n] = True
        for i, fv in enumerate(features.get(f, [])[:n]):
            if fv is not None:
                feat[s, i, : len(fv)] = fv
                fvalid[s, i] = True
        if qualities is not None:
            q = qualities.get(f, [])[:n]
            qual[s, : len(q)] = q

    cfg = VisualConfig(
        positional_kind="iou",
        iou_threshold=iou_threshold,
        visual_kind=visual_kind,
        visual_threshold=visual_threshold,
        visual_minimal_track_length=minimal_track_length,
        max_idle_epochs=max_idle_epochs,
        assignment=assignment,
        oriented=False,
        feature_precision=feature_precision,
        recycle_idle=True,
    )
    if cfg_overrides:
        cfg = _dc.replace(cfg, **cfg_overrides)
    # host own-area backend: the shares must be precomputed per frame with
    # the exact f64 polygon oracle (the device backend computes them inside
    # the jitted step and ignores `oa`)
    if (cfg.own_area_use > 0.0 or cfg.own_area_collect > 0.0) and \
            cfg.own_area_backend == "host":
        from ..utils.bbox import Universal2DBox
        from ..utils.clipping import (
            exclusively_owned_areas_normalized_shares,
        )

        for s, f in enumerate(frames):
            n = int(valid[s].sum())
            boxes = [Universal2DBox.from_vec5(box[s, i], float(conf[s, i]))
                     for i in range(n)]
            oa[s, :n] = exclusively_owned_areas_normalized_shares(boxes)
    state = new_visual_state(capacity, 1, gallery, fdim)
    if engine == "pallas":
        from ..ops.pallas_visual import compiled_pallas_visual_scan

        # consecutive-epoch kernel: expand frame GAPS into invalid rows so
        # idle aging matches real frame numbers
        pos, (box2, conf2, valid2, feat2, fvalid2, qual2, oa2) = _expand_gaps(
            frames, (box, conf, valid, feat, fvalid, qual, oa))
        span = len(box2)
        chunk = min(16, span) if span % 16 else 16
        pad = (-span) % chunk  # pad with all-invalid trailing frames
        if pad:
            z = lambda a: np.concatenate(
                [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            box2, conf2, valid2 = z(box2), z(conf2), z(valid2)
            feat2, fvalid2, qual2, oa2 = z(feat2), z(fvalid2), z(qual2), z(oa2)
        # Mosaic kernels need interpret mode on the CPU backend (tests)
        scan = compiled_pallas_visual_scan(
            cfg, chunk, interpret=jax.default_backend() == "cpu")
        args = (
            jnp.asarray(box2), jnp.asarray(conf2), jnp.asarray(valid2),
            jnp.asarray(feat2), jnp.asarray(fvalid2), jnp.asarray(qual2),
            jnp.asarray(oa2), jnp.int32(1),
        )
        compiled = scan.lower(state, *args).compile()
        t0 = time.perf_counter()
        state, (kids, _slots, kpred, _vt, _new, _len, ovf) = compiled(
            state, *args)
        # real d2h fetch (block_until_ready is unreliable on the axon relay)
        ids_all = np.asarray(kids)
        fps = steps / (time.perf_counter() - t0)
        _check_overflow(ovf, capacity)
        ids = ids_all[pos]
        pred = np.asarray(kpred)[pos]
    else:
        scan = compiled_visual_scan(cfg)
        epochs = jnp.asarray(_epochs_of(frames))  # gaps age tracks
        args = (
            jnp.asarray(box), jnp.asarray(conf), jnp.asarray(valid),
            jnp.asarray(feat), jnp.asarray(fvalid), jnp.asarray(qual),
            jnp.asarray(oa), epochs,
        )
        compiled = scan.lower(state, *args).compile()
        t0 = time.perf_counter()
        state, outs = compiled(state, *args)
        ids = np.asarray(outs.track_id)
        fps = steps / (time.perf_counter() - t0)
        _check_overflow(outs.overflow, capacity)
        pred = np.asarray(outs.pred_box)
    return _assemble_outputs(frames, valid, box, pred, ids,
                             report_observed), fps
