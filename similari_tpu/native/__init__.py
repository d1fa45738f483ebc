"""Native (C++) runtime components with build-on-first-use + ctypes bindings.

Compiled with the system toolchain into a cached shared library; every entry
point has a pure-Python/scipy fallback, so the package works without a
compiler (`available()` reports which path is active).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional

import numpy as np

_SRCS = [
    Path(__file__).parent / "lap.cpp",
    Path(__file__).parent / "motloader.cpp",
    Path(__file__).parent / "sortstep.cpp",
    Path(__file__).parent / "nms.cpp",
    Path(__file__).parent / "visualstep.cpp",
]
_HDRS = [Path(__file__).parent / "kf.h", Path(__file__).parent / "clip.h"]
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    try:
        src = "".join(s.read_text() for s in _SRCS + _HDRS)
    except OSError:  # sources missing from the install -> pure-Python paths
        return None
    tag = hashlib.sha256(src.encode()).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("SIMILARI_TPU_CACHE", Path.home() / ".cache" / "similari_tpu")
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    # cache key includes the machine so a shared cache (NFS home) never
    # serves -march=native code across heterogeneous hosts
    import platform as _platform

    lib_path = cache_dir / (
        f"libsimilari_native_{tag}_{_platform.machine()}.so"
    )
    if not lib_path.exists():
        # pid-unique temp + atomic replace: concurrent first-use builds
        # (e.g. parallel pytest workers) must not interleave into one file
        tmp = f"{lib_path}.{os.getpid()}.tmp"
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3",
            "-march=native",
            "-shared",
            "-fPIC",
            "-std=c++17",
            "-pthread",
            "-I", str(Path(__file__).parent),
            *[str(s) for s in _SRCS],
            "-o",
            tmp,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, lib_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(lib_path))
    except OSError:
        return None
    lib.lap_solve_max.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.lap_solve_max.restype = ctypes.c_int
    lib.lap_solve_batch_max.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int,
    ]
    lib.lap_solve_batch_max.restype = ctypes.c_int
    lib.mot_load.argtypes = [ctypes.c_char_p]
    lib.mot_load.restype = ctypes.c_void_p
    lib.mot_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.mot_frames.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.mot_fill.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.mot_free.argtypes = [ctypes.c_void_p]
    F = ctypes.POINTER(ctypes.c_float)
    I = ctypes.POINTER(ctypes.c_int32)
    U8 = ctypes.POINTER(ctypes.c_uint8)
    lib.sort_step_host.argtypes = [
        ctypes.c_int, ctypes.c_int,  # method, oriented
        ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, F, ctypes.c_int,
        F, F, F, F, F,  # kf
        F, F,  # pred/obs box
        F, U8, I, I, I,  # conf, active, last_epoch, length, track_id
        F, F, F,  # histories
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # T, H, next_id
        F, F, ctypes.c_int, ctypes.c_int,  # det_box, det_conf, D, epoch
        I, I, U8, F, I, I,  # outputs
    ]
    lib.sort_step_host.restype = ctypes.c_int
    lib.kf_box_sequence.argtypes = [
        F, ctypes.c_int, ctypes.c_float, ctypes.c_float, F]
    lib.kf_box_sequence.restype = ctypes.c_int
    lib.kf_point_sequence.argtypes = [
        F, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float, F]
    lib.kf_point_sequence.restype = ctypes.c_int
    lib.rotated_iou_pairs.argtypes = [F, F, ctypes.c_int, F]
    lib.rotated_iou_pairs.restype = ctypes.c_int
    lib.nms_host.argtypes = [F, ctypes.c_int, ctypes.c_float, ctypes.c_int, U8]
    lib.nms_host.restype = ctypes.c_int
    lib.nms_host_batch.argtypes = [
        F, ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int, U8]
    lib.nms_host_batch.restype = ctypes.c_int
    lib.visual_step_host.argtypes = [
        F, I, F,  # fcfg, icfg, constraints
        F, F, F, F, F,  # kf
        F, F, F,  # pred/obs/conf
        U8, I, I, I,  # active, last, length, tid
        F, F, U8, I, I,  # feats, feat_quality, feat_valid, collected, vt
        F, F, F, F, U8,  # histories
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        F, F, F, U8, F, F,  # detections
        F, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # dmat, dmat_cols, D, epoch
        I, I, U8, F, I, I, I,  # outputs
    ]
    lib.visual_step_host.restype = ctypes.c_int
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def lap_max(weights: np.ndarray) -> np.ndarray:
    """Exact maximization LAP: weights[R, C] (R <= C) -> col per row [R]."""
    lib = _get_lib()
    w = np.ascontiguousarray(weights, np.float32)
    r, c = w.shape
    out = np.zeros((r,), np.int32)
    if lib is None:
        from scipy.optimize import linear_sum_assignment

        rows, cols = linear_sum_assignment(w, maximize=True)
        out[rows] = cols.astype(np.int32)
        return out
    err = lib.lap_solve_max(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        r,
        c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if err:
        raise RuntimeError(f"lap_solve_max failed: {err}")
    return out


def lap_max_batch(weights: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Batched exact LAP: weights[B, R, C] -> cols [B, R] (thread pool)."""
    lib = _get_lib()
    w = np.ascontiguousarray(weights, np.float32)
    b, r, c = w.shape
    out = np.zeros((b, r), np.int32)
    if lib is None:
        for i in range(b):
            out[i] = lap_max(w[i])
        return out
    err = lib.lap_solve_batch_max(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b,
        r,
        c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    if err:
        raise RuntimeError(f"lap_solve_batch_max failed: {err}")
    return out


def sort_step_available() -> bool:
    lib = _get_lib()
    return lib is not None and hasattr(lib, "sort_step_host")


class SortStepSession:
    """Per-store native step with prebuilt ctypes arguments.

    The 24 state pointers and 9 config scalars never change between calls
    (state columns are mutated in place; the buffers only move on `grow`, at
    which point the caller rebuilds the session), so per-call work is just
    the two detection pointers, scalars, and output buffers.
    """

    __slots__ = ("_lib", "_pre", "_cons", "_state", "_outbufs", "_outcap")

    def __init__(self, cfg, state):
        self._lib = _get_lib()
        assert self._lib is not None
        F = ctypes.POINTER(ctypes.c_float)
        U8 = ctypes.POINTER(ctypes.c_uint8)
        I = ctypes.POINTER(ctypes.c_int32)

        def f(a):
            assert a.flags.c_contiguous, "state leaves must be C-contiguous"
            return a.ctypes.data_as(F)

        def ip(a):
            assert a.flags.c_contiguous, "state leaves must be C-contiguous"
            return a.ctypes.data_as(I)

        cons = np.ascontiguousarray(
            np.asarray(sorted(cfg.constraints), np.float32).reshape(-1)) \
            if cfg.constraints else np.zeros((0,), np.float32)
        self._cons = cons  # keep alive (ctypes holds a raw pointer)
        self._pre = (
            0 if cfg.method == "iou" else 1,
            1 if cfg.oriented else 0,
            cfg.iou_threshold, cfg.min_confidence, cfg.max_idle_epochs,
            cfg.position_weight, cfg.velocity_weight, cfg.new_track_threshold,
            f(cons), len(cfg.constraints),
            f(state.kf.mean_pos), f(state.kf.mean_vel), f(state.kf.cpp),
            f(state.kf.cpv), f(state.kf.cvv),
            f(state.pred_box), f(state.obs_box),
            f(state.conf), state.active.ctypes.data_as(U8),
            ip(state.last_epoch), ip(state.length), ip(state.track_id),
            f(state.hist_obs), f(state.hist_pred), f(state.hist_conf),
            state.capacity, state.history,
        )
        self._state = state  # keep buffers alive (ctypes holds raw pointers)
        self._outcap = 0
        self._outbufs = None

    def _outs(self, d):
        if d > self._outcap:
            cap = max(16, 1 << (d - 1).bit_length())
            F = ctypes.POINTER(ctypes.c_float)
            I = ctypes.POINTER(ctypes.c_int32)
            U8 = ctypes.POINTER(ctypes.c_uint8)
            bufs = (
                np.empty((cap,), np.int32), np.empty((cap,), np.int32),
                np.empty((cap,), np.uint8), np.empty((cap, 5), np.float32),
                np.empty((cap,), np.int32), np.empty((1,), np.int32),
            )
            ptrs = (
                bufs[0].ctypes.data_as(I), bufs[1].ctypes.data_as(I),
                bufs[2].ctypes.data_as(U8), bufs[3].ctypes.data_as(F),
                bufs[4].ctypes.data_as(I), bufs[5].ctypes.data_as(I),
            )
            self._outbufs = (bufs, ptrs)
            self._outcap = cap
        return self._outbufs

    def step(self, det_box, det_conf, epoch: int, next_id: int):
        """Returns (nid, slot, track_id, is_new, pred_box, length); the
        array views are into reused buffers — copy if kept across calls."""
        d = det_box.shape[0]
        if not det_box.flags.c_contiguous or det_box.dtype != np.float32:
            det_box = np.ascontiguousarray(det_box, np.float32)
        if not det_conf.flags.c_contiguous or det_conf.dtype != np.float32:
            det_conf = np.ascontiguousarray(det_conf, np.float32)
        (o_slot, o_id, o_new, o_pred, o_len, o_nid), optrs = self._outs(d)
        F = ctypes.POINTER(ctypes.c_float)
        rc = self._lib.sort_step_host(
            *self._pre, next_id,
            det_box.ctypes.data_as(F), det_conf.ctypes.data_as(F), d, epoch,
            *optrs,
        )
        if rc == 1:
            raise RuntimeError("track store overflow")
        if rc:
            raise RuntimeError(f"sort_step_host failed: {rc}")
        # copies: the buffers are reused next call; callers own the results
        return (int(o_nid[0]), o_slot[:d].copy(), o_id[:d].copy(),
                o_new[:d].astype(bool), o_pred[:d].copy(), o_len[:d].copy())


def sort_step_host(cfg, state, det_box, det_conf, epoch: int):
    """Full SORT epoch in one native call (see sortstep.cpp).

    Mutates the np-leaf `state` in place; returns
    (next_id, slot, track_id, is_new, pred_box, length) or None when the
    native library is unavailable (caller falls back to the NumPy step).
    Raises on capacity overflow (callers grow preemptively).
    """
    lib = _get_lib()
    if lib is None:
        return None
    d = det_box.shape[0]
    F = ctypes.POINTER(ctypes.c_float)
    I = ctypes.POINTER(ctypes.c_int32)
    U8 = ctypes.POINTER(ctypes.c_uint8)

    def f(a):
        return a.ctypes.data_as(F)

    def ip(a):
        return a.ctypes.data_as(I)

    cons = np.asarray(
        sorted(cfg.constraints), np.float32).reshape(-1) if cfg.constraints \
        else np.zeros((0,), np.float32)
    det_box = np.ascontiguousarray(det_box, np.float32)
    det_conf = np.ascontiguousarray(det_conf, np.float32)
    out_slot = np.empty((d,), np.int32)
    out_id = np.empty((d,), np.int32)
    out_new = np.empty((d,), np.uint8)
    out_pred = np.empty((d, 5), np.float32)
    out_len = np.empty((d,), np.int32)
    out_nid = np.empty((1,), np.int32)
    rc = lib.sort_step_host(
        0 if cfg.method == "iou" else 1,
        1 if cfg.oriented else 0,
        cfg.iou_threshold, cfg.min_confidence, cfg.max_idle_epochs,
        cfg.position_weight, cfg.velocity_weight, cfg.new_track_threshold,
        f(cons), len(cfg.constraints),
        f(state.kf.mean_pos), f(state.kf.mean_vel), f(state.kf.cpp),
        f(state.kf.cpv), f(state.kf.cvv),
        f(state.pred_box), f(state.obs_box),
        f(state.conf), state.active.ctypes.data_as(U8),
        ip(state.last_epoch), ip(state.length), ip(state.track_id),
        f(state.hist_obs), f(state.hist_pred), f(state.hist_conf),
        state.capacity, state.history, int(state.next_id),
        f(det_box), f(det_conf), d, epoch,
        ip(out_slot), ip(out_id), out_new.ctypes.data_as(U8),
        f(out_pred), ip(out_len), ip(out_nid),
    )
    if rc == 1:
        raise RuntimeError(
            f"track store overflow (capacity {state.capacity})")
    if rc:
        raise RuntimeError(f"sort_step_host failed: {rc}")
    return (int(out_nid[0]), out_slot, out_id, out_new.astype(bool),
            out_pred, out_len)


def kf_box_sequence(z: np.ndarray, position_weight: float,
                    velocity_weight: float):
    """Bulk box-KF smoothing: z[N, 5] vec5 observations -> mean[N, 5]
    (initiate from row 0, then predict+update per row — the
    `benches/kalman_bbox.rs` loop in one native call).  Returns None when
    the native library is unavailable (caller falls back to the per-call
    Python filter)."""
    lib = _get_lib()
    if lib is None:
        return None
    z = np.ascontiguousarray(z, np.float32)
    n = z.shape[0]
    out = np.empty((n, 5), np.float32)
    F = ctypes.POINTER(ctypes.c_float)
    rc = lib.kf_box_sequence(
        z.ctypes.data_as(F), n, float(position_weight),
        float(velocity_weight), out.ctypes.data_as(F))
    if rc:
        raise RuntimeError(f"kf_box_sequence failed: {rc}")
    return out


def kf_point_sequence(z: np.ndarray, position_weight: float,
                      velocity_weight: float):
    """Bulk point-KF smoothing: z[N, 2] (or [N, P, 2] for P independent
    keypoint chains) -> filtered means of the same shape (initiate from
    row 0, then predict+update per row — the `benches/kalman_2d_point.rs`
    loop in one native call).  Returns None when the native library is
    unavailable (caller falls back to the per-call Python filter)."""
    lib = _get_lib()
    if lib is None:
        return None
    z = np.ascontiguousarray(z, np.float32)
    n = z.shape[0]
    p = 1 if z.ndim == 2 else int(np.prod(z.shape[1:-1], dtype=np.int64))
    out = np.empty_like(z)
    F = ctypes.POINTER(ctypes.c_float)
    rc = lib.kf_point_sequence(
        z.ctypes.data_as(F), n, p, float(position_weight),
        float(velocity_weight), out.ctypes.data_as(F))
    if rc:
        raise RuntimeError(f"kf_point_sequence failed: {rc}")
    return out


def rotated_iou_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotated IoU of a[i] vs b[i] over paired box rows [n, 5].

    Test/debug surface for the native f32 clip (native/clip.h): asserts the
    clip's float output to the ulp against the NumPy oracle
    (`trackers/host_geometry.py`) and across clip.h refactors.  Returns
    None when the native library is unavailable.
    """
    lib = _get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    assert a.shape == b.shape and a.ndim == 2 and a.shape[1] == 5
    out = np.empty((a.shape[0],), np.float32)
    F = ctypes.POINTER(ctypes.c_float)
    rc = lib.rotated_iou_pairs(
        a.ctypes.data_as(F), b.ctypes.data_as(F), a.shape[0],
        out.ctypes.data_as(F))
    if rc:
        raise RuntimeError(f"rotated_iou_pairs failed: {rc}")
    return out


def nms_available() -> bool:
    lib = _get_lib()
    return lib is not None and hasattr(lib, "nms_host")


def nms_host(boxes: np.ndarray, threshold: float, oriented: bool) -> np.ndarray:
    """Greedy NMS on rank-desc-sorted boxes[n, 5]; returns keep mask [n].

    Native scalar loop (nms.cpp); exact reference semantics.  Returns None
    when the native library is unavailable.
    """
    lib = _get_lib()
    if lib is None:
        return None
    b = np.ascontiguousarray(boxes, np.float32)
    n = len(b)
    keep = np.empty((n,), np.uint8)
    rc = lib.nms_host(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        float(threshold), int(bool(oriented)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc:
        raise RuntimeError(f"nms_host failed: {rc}")
    return keep.astype(bool)


def nms_host_batch(boxes: np.ndarray, threshold: float,
                   oriented: bool) -> np.ndarray:
    """Batched host NMS: boxes[b, n, 5] rank-sorted desc -> keep [b, n]."""
    lib = _get_lib()
    if lib is None:
        return None
    w = np.ascontiguousarray(boxes, np.float32)
    bb, n, _ = w.shape
    keep = np.empty((bb, n), np.uint8)
    rc = lib.nms_host_batch(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), bb, n,
        float(threshold), int(bool(oriented)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc:
        raise RuntimeError(f"nms_host_batch failed: {rc}")
    return keep.astype(bool)


def visual_step_available() -> bool:
    lib = _get_lib()
    return lib is not None and hasattr(lib, "visual_step_host")


# below this many madds the sgemm's gather+dispatch overhead loses to the
# in-step row-dot loop (measured crossover ~1-2 MFLOP on the 2-core host)
_DMAT_MIN_MADDS = 2_000_000


def _visual_dmat(max_idle_epochs, state, det_feat, epoch):
    """All-pairs gallery scoring as ONE BLAS sgemm over the ACTIVE columns.

    Replicates visualstep.cpp's cols rule (active && epoch - last_epoch <=
    max_idle, slot order) and returns (dmat[D, C*K] C-contig f32, C) — the
    C step cross-checks C and falls back with an error on divergence.
    Returns (None, -1) when the frame is too small for the sgemm to win.
    """
    mask = (state.active != 0) & (
        (np.int32(epoch) - state.last_epoch) <= max_idle_epochs)
    ncols = int(mask.sum())
    k = state.gallery_size
    if det_feat.shape[0] * ncols * k * state.feature_dim < _DMAT_MIN_MADDS:
        return None, -1
    flat = state.feats[mask].reshape(ncols * k, state.feature_dim)
    return det_feat @ flat.T, ncols


def visual_step_host(cfg, state, det_box, det_conf, det_feat, det_feat_valid,
                     det_quality, det_own_area, epoch: int):
    """Full VisualSORT epoch in one native call (visualstep.cpp).

    Mutates the np-leaf `state` in place; returns
    (next_id, slot, id, is_new, pred, length, voting_type) or None when the
    native library (or an f32 gallery) is unavailable.  Raises on overflow.
    """
    lib = _get_lib()
    if lib is None or state.feats.dtype != np.float32:
        return None
    d = det_box.shape[0]
    F = ctypes.POINTER(ctypes.c_float)
    I = ctypes.POINTER(ctypes.c_int32)
    U8 = ctypes.POINTER(ctypes.c_uint8)

    def f(a):
        assert a.flags.c_contiguous
        return a.ctypes.data_as(F)

    def ip(a):
        assert a.flags.c_contiguous
        return a.ctypes.data_as(I)

    def u8(a):
        assert a.flags.c_contiguous
        return a.ctypes.data_as(U8)

    fcfg = np.asarray([
        cfg.iou_threshold, cfg.positional_min_confidence,
        cfg.visual_threshold, cfg.visual_minimal_area,
        cfg.visual_minimal_quality_use, cfg.visual_minimal_quality_collect,
        cfg.own_area_use, cfg.own_area_collect,
        cfg.position_weight, cfg.velocity_weight, cfg.new_track_threshold,
    ], np.float32)
    icfg = np.asarray([
        0 if cfg.positional_kind == "iou" else 1,
        0 if cfg.visual_kind == "euclidean" else 1,
        cfg.visual_min_votes, cfg.visual_minimal_track_length,
        cfg.max_idle_epochs, len(cfg.constraints),
        1 if cfg.oriented else 0,
    ], np.int32)
    cons = np.ascontiguousarray(
        np.asarray(sorted(cfg.constraints), np.float32).reshape(-1)) \
        if cfg.constraints else np.zeros((0,), np.float32)
    det_box = np.ascontiguousarray(det_box, np.float32)
    det_conf = np.ascontiguousarray(det_conf, np.float32)
    det_feat = np.ascontiguousarray(det_feat, np.float32)
    dfv = np.ascontiguousarray(det_feat_valid, np.uint8)
    det_quality = np.ascontiguousarray(det_quality, np.float32)
    det_own_area = np.ascontiguousarray(det_own_area, np.float32)
    o_slot = np.empty((d,), np.int32)
    o_id = np.empty((d,), np.int32)
    o_new = np.empty((d,), np.uint8)
    o_pred = np.empty((d, 5), np.float32)
    o_len = np.empty((d,), np.int32)
    o_vt = np.empty((d,), np.int32)
    o_nid = np.empty((1,), np.int32)
    dmat, dmat_cols = _visual_dmat(cfg.max_idle_epochs, state, det_feat,
                                   epoch)
    rc = lib.visual_step_host(
        f(fcfg), ip(icfg), f(cons),
        f(state.kf.mean_pos), f(state.kf.mean_vel), f(state.kf.cpp),
        f(state.kf.cpv), f(state.kf.cvv),
        f(state.pred_box), f(state.obs_box), f(state.conf),
        u8(state.active), ip(state.last_epoch), ip(state.length),
        ip(state.track_id),
        f(state.feats), f(state.feat_quality), u8(state.feat_valid),
        ip(state.collected), ip(state.voting_type),
        f(state.hist_obs), f(state.hist_pred), f(state.hist_conf),
        f(state.hist_feat), u8(state.hist_feat_valid),
        state.capacity, state.history, state.gallery_size, state.feature_dim,
        int(state.next_id),
        f(det_box), f(det_conf), f(det_feat), u8(dfv), f(det_quality),
        f(det_own_area),
        f(dmat) if dmat is not None else ctypes.cast(None, F),
        dmat_cols, d, epoch,
        ip(o_slot), ip(o_id), u8(o_new), f(o_pred), ip(o_len), ip(o_vt),
        ip(o_nid),
    )
    if rc == 1:
        raise RuntimeError(
            f"track store overflow (capacity {state.capacity})")
    if rc:
        raise RuntimeError(f"visual_step_host failed: {rc}")
    return (int(o_nid[0]), o_slot, o_id, o_new.astype(bool), o_pred, o_len,
            o_vt)


class VisualStepSession:
    """Per-store native VisualSORT step with prebuilt ctypes arguments
    (same pattern as SortStepSession: state pointers never move between
    calls; the caller rebuilds the session on grow/engine switch)."""

    __slots__ = ("_lib", "_pre", "_keep", "_state", "_outbufs", "_outcap",
                 "_max_idle")

    def __init__(self, cfg, state):
        self._lib = _get_lib()
        assert self._lib is not None
        assert state.feats.dtype == np.float32
        F = ctypes.POINTER(ctypes.c_float)
        I = ctypes.POINTER(ctypes.c_int32)
        U8 = ctypes.POINTER(ctypes.c_uint8)

        def f(a):
            assert a.flags.c_contiguous
            return a.ctypes.data_as(F)

        def ip(a):
            assert a.flags.c_contiguous
            return a.ctypes.data_as(I)

        def u8(a):
            assert a.flags.c_contiguous
            return a.ctypes.data_as(U8)

        fcfg = np.asarray([
            cfg.iou_threshold, cfg.positional_min_confidence,
            cfg.visual_threshold, cfg.visual_minimal_area,
            cfg.visual_minimal_quality_use,
            cfg.visual_minimal_quality_collect,
            cfg.own_area_use, cfg.own_area_collect,
            cfg.position_weight, cfg.velocity_weight,
            cfg.new_track_threshold,
        ], np.float32)
        icfg = np.asarray([
            0 if cfg.positional_kind == "iou" else 1,
            0 if cfg.visual_kind == "euclidean" else 1,
            cfg.visual_min_votes, cfg.visual_minimal_track_length,
            cfg.max_idle_epochs, len(cfg.constraints),
            1 if cfg.oriented else 0,
        ], np.int32)
        cons = np.ascontiguousarray(
            np.asarray(sorted(cfg.constraints), np.float32).reshape(-1)) \
            if cfg.constraints else np.zeros((0,), np.float32)
        self._keep = (fcfg, icfg, cons, state)
        self._state = state
        self._max_idle = cfg.max_idle_epochs
        self._pre = (
            f(fcfg), ip(icfg), f(cons),
            f(state.kf.mean_pos), f(state.kf.mean_vel), f(state.kf.cpp),
            f(state.kf.cpv), f(state.kf.cvv),
            f(state.pred_box), f(state.obs_box), f(state.conf),
            u8(state.active), ip(state.last_epoch), ip(state.length),
            ip(state.track_id),
            f(state.feats), f(state.feat_quality), u8(state.feat_valid),
            ip(state.collected), ip(state.voting_type),
            f(state.hist_obs), f(state.hist_pred), f(state.hist_conf),
            f(state.hist_feat), u8(state.hist_feat_valid),
            state.capacity, state.history, state.gallery_size,
            state.feature_dim,
        )
        self._outcap = 0
        self._outbufs = None

    def _outs(self, d):
        if d > self._outcap:
            cap = max(16, 1 << (d - 1).bit_length())
            self._outbufs = (
                np.empty((cap,), np.int32), np.empty((cap,), np.int32),
                np.empty((cap,), np.uint8), np.empty((cap, 5), np.float32),
                np.empty((cap,), np.int32), np.empty((cap,), np.int32),
                np.empty((1,), np.int32),
            )
            self._outcap = cap
        return self._outbufs

    def step(self, det_box, det_conf, det_feat, det_feat_valid, det_quality,
             det_own_area, epoch: int, next_id: int):
        d = det_box.shape[0]
        F = ctypes.POINTER(ctypes.c_float)
        I = ctypes.POINTER(ctypes.c_int32)
        U8 = ctypes.POINTER(ctypes.c_uint8)
        # raw pointers into C: coerce dtype/layout like SortStepSession does
        det_box = np.ascontiguousarray(det_box, np.float32)
        det_conf = np.ascontiguousarray(det_conf, np.float32)
        det_feat = np.ascontiguousarray(det_feat, np.float32)
        det_quality = np.ascontiguousarray(det_quality, np.float32)
        det_own_area = np.ascontiguousarray(det_own_area, np.float32)
        dfv = np.ascontiguousarray(det_feat_valid, np.uint8)
        o_slot, o_id, o_new, o_pred, o_len, o_vt, o_nid = self._outs(d)
        # all-pairs gallery scoring as ONE BLAS sgemm (see _visual_dmat)
        dmat, dmat_cols = _visual_dmat(self._max_idle, self._state,
                                       det_feat, epoch)
        rc = self._lib.visual_step_host(
            *self._pre, next_id,
            det_box.ctypes.data_as(F), det_conf.ctypes.data_as(F),
            det_feat.ctypes.data_as(F), dfv.ctypes.data_as(U8),
            det_quality.ctypes.data_as(F), det_own_area.ctypes.data_as(F),
            dmat.ctypes.data_as(F) if dmat is not None
            else ctypes.cast(None, F),
            dmat_cols, d, epoch,
            o_slot.ctypes.data_as(I), o_id.ctypes.data_as(I),
            o_new.ctypes.data_as(U8), o_pred.ctypes.data_as(F),
            o_len.ctypes.data_as(I), o_vt.ctypes.data_as(I),
            o_nid.ctypes.data_as(I),
        )
        if rc == 1:
            raise RuntimeError("track store overflow")
        if rc:
            raise RuntimeError(f"visual_step_host failed: {rc}")
        # copies: the buffers are reused next call; callers own the results
        return (int(o_nid[0]), o_slot[:d].copy(), o_id[:d].copy(),
                o_new[:d].astype(bool), o_pred[:d].copy(), o_len[:d].copy(),
                o_vt[:d].copy())


def _load_sequence_soa_numpy(path):
    """Pure-Python fallback for `load_sequence_soa` (same output contract,
    incl. 6-column files whose missing conf parses as 1.0 — motloader.cpp)."""
    import csv as _csv

    parsed = []
    with open(path, "r") as fh:
        for r in _csv.reader(fh):
            if len(r) < 6:
                continue
            try:
                conf = float(r[6]) if len(r) > 6 and r[6] != "" else 1.0
                parsed.append((float(r[0]), float(r[1]), float(r[2]),
                               float(r[3]), float(r[4]), float(r[5]), conf))
            except ValueError:
                continue  # header/garbage line
    rows = np.asarray(parsed, np.float64).reshape(-1, 7)
    frames = np.unique(rows[:, 0].astype(np.int64))
    counts = {f: 0 for f in frames}
    for f in rows[:, 0].astype(np.int64):
        counts[f] += 1
    dmax = max(counts.values(), default=1)
    dpad = 8
    while dpad < dmax:
        dpad *= 2
    nf = len(frames)
    box = np.zeros((nf, dpad, 5), np.float32)
    conf = np.zeros((nf, dpad), np.float32)
    valid = np.zeros((nf, dpad), bool)
    index = {int(f): i for i, f in enumerate(frames)}
    cursor = np.zeros((nf,), np.int64)
    for r in rows:
        s = index[int(r[0])]
        i = cursor[s]
        cursor[s] += 1
        l, t, w, h = r[2], r[3], r[4], r[5]
        box[s, i] = (l + w / 2.0, t + h / 2.0, 0.0, w / max(h, 1e-6), h)
        conf[s, i] = r[6]
        valid[s, i] = True
    return frames.astype(np.int32), box, conf, valid


def load_sequence_soa(path):
    """Load a MOTChallenge det/gt CSV as padded SoA device buffers.

    One C++ pass over the file bytes (parse, frame grouping, LTWH->vec5,
    power-of-two padding); see `motloader.cpp`.  Returns
    (frames[F] int32 ascending, box[F, dpad, 5] vec5 f32, conf[F, dpad] f32
    raw, valid[F, dpad] bool) — exactly the layout `run_sequence_device`
    consumes.  Falls back to numpy when no compiler is available.
    """
    lib = _get_lib()
    if lib is None:
        return _load_sequence_soa_numpy(path)
    handle = lib.mot_load(str(path).encode())
    if not handle:
        raise FileNotFoundError(path)
    try:
        dims = (ctypes.c_int64 * 3)()
        lib.mot_dims(handle, dims)
        nf, dpad = int(dims[0]), int(dims[1])
        frames = np.zeros((nf,), np.int32)
        box = np.zeros((nf, dpad, 5), np.float32)
        conf = np.zeros((nf, dpad), np.float32)
        valid = np.zeros((nf, dpad), np.uint8)
        if nf:
            lib.mot_frames(
                handle, frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            )
            lib.mot_fill(
                handle,
                box.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                conf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
    finally:
        lib.mot_free(handle)
    return frames, box, conf, valid.astype(bool)
