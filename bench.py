#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Covers the full reference baseline matrix (`/root/reference/assets/benchmarks/
benchmarks.md`, mirrored in BASELINE.md): SORT at 10/100/500 objects (aligned
+ oriented, IoU + Mahalanobis), NMS at 100/500/1000 boxes, VisualSORT at
128/512/2048-d, the fused Pallas SORT kernel, and batch saturation sweeps
(64 -> 4096 scenes) for the multi-scene engines.  Tracking is measured as a
device-resident pipeline (`lax.scan` over the frame stream).

Timing methodology (IMPORTANT): on the axon dev-TPU tunnel,
`jax.block_until_ready` can return before the computation actually runs
(dispatch-only, lazily relayed), and every true sync costs a ~30 ms RTT.  The
only honest measurement is **differencing with real d2h fetches**: run the
same compiled pipeline twice at different total step counts, sync each run by
fetching one output element, and divide the time difference by the step-count
difference — RTT, dispatch, state-init and fetch overheads are
length-independent and cancel.  (Verified against the chip's known bf16 peak:
a 4096^3 matmul chain measures ~190 TFLOPS this way, vs physically impossible
numbers with block_until_ready-based timing.)

This revision differs k sequential *calls* of ONE compiled scan of length L
(state chained call-to-call, single fetch at the end) instead of compiling two
scan lengths — one tunnel compile per config instead of 2-6, which is what
makes the full matrix affordable.  L is sized so per-call device compute is
>= ~40 ms, keeping the per-call dispatch cost (sub-ms, async) below ~5%; the
bias is pessimistic (reported throughput slightly UNDER-estimates the chip).

FLOP accounting: each config reports achieved GFLOP/s and MFU from a static
per-step useful-work estimate (coefficients documented at `*_flops` below;
MFU is relative to the v5e 197 TFLOP/s bf16 MXU peak — an honest *lower
bound*; the VPU-dominated SORT/NMS configs are latency/recurrence-bound, see
ARCHITECTURE.md §6).

Wall-clock guard: the full matrix is the default.  If total time exceeds
BENCH_BUDGET seconds (default 2400) the remaining tail configs are SKIPPED
WITH A LOG LINE (never silently) — the headline sweep and core configs run
first.  BENCH_FAST=1 runs a small smoke subset.

Diagnostics go to stderr; stdout carries exactly one JSON line for the driver.
"""

import json
import os
import sys
import time

import numpy as np

# Reference baselines (FPS) from BASELINE.md / benchmarks.md
BASELINES = {
    "sort_iou_10": 9900.0,
    "sort_iou_100": 561.0,
    "sort_iou_500": 53.0,
    "sort_iou_oriented_100": 624.0,
    "sort_iou_oriented_500": 52.0,
    "sort_maha_100": 588.0,
    "sort_maha_oriented_100": 636.0,
    "batch_sort_iou_100": 618.0,
    "visual_sort_100x128": 262.0,
    "visual_sort_100x512": 173.0,
    "visual_sort_100x2048": 94.0,
    "nms_10": 632000.0,
    "nms_100": 6711.0,
    "nms_500": 250.0,
    "nms_1000": 72.0,
    "nms_oriented_10": 461000.0,
    "nms_oriented_100": 7100.0,
    "nms_oriented_300": 570.0,
    "nms_oriented_500": 218.0,
    "nms_oriented_1000": 54.0,
    "visual_sort_10x512": 2230.0,
    "visual_sort_50x512": 444.0,
    "visual_sort_100x256": 211.0,
    "visual_sort_100x1024": 133.0,
}

PEAK_BF16 = 197e12  # v5e single-chip bf16 MXU peak, FLOP/s


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Static per-step FLOP estimates (useful work, conservative).
# Coefficients: aligned IoU ~15 flops/pair; oriented Green's-theorem clip
# ~700 (ARCHITECTURE.md §3); Mahalanobis ~60 (5 decomposed 2x2 blocks);
# auction ~12 flops/cell/round x 3 unrolled rounds; one-hot state merge
# ~2*T*D MACs per SoA column (~45 columns); KF ~250 flops/det; gallery
# matmul 2*D*T*K*F MACs (bf16); NMS fixpoint ~8 rounds x 3 flops/cell.
# ---------------------------------------------------------------------------

def _pair_flops(method, oriented):
    if method == "maha":
        return 60.0
    return 700.0 if oriented else 15.0


def sort_step_flops(d, t, method, oriented):
    weights = d * t * _pair_flops(method, oriented)
    auction = 3 * d * t * 12.0
    kf = d * 250.0
    merge = 2 * t * d * 45.0
    return weights + auction + kf + merge


def visual_step_flops(d, t, k, f):
    gallery = 2.0 * d * t * k * f
    feat_merge = 2 * (2.0 * t * d * f)  # gallery lanes + history ring
    return gallery + feat_merge + sort_step_flops(d, t, "iou", False)


def nms_step_flops(n, oriented):
    return n * n * (_pair_flops("iou", oriented) + 8 * 3.0)


# ---------------------------------------------------------------------------
# Timing: chained-call differencing (one compile per config)
# ---------------------------------------------------------------------------

def per_step_time(run, base_len, k_small=1, k_big=8, reps=3, min_delta=0.25,
                  max_k=128):
    """Honest per-step seconds with ONE compiled scan of `base_len` steps.

    run(k) must execute k sequential calls of the compiled scan (state chained
    through) and end with one real d2h fetch.  k_big doubles (no recompile!)
    until the compute delta clears the tunnel-RTT noise floor.
    """
    import statistics

    run(k_small)  # compile
    while True:
        ts, tb = [], []
        for _ in range(reps):  # interleaved so RTT drift hits both equally
            ts.append(run(k_small))
            tb.append(run(k_big))
        t_s = statistics.median(ts)
        t_b = statistics.median(tb)
        if t_b - t_s >= min_delta or k_big >= max_k:
            if t_b - t_s < min_delta:
                log(f"  (warn: delta {t_b - t_s:.3f}s below noise floor at "
                    f"k={k_big}; value is noisier)")
            break
        k_big *= 2
    return (t_b - t_s) / ((k_big - k_small) * base_len)


def box_stream(steps, n, seed=42, spread=1000.0):
    """Random-walk box stream akin to the reference BoxGen2 (`examples.rs:188-249`)."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, spread, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(30, 60, size=(n, 2)).astype(np.float32)
    out = np.zeros((steps, n, 5), np.float32)
    for s in range(steps):
        xy += rng.uniform(-2, 2, size=xy.shape).astype(np.float32)
        wh += rng.uniform(-0.5, 0.5, size=wh.shape).astype(np.float32)
        out[s, :, 0] = xy[:, 0]
        out[s, :, 1] = xy[:, 1]
        out[s, :, 3] = wh[:, 0] / wh[:, 1]
        out[s, :, 4] = wh[:, 1]
    return out


# ---------------------------------------------------------------------------
# Workloads
# ---------------------------------------------------------------------------

def bench_sort_scan(method, n_objects, oriented, base_len):
    import jax.numpy as jnp

    from similari_tpu.trackers.sort_step import SortConfig, compiled_sort_scan
    from similari_tpu.trackers.state import new_sort_state

    cfg = SortConfig(method=method, assignment="auction", max_idle_epochs=5,
                     oriented=oriented)
    scan = compiled_sort_scan(cfg)
    s = box_stream(base_len, n_objects)
    if oriented:
        rng = np.random.default_rng(7)
        s[..., 2] = rng.uniform(0, 0.6, size=s.shape[:2])
    stream = jnp.asarray(s)
    conf = jnp.ones((base_len, n_objects), jnp.float32)
    valid = jnp.ones((base_len, n_objects), bool)

    def run(k):
        state = new_sort_state(4 * n_objects, 1)
        t0 = time.perf_counter()
        for i in range(k):
            state, out = scan(state, stream, conf, valid,
                              jnp.int32(1 + i * base_len))
        np.asarray(out.track_id[-1, 0])  # true sync
        return time.perf_counter() - t0

    fps = 1.0 / per_step_time(run, base_len)
    flops = sort_step_flops(n_objects, 4 * n_objects, method, oriented)
    return fps, flops


def bench_sort_pallas(n_objects, base_len, chunk=32):
    """The fused tracker-on-chip kernel (ops/pallas_sort.py), same workload
    as sort_iou_<n>."""
    import jax.numpy as jnp

    from similari_tpu.ops.pallas_sort import compiled_pallas_sort_scan
    from similari_tpu.trackers.sort_step import SortConfig
    from similari_tpu.trackers.state import new_sort_state

    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5,
                     oriented=False)
    scan = compiled_pallas_sort_scan(cfg, chunk)
    stream = jnp.asarray(box_stream(base_len, n_objects))
    conf = jnp.ones((base_len, n_objects), jnp.float32)
    valid = jnp.ones((base_len, n_objects), bool)

    def run(k):
        state = new_sort_state(4 * n_objects, 1)
        t0 = time.perf_counter()
        for i in range(k):
            state, (ids, _, _, _ovf) = scan(state, stream, conf, valid,
                                            jnp.int32(1 + i * base_len))
        np.asarray(ids[-1, 0])  # true sync
        return time.perf_counter() - t0

    fps = 1.0 / per_step_time(run, base_len)
    flops = sort_step_flops(n_objects, 4 * n_objects, "iou", False)
    return fps, flops


def bench_batch_sort_scan(n_scenes, n_objects, base_len, scene_chunk=0):
    import jax
    import jax.numpy as jnp

    from similari_tpu.parallel import (
        batched_sort_step_chunked,
        new_batched_state,
    )
    from similari_tpu.trackers.sort_step import SortConfig

    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5,
                     oriented=False)
    # scene_chunk > 0 runs the scene axis in lax.map chunks — measured
    # NEGATIVE at bench scales (the per-chunk state slice/update copies cost
    # more than the [S, D, T] temporaries they bound, ARCHITECTURE §4c)
    vstep = batched_sort_step_chunked(cfg, scene_chunk or n_scenes)

    def scan_body(states, det_box, det_conf, det_valid, epochs0):
        def body(st, inp):
            box, conf, valid, i = inp
            st, out = vstep(st, box, conf, valid, epochs0 + i)
            return st, (out.track_id, out.overflow)

        idx = jnp.arange(det_box.shape[0], dtype=jnp.int32)
        return jax.lax.scan(body, states, (det_box, det_conf, det_valid, idx))

    scan = jax.jit(scan_body)
    flat = box_stream(base_len, n_scenes * n_objects)
    stream = jnp.asarray(flat.reshape(base_len, n_scenes, n_objects, 5))
    conf = jnp.ones((base_len, n_scenes, n_objects), jnp.float32)
    valid = jnp.ones((base_len, n_scenes, n_objects), bool)

    def run(k):
        states = new_batched_state(n_scenes, 2 * n_objects, 1)
        t0 = time.perf_counter()
        for i in range(k):
            states, (ids, _ovf) = scan(states, stream, conf, valid,
                                       jnp.full((n_scenes,), 1 + i * base_len,
                                                jnp.int32))
        np.asarray(ids[-1, 0, 0])  # true sync
        return time.perf_counter() - t0

    scene_fps = n_scenes / per_step_time(run, base_len)
    flops = sort_step_flops(n_objects, 2 * n_objects, "iou", False)
    return scene_fps, flops


def bench_visual_scan(n_objects, feat_dim, base_len, gallery=3):
    """Single-scene VisualSORT at the reference bench scales.

    Features are a constant per-detection tensor re-fed every step (bounds
    the h2d transfer; the per-step compute shape is identical to a stream)."""
    import jax
    import jax.numpy as jnp

    from similari_tpu.trackers.visual_state import new_visual_state
    from similari_tpu.trackers.visual_step import VisualConfig, visual_step

    cfg = VisualConfig(
        positional_kind="iou", visual_kind="euclidean",
        visual_threshold=100.0, visual_minimal_track_length=3,
        max_idle_epochs=5, assignment="auction", oriented=False,
        feature_precision="bf16",
    )
    rng = np.random.default_rng(0)
    stream = jnp.asarray(box_stream(base_len, n_objects))
    feat = jnp.asarray(rng.normal(size=(n_objects, feat_dim)).astype(np.float32))
    ones = jnp.ones((n_objects,), jnp.float32)
    tru = jnp.ones((n_objects,), bool)

    @jax.jit
    def scan_fn(state, boxes, epoch0):
        def body(st, inp):
            b, i = inp
            st, out = visual_step(cfg, st, b, ones, tru, feat, tru, ones,
                                  ones, epoch0 + i)
            return st, out.track_id
        idx = jnp.arange(boxes.shape[0], dtype=jnp.int32)
        return jax.lax.scan(body, state, (boxes, idx))

    def run(k):
        state = new_visual_state(4 * n_objects, 1, gallery, feat_dim,
                                 feature_dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        for i in range(k):
            state, ids = scan_fn(state, stream, jnp.int32(1 + i * base_len))
        np.asarray(ids[-1, 0])  # true sync
        return time.perf_counter() - t0

    fps = 1.0 / per_step_time(run, base_len)
    flops = visual_step_flops(n_objects, 4 * n_objects, gallery, feat_dim)
    return fps, flops


def bench_visual_pallas(n_objects, feat_dim, base_len, gallery=3, chunk=32,
                        positional="iou"):
    """The fused VisualSORT-on-chip kernel (ops/pallas_visual.py), same
    workload as bench_visual_scan for a direct XLA-vs-Pallas comparison.
    positional="maha" exercises the round-3 kernel extension (KF state in
    VMEM drives the chi2-gated distance)."""
    import jax
    import jax.numpy as jnp

    from similari_tpu.ops.pallas_visual import compiled_pallas_visual_scan
    from similari_tpu.trackers.visual_state import new_visual_state
    from similari_tpu.trackers.visual_step import VisualConfig

    cfg = VisualConfig(
        positional_kind=positional, visual_kind="euclidean",
        visual_threshold=100.0, visual_minimal_track_length=3,
        max_idle_epochs=5, assignment="auction", oriented=False,
        feature_precision="bf16",
    )
    rng = np.random.default_rng(0)
    stream = jnp.asarray(box_stream(base_len, n_objects))
    featsrc = rng.normal(size=(n_objects, feat_dim)).astype(np.float32)
    feats = jnp.asarray(
        np.broadcast_to(featsrc, (base_len, n_objects, feat_dim)).copy())
    onesv = jnp.ones((base_len, n_objects), jnp.float32)
    truv = jnp.ones((base_len, n_objects), bool)
    scan = compiled_pallas_visual_scan(cfg, chunk)

    def run(k):
        state = new_visual_state(4 * n_objects, 1, gallery, feat_dim)
        ids = None
        t0 = time.perf_counter()
        for i in range(k):
            state, (ids, *_rest) = scan(
                state, stream, onesv, truv, feats, truv, onesv, onesv,
                jnp.int32(1 + i * base_len))
        np.asarray(ids[-1][0])  # true sync
        return time.perf_counter() - t0

    fps = 1.0 / per_step_time(run, base_len)
    flops = visual_step_flops(n_objects, 4 * n_objects, gallery, feat_dim)
    return fps, flops


def bench_batch_visual_scan(n_scenes, n_objects, feat_dim, base_len,
                            gallery=3, scene_chunk=0):
    """North-star config: batch VisualSORT, scene-frames/sec/chip.

    Constant per-scene features (see bench_visual_scan) bound HBM and h2d:
    a stream-fed [steps, S, D, F] tensor would not fit at 1024 scenes."""
    import jax
    import jax.numpy as jnp

    from similari_tpu.parallel import (
        batched_visual_step_chunked,
        new_batched_visual_state,
    )
    from similari_tpu.trackers.visual_step import VisualConfig

    cfg = VisualConfig(
        positional_kind="iou", visual_kind="euclidean",
        visual_threshold=100.0, visual_minimal_track_length=3,
        max_idle_epochs=5, assignment="auction", oriented=False,
        feature_precision="bf16",
    )
    vstep = batched_visual_step_chunked(cfg, scene_chunk or n_scenes)
    rng = np.random.default_rng(0)
    flat = box_stream(base_len, n_scenes * n_objects)
    boxes = jnp.asarray(flat.reshape(base_len, n_scenes, n_objects, 5))
    feat = jnp.asarray(
        rng.normal(size=(n_scenes, n_objects, feat_dim)).astype(np.float32)
    )
    ones = jnp.ones((n_scenes, n_objects), jnp.float32)
    tru = jnp.ones((n_scenes, n_objects), bool)

    @jax.jit
    def scan_fn(states, bstream, epochs0):
        def body(st, inp):
            b, i = inp
            st, out = vstep(st, b, ones, tru, feat, tru, ones, ones,
                            epochs0 + i)
            return st, out.track_id
        idx = jnp.arange(bstream.shape[0], dtype=jnp.int32)
        return jax.lax.scan(body, states, (bstream, idx))

    def run(k):
        states = new_batched_visual_state(n_scenes, 2 * n_objects, 1, gallery,
                                          feat_dim, feature_dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        for i in range(k):
            states, ids = scan_fn(states, boxes,
                                  jnp.full((n_scenes,), 1 + i * base_len,
                                           jnp.int32))
        np.asarray(ids[-1, 0, 0])  # true sync
        return time.perf_counter() - t0

    scene_fps = n_scenes / per_step_time(run, base_len)
    flops = visual_step_flops(n_objects, 2 * n_objects, gallery, feat_dim)
    return scene_fps, flops


def bench_interactive_host(reps=40):
    """Per-call latencies of the HOST engines (C++/NumPy), runnable inside
    the TPU process (no device dispatch on these paths) so the driver's
    single-JSON capture carries the interactive rows too.  Medians in ms;
    references are the published per-call tables
    (api.md:250-257, benchmarks.md:82-86,93-109)."""
    import statistics
    import time as _t

    from similari_tpu import (
        BoundingBox, PositionalMetricType, Sort, VisualSort,
        VisualSortMetricType, VisualSortObservation, VisualSortObservationSet,
        VisualSortOptions,
    )
    from similari_tpu.trackers.feature import FeatureTracker

    out = {}

    def med(fn, n_reps=reps):
        ts = []
        for _ in range(n_reps):
            t0 = _t.perf_counter()
            fn()
            ts.append(_t.perf_counter() - t0)
        return statistics.median(ts) * 1e3

    for oriented in (False, True):
        for n in (10, 100, 500, 1000):
            rng = np.random.default_rng(1)
            xy = rng.uniform(0, 2000, (n, 2)).astype(np.float32)
            wh = rng.uniform(30, 60, (n, 2)).astype(np.float32)
            ang = rng.uniform(0, 1.0, (n,)).astype(np.float32)
            tr = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
                      method=PositionalMetricType.iou(0.3))

            def frame():
                nonlocal xy
                xy = xy + rng.uniform(-2, 2, xy.shape).astype(np.float32)
                b = np.zeros((n, 5), np.float32)
                b[:, :2] = xy
                if oriented:
                    b[:, 2] = ang
                b[:, 3] = wh[:, 0] / wh[:, 1]
                b[:, 4] = wh[:, 1]
                return b, np.ones((n,), np.float32)

            for _ in range(5):
                tr.predict_arrays(0, *frame())
            key = ("interactive_sort_oriented" if oriented
                   else "interactive_sort")
            out[f"{key}_{n}_ms"] = round(
                med(lambda: tr.predict_arrays(0, *frame())), 3)

    for n in (10, 100, 500):
        rng = np.random.default_rng(2)
        base = np.zeros((n, 256), np.float32)
        base[:, 0] = 1000.0 * np.arange(n)
        ftr = FeatureTracker(256, gallery=3)

        def epoch():
            nonlocal base
            base = base + rng.uniform(-0.1, 0.1, base.shape
                                      ).astype(np.float32)
            return base

        for _ in range(5):
            ftr.predict(epoch())
        out[f"interactive_feature_{n}_ms"] = round(
            med(lambda: ftr.predict(epoch()),
                n_reps=max(8, reps // (4 if n >= 500 else 1))), 3)

    for n in (10, 50, 100):
        rng = np.random.default_rng(3)
        xy = rng.uniform(0, 600 * np.sqrt(n / 10), (n, 2)).astype(np.float32)
        ident = rng.normal(size=(n, 512)).astype(np.float32)
        opts = VisualSortOptions()
        opts.visual_metric(VisualSortMetricType.euclidean(10.0))
        opts.positional_metric(PositionalMetricType.iou(0.3))
        opts.visual_minimal_track_length(2)
        opts.max_idle_epochs(5)
        vtr = VisualSort(1, opts)

        def vframe_arrays():
            # array fast path (VisualSort.predict_arrays): the timed call
            # carries no per-observation Python object churn, mirroring the
            # SORT rows above (round-4 VERDICT item 2)
            nonlocal xy
            xy = xy + rng.uniform(-2, 2, xy.shape).astype(np.float32)
            box = np.zeros((n, 5), np.float32)
            box[:, :2] = xy
            box[:, 3] = 0.5
            box[:, 4] = 40.0
            feat = ident + rng.normal(
                scale=0.05, size=(n, 512)).astype(np.float32)
            return (box, np.ones((n,), np.float32), feat,
                    np.ones((n,), bool), np.full((n,), 0.9, np.float32))

        for _ in range(5):
            vtr.predict_arrays(0, *vframe_arrays())
        frames = [vframe_arrays() for _ in range(reps)]
        it = iter(frames)
        out[f"interactive_visual_{n}_ms"] = round(
            med(lambda: vtr.predict_arrays(0, *next(it)),
                n_reps=len(frames)), 3)

    # BatchSORT at the reference's own per-call shape: ONE scene x N objects
    # per request, constraint (1, 1.0)
    # (/root/reference/benches/batch_sort_iou_tracker.rs:30-79; the request
    # build is inside the timed region there, so it is here too)
    from similari_tpu import BatchSort, SortPredictionBatchRequest
    from similari_tpu.trackers.constraints import SpatioTemporalConstraints

    for n in (10, 100, 500):
        rng = np.random.default_rng(4)
        xy = rng.uniform(0, 1000.0 * n, (n, 2)).astype(np.float32)
        stc = SpatioTemporalConstraints()
        stc.add_constraints([(1, 1.0)])
        btr = BatchSort(1, 1, bbox_history=10, max_idle_epochs=1,
                        method=PositionalMetricType.iou(0.3),
                        spatio_temporal_constraints=stc)

        def bframe():
            nonlocal xy
            xy = xy + rng.uniform(-1, 1, xy.shape).astype(np.float32)
            return [BoundingBox(float(xy[i, 0]), float(xy[i, 1]),
                                50.0, 50.0).as_xyaah() for i in range(n)]

        def bcall(boxes):
            req = SortPredictionBatchRequest()
            for i, bb in enumerate(boxes):
                req.add(0, bb, i)
            res = btr.predict(req)
            for _ in range(res.batch_size()):
                res.get()

        for _ in range(5):
            bcall(bframe())
        bframes = [bframe() for _ in range(max(8, reps // 2))]
        bit = iter(bframes)
        out[f"interactive_batch_sort_{n}_ms"] = round(
            med(lambda: bcall(next(bit)), n_reps=len(bframes)), 3)
    return out


def bench_nms_host(n_boxes, oriented, frames=4096):
    """Host (native C++) NMS throughput — the correct engine below ~64
    boxes, where device dispatch dwarfs the math (same engine split as the
    interactive Sort path; see native/nms.cpp)."""
    import time as _t

    from similari_tpu import native

    if not native.nms_available():
        raise RuntimeError("native lib unavailable")
    rng = np.random.default_rng(3)
    b = np.zeros((frames, n_boxes, 5), np.float32)
    spread = 60.0 * np.sqrt(n_boxes)
    b[..., 0] = rng.uniform(0, spread, (frames, n_boxes))
    b[..., 1] = rng.uniform(0, spread, (frames, n_boxes))
    if oriented:
        b[..., 2] = rng.uniform(0, 0.6, (frames, n_boxes))
    b[..., 3] = 1.0
    b[..., 4] = rng.uniform(20, 50, (frames, n_boxes))
    native.nms_host_batch(b[:16], 0.8, oriented)  # warm
    t0 = _t.perf_counter()
    native.nms_host_batch(b, 0.8, oriented)
    fps = frames / (_t.perf_counter() - t0)
    return fps, nms_step_flops(n_boxes, oriented)


def bench_nms(n_boxes, oriented, base_len):
    """Device NMS throughput (reference `benches/nms.rs` scales): frames/sec,
    measured as a scan over independent frames."""
    import jax
    import jax.numpy as jnp

    from similari_tpu.ops.nms import nms_kernel

    rng = np.random.default_rng(3)
    b = box_stream(base_len, n_boxes, seed=5, spread=500.0)
    if oriented:
        b[..., 2] = rng.uniform(0, 0.6, size=b.shape[:2])
    boxes = jnp.asarray(b)
    ranks = jnp.asarray(
        rng.uniform(0.5, 1.0, size=(base_len, n_boxes)).astype(np.float32)
    )
    valid = jnp.ones((n_boxes,), bool)

    @jax.jit
    def scan_nms(carry, boxes, ranks):
        def body(c, inp):
            bb, r = inp
            order = jnp.argsort(-r)
            keep = nms_kernel(bb[order], valid, jnp.float32(0.8),
                              oriented)
            return c + jnp.sum(keep), None

        return jax.lax.scan(body, carry, (boxes, ranks))[0]

    def run(k):
        c = jnp.int32(0)
        t0 = time.perf_counter()
        for _ in range(k):
            c = scan_nms(c, boxes, ranks)
        np.asarray(c)  # true sync
        return time.perf_counter() - t0

    fps = 1.0 / per_step_time(run, base_len)
    return fps, nms_step_flops(n_boxes, oriented)


# ---------------------------------------------------------------------------
# Config matrix
# ---------------------------------------------------------------------------

def main():
    import jax

    # Persistent compilation cache: tunnel compiles cost 0.5-60 s each and
    # dominate a cold run; the cache (verified supported on the axon PJRT
    # backend) makes warm reruns compile-free.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_similari"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    results = {}
    mfus = {}
    t_start = time.time()
    budget = float(os.environ.get("BENCH_BUDGET", "2400"))
    fast = os.environ.get("BENCH_FAST") == "1"

    def record(name, fps, flops, unit="FPS"):
        results[name + "_fps"] = fps
        gfs = fps * flops / 1e9
        mfu = fps * flops / PEAK_BF16
        mfus[name] = mfu
        base = BASELINES.get(name)
        vs = f" (reference {base:.0f}) [x{fps / base:.1f}]" if base else ""
        log(f"{name}: {fps:.1f} {unit}{vs}  "
            f"[{gfs:.1f} GFLOP/s, mfu {mfu:.4%}]")

    def over_budget(name):
        if time.time() - t_start > budget:
            log(f"SKIPPED (time budget {budget:.0f}s exceeded): {name}")
            return True
        return False

    def guarded(name, fn, *args, **kwargs):
        """Run one bench config; a failure (incl. a crashed TPU worker on a
        later config) must never lose the results already collected."""
        try:
            return fn(*args, **kwargs)
        except Exception as e:
            log(f"{name} FAILED: {e!r}")
            results[name + "_error"] = str(e)[:200]
            return None

    # ---- headline first: batch VisualSORT saturation sweep ---------------
    # the HEADLINE rows are medians of BENCH_POINT_REPS independent
    # captures with the min-max spread recorded (round-5 VERDICT item 3:
    # a single-run headline on a ±15% tunnel is self-inflicted variance —
    # the same treatment bench_pod.py's points got in round 4)
    point_reps = int(os.environ.get("BENCH_POINT_REPS", "1" if fast else "3"))
    visual_sweep = [(64, 32), (256, 16), (1024, 8)]
    if fast:
        visual_sweep = [(64, 32)]
    vbase = BASELINES["visual_sort_100x512"]
    best_visual = (0.0, 64)
    for scenes, base_len in visual_sweep:
        name = f"batch_visual_{scenes}x100x512"
        if over_budget(name):
            continue
        samples = []
        flops = None
        for rep in range(point_reps):
            # re-check between reps: one rep of the largest point is
            # minutes, so a once-per-point check can overshoot
            # BENCH_BUDGET by (point_reps - 1) full captures
            if rep and over_budget(name):
                break
            r = guarded(name, bench_batch_visual_scan, scenes, 100, 512,
                        base_len)
            if r is None:
                break
            samples.append(r[0])
            flops = r[1]
        if not samples:
            continue
        samples.sort()
        fps = samples[len(samples) // 2]
        record(name, fps, flops, unit="scene-frames/s")
        if len(samples) > 1:
            results[name + "_spread"] = [round(samples[0], 2),
                                         round(samples[-1], 2)]
            log(f"  median of {len(samples)} runs, spread "
                f"[{samples[0]:.0f}, {samples[-1]:.0f}]")
        log(f"  -> x{fps / vbase:.1f} vs reference single-stream")
        if fps > best_visual[0]:
            best_visual = (fps, scenes)

    # ---- batch SORT sweep -------------------------------------------------
    sort_sweep = [(64, 64), (1024, 16), (4096, 8)]
    if fast:
        sort_sweep = [(64, 64)]
    for scenes, base_len in sort_sweep:
        name = f"batch_sort_{scenes}x100"
        if over_budget(name):
            continue
        r = guarded(name, bench_batch_sort_scan, scenes, 100, base_len)
        if r is None:
            continue
        fps, flops = r
        record(name, fps, flops, unit="scene-frames/s")
        log(f"  -> x{fps / BASELINES['batch_sort_iou_100']:.1f} vs reference"
            " single-stream")

    # ---- single-scene SORT matrix ------------------------------------------
    sort_configs = [
        ("sort_iou_100", "iou", 100, False, 2048),
        ("sort_maha_100", "maha", 100, False, 2048),
        ("sort_iou_oriented_100", "iou", 100, True, 1024),
        ("sort_maha_oriented_100", "maha", 100, True, 1024),
        ("sort_iou_500", "iou", 500, False, 512),
        ("sort_iou_oriented_500", "iou", 500, True, 512),
        ("sort_iou_10", "iou", 10, False, 2048),
    ]
    if fast:
        sort_configs = sort_configs[:1]
    for name, method, n, oriented, base_len in sort_configs:
        if over_budget(name):
            continue
        r = guarded(name, bench_sort_scan, method, n, oriented, base_len)
        if r is None:
            continue
        fps, flops = r
        record(name, fps, flops)

    # ---- Pallas fused-kernel config ----------------------------------------
    if not fast and not over_budget("sort_iou_100_pallas"):
        try:
            fps, flops = bench_sort_pallas(100, 2048)
            record("sort_iou_100_pallas", fps, flops)
            xla = results.get("sort_iou_100_fps")
            if xla:
                log(f"  -> pallas vs XLA scan: x{fps / xla:.2f}")
        except Exception as e:  # pallas path must never sink the bench
            log(f"sort_iou_100_pallas FAILED: {e!r}")

    # ---- Pallas fused visual kernel ----------------------------------------
    if not fast and not over_budget("visual_sort_100x512_pallas"):
        r = guarded("visual_sort_100x512_pallas", bench_visual_pallas,
                    100, 512, 256)
        if r is not None:
            fps, flops = r
            record("visual_sort_100x512_pallas", fps, flops)
    if not fast and not over_budget("visual_sort_100x512_pallas_maha"):
        r = guarded("visual_sort_100x512_pallas_maha", bench_visual_pallas,
                    100, 512, 256, positional="maha")
        if r is not None:
            fps, flops = r
            record("visual_sort_100x512_pallas_maha", fps, flops)

    # ---- single-scene VisualSORT objects x dims matrix ---------------------
    visual_cfgs = [(100, 128, 1024), (100, 256, 1024), (100, 512, 1024),
                   (100, 1024, 512), (100, 2048, 512),
                   (10, 512, 2048), (50, 512, 1024)]
    if fast:
        visual_cfgs = []
    for nobj, dim, base_len in visual_cfgs:
        name = f"visual_sort_{nobj}x{dim}"
        if over_budget(name):
            continue
        r = guarded(name, bench_visual_scan, nobj, dim, base_len)
        if r is None:
            continue
        fps, flops = r
        record(name, fps, flops)

    # ---- NMS ----------------------------------------------------------------
    nms_configs = [
        ("nms_10", 10, False, 16384),       # host engine (native C++)
        ("nms_100", 100, False, 8192),
        ("nms_500", 500, False, 2048),
        ("nms_1000", 1000, False, 1024),
        ("nms_oriented_10", 10, True, 8192),  # host engine
        ("nms_oriented_100", 100, True, 4096),
        ("nms_oriented_300", 300, True, 1024),
        ("nms_oriented_500", 500, True, 512),
        ("nms_oriented_1000", 1000, True, 256),
    ]
    if fast:
        nms_configs = []
    for name, n, oriented, base_len in nms_configs:
        if over_budget(name):
            continue
        fn = bench_nms_host if n <= 10 else bench_nms
        args = (n, oriented) if n <= 10 else (n, oriented, base_len)
        r = guarded(name, fn, *args)
        if r is None:
            continue
        fps, flops = r
        record(name, fps, flops, unit="frames/s")

    # ---- interactive host-engine rows (no device dispatch; cheap) ---------
    if not fast and not over_budget("interactive_host"):
        try:
            inter = bench_interactive_host()
            results.update(inter)
            refs = {"sort_10": 0.149, "sort_100": 1.660, "sort_500": 17.432,
                    "sort_1000": 53.098,
                    # oriented cargo-bench rows, benchmarks.md:48-52
                    "sort_oriented_10": 0.108414,
                    "sort_oriented_100": 1.601062,
                    "sort_oriented_500": 18.945655,
                    "feature_10": 0.101465,
                    "feature_100": 4.020673, "feature_500": 61.716729,
                    "visual_10": 0.447903, "visual_50": 2.249694,
                    "visual_100": 5.775469,
                    # BatchSORT per-call rows, benchmarks.md:116-120
                    "batch_sort_10": 0.106876,
                    "batch_sort_100": 1.616542,
                    "batch_sort_500": 20.454230}
            for key, ref in refs.items():
                ms = inter.get(f"interactive_{key}_ms")
                if ms:
                    log(f"interactive_{key}: {ms:.3f} ms"
                        f" (reference {ref:.3f}) [x{ref / ms:.2f}]")
        except Exception as e:  # host engines must never sink the bench
            log(f"interactive_host FAILED: {e!r}")

    log(f"total bench time: {time.time() - t_start:.1f}s")

    headline, knee_scenes = best_visual
    if headline == 0.0:  # whole sweep failed: fall back to any visual number
        headline = results.get("visual_sort_100x512_fps", 0.0)
        knee_scenes = 1
    print(
        json.dumps(
            {
                "metric": "batch_visual_sort_scene_fps",
                "value": round(headline, 2),
                "unit": (
                    f"scene-frames/sec at saturation knee ({knee_scenes} "
                    "scenes x 100 objects x 512-d, gallery 3)"
                ),
                "vs_baseline": round(headline / vbase, 3),
                "extra": {
                    **{k: (round(v, 2) if isinstance(v, (int, float))
                           else v)
                       for k, v in results.items()},
                    "knee_scenes": knee_scenes,
                    **{
                        f"mfu_{k}": round(v, 6)
                        for k, v in mfus.items()
                        if k.startswith("batch_visual") or k.startswith("visual")
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
