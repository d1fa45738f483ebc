#!/usr/bin/env python
"""Interactive (per-call) API latency — the reference's own benchmark shape.

The reference's published Python numbers are per-call `Sort.predict` latencies
(`/root/reference/assets/documentation/python/api.md:250-269`: 0.149 ms at 10
objects ... 53.1 ms at 1000, single stream, warm process).  The device-
resident scan pipelines in bench.py measure a different operating point
(throughput); this script measures the same per-call point for our host API.

It runs on CPU-jax ON PURPOSE: the dev TPU sits behind a ~30 ms-RTT tunnel,
so a per-call TPU number would measure the tunnel, not the tracker (a
production-attached TPU pays ~10 us dispatch; see ARCHITECTURE.md §6).  The
CPU number is directly comparable to the reference's CPU number.

Measures the warm path: first call per (config, padded-shape) compiles and is
excluded; reported latency is the median of `--reps` warm calls.

Output: table on stderr, one JSON line on stdout.
"""

import argparse
import json
import statistics
import sys
import time

import numpy as np

# ms/prediction from api.md:250-257 (Similari) and :262-269 (abewley/sort)
REFERENCE_MS = {10: 0.149, 100: 1.660, 200: 4.895, 300: 8.991, 500: 17.432,
                1000: 53.098}
ABEWLEY_MS = {10: 1.588, 100: 11.976, 200: 25.160, 300: 40.922, 500: 74.254,
              1000: 162.037}
# oriented SORT cargo-bench per-iter rows, benchmarks.md:48-52
ORIENTED_REF_MS = {10: 0.108414, 100: 1.601062, 500: 18.945655}
# generic feature engine (256-d, gallery 3), benchmarks.md:82-86
FEATURE_REF_MS = {10: 0.101465, 100: 4.020673, 500: 61.716729}
# VisualSORT per-call (512-d, gallery<=5), benchmarks.md:93-109 (ns/iter)
VISUAL_REF_MS = {10: 0.447903, 50: 2.249694, 100: 5.775469}
# BatchSORT per-call (one scene x N), benchmarks.md:116-120
BATCH_REF_MS = {10: 0.106876, 100: 1.616542, 500: 20.454230}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, nargs="*",
                    default=[10, 100, 200, 300, 500, 1000])
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax

    # env vars alone don't work: jax is preimported with the axon TPU backend
    jax.config.update("jax_platforms", "cpu")

    from similari_tpu.trackers import PositionalMetricType, Sort

    log(f"platform={jax.default_backend()} (per-call latency, warm path)")
    rows = {}
    for n in args.objects:
        rng = np.random.default_rng(1)
        xy = rng.uniform(0, 2000, (n, 2)).astype(np.float32)
        wh = rng.uniform(30, 60, (n, 2)).astype(np.float32)

        tracker = Sort(
            shards=1,
            bbox_history=1,
            max_idle_epochs=5,
            method=PositionalMetricType.iou(0.3),
        )

        def frame():
            nonlocal xy
            xy = xy + rng.uniform(-2, 2, xy.shape).astype(np.float32)
            boxes = np.zeros((n, 5), np.float32)
            boxes[:, :2] = xy
            boxes[:, 3] = wh[:, 0] / wh[:, 1]
            boxes[:, 4] = wh[:, 1]
            return boxes, np.ones((n,), np.float32)

        # warm up: fills the store to steady state and compiles the step
        for _ in range(5):
            tracker.predict_arrays(0, *frame())

        times = []
        for _ in range(args.reps):
            boxes, confs = frame()
            t0 = time.perf_counter()
            tracker.predict_arrays(0, boxes, confs)
            times.append(time.perf_counter() - t0)
        ms = statistics.median(times) * 1e3
        rows[f"sort_{n}_ms"] = round(ms, 3)
        ref = REFERENCE_MS.get(n)
        ab = ABEWLEY_MS.get(n)
        cmp = (f"  reference {ref:.3f} ms [x{ref / ms:.2f}], "
               f"abewley {ab:.3f} ms [x{ab / ms:.2f}]" if ref else "")
        log(f"{n:5d} objects: {ms:8.3f} ms/predict ({1e3 / ms:8.1f} FPS){cmp}")

    # ---- oriented SORT (host f32 clip, round-4 VERDICT item 1) -----------
    for n in (10, 100, 500):
        rng = np.random.default_rng(1)
        xy = rng.uniform(0, 2000, (n, 2)).astype(np.float32)
        wh = rng.uniform(30, 60, (n, 2)).astype(np.float32)
        ang = rng.uniform(0, 1.0, (n,)).astype(np.float32)
        tracker = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
                       method=PositionalMetricType.iou(0.3))

        def oframe():
            nonlocal xy
            xy = xy + rng.uniform(-2, 2, xy.shape).astype(np.float32)
            boxes = np.zeros((n, 5), np.float32)
            boxes[:, :2] = xy
            boxes[:, 2] = ang
            boxes[:, 3] = wh[:, 0] / wh[:, 1]
            boxes[:, 4] = wh[:, 1]
            return boxes, np.ones((n,), np.float32)

        for _ in range(5):
            tracker.predict_arrays(0, *oframe())
        times = []
        for _ in range(args.reps):
            boxes, confs = oframe()
            t0 = time.perf_counter()
            tracker.predict_arrays(0, boxes, confs)
            times.append(time.perf_counter() - t0)
        ms = statistics.median(times) * 1e3
        rows[f"sort_oriented_{n}_ms"] = round(ms, 3)
        ref = ORIENTED_REF_MS[n]
        log(f"ornt {n:4d} objects: {ms:8.3f} ms/predict "
            f"({1e3 / ms:8.1f} FPS)  reference {ref:.3f} ms [x{ref/ms:.2f}]")

    # ---- generic feature engine (FeatureTracker, 256-d, gallery 3) -------
    # same workload as /root/reference/benches/feature_tracker.rs:95-170
    from similari_tpu.trackers.feature import FeatureTracker

    for n in (10, 100, 500):
        rng = np.random.default_rng(2)
        base = np.zeros((n, 256), np.float32)
        base[:, 0] = 1000.0 * np.arange(n)
        tracker = FeatureTracker(256, gallery=3, max_distance=100.0,
                                 min_votes=1)

        def epoch():
            nonlocal base
            base = base + rng.uniform(-0.1, 0.1, base.shape).astype(np.float32)
            return base

        for _ in range(5):
            tracker.predict(epoch())
        times = []
        for _ in range(args.reps):
            feats = epoch()
            t0 = time.perf_counter()
            tracker.predict(feats)
            times.append(time.perf_counter() - t0)
        ms = statistics.median(times) * 1e3
        rows[f"feature_{n}_ms"] = round(ms, 3)
        ref = FEATURE_REF_MS[n]
        log(f"feat {n:4d} objects: {ms:8.3f} ms/predict "
            f"({1e3 / ms:8.1f} FPS)  reference {ref:.3f} ms [x{ref/ms:.2f}]")

    # ---- interactive VisualSORT (host engine, 512-d, gallery 3) ----------
    # reference rows: benchmarks.md:93-109 (per-call cargo bench, 4-core CPU)
    from similari_tpu import (
        BoundingBox, PositionalMetricType as PMT, VisualSort,
        VisualSortMetricType, VisualSortObservation, VisualSortObservationSet,
        VisualSortOptions,
    )

    for n in (10, 50, 100):
        rng = np.random.default_rng(3)
        xy = rng.uniform(0, 600 * np.sqrt(n / 10), (n, 2)).astype(np.float32)
        ident = rng.normal(size=(n, 512)).astype(np.float32)
        opts = VisualSortOptions()
        opts.visual_metric(VisualSortMetricType.euclidean(10.0))
        opts.positional_metric(PMT.iou(0.3))
        opts.visual_minimal_track_length(2)
        opts.max_idle_epochs(5)
        tracker = VisualSort(1, opts)

        def vframe():
            # array fast path (predict_arrays): no per-observation Python
            # objects in the timed call — mirrors the SORT rows and the
            # round-4 VERDICT item-2 prescription
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
            tracker.predict_arrays(0, *vframe())
        times = []
        for _ in range(max(10, args.reps // 2)):
            fr = vframe()
            t0 = time.perf_counter()
            tracker.predict_arrays(0, *fr)
            times.append(time.perf_counter() - t0)
        ms = statistics.median(times) * 1e3
        rows[f"visual_{n}_ms"] = round(ms, 3)
        ref = VISUAL_REF_MS[n]
        log(f"vis  {n:4d} objects: {ms:8.3f} ms/predict "
            f"({1e3 / ms:8.1f} FPS)  reference {ref:.3f} ms [x{ref/ms:.2f}]")

    # ---- BatchSORT at the reference's per-call shape (one scene x N) -----
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
        times = []
        for _ in range(max(10, args.reps // 2)):
            boxes = bframe()
            t0 = time.perf_counter()
            bcall(boxes)
            times.append(time.perf_counter() - t0)
        ms = statistics.median(times) * 1e3
        rows[f"batch_sort_{n}_ms"] = round(ms, 3)
        ref = BATCH_REF_MS[n]
        log(f"bat  {n:4d} objects: {ms:8.3f} ms/predict "
            f"({1e3 / ms:8.1f} FPS)  reference {ref:.3f} ms [x{ref/ms:.2f}]")

    vs_ref = {
        f"sort_{n}_x_reference": round(REFERENCE_MS[n] / rows[f"sort_{n}_ms"], 2)
        for n in args.objects if n in REFERENCE_MS
    }
    vs_ref.update({
        f"visual_{n}_x_reference": round(
            VISUAL_REF_MS[n] / rows[f"visual_{n}_ms"], 2)
        for n in (10, 50, 100)
    })
    vs_ref.update({
        f"feature_{n}_x_reference": round(
            FEATURE_REF_MS[n] / rows[f"feature_{n}_ms"], 2)
        for n in (10, 100, 500)
    })
    vs_ref.update({
        f"sort_oriented_{n}_x_reference": round(
            ORIENTED_REF_MS[n] / rows[f"sort_oriented_{n}_ms"], 2)
        for n in (10, 100, 500)
    })
    vs_ref.update({
        f"batch_sort_{n}_x_reference": round(
            BATCH_REF_MS[n] / rows[f"batch_sort_{n}_ms"], 2)
        for n in (10, 100, 500)
    })
    print(json.dumps({
        "metric": "interactive_sort_latency_ms",
        "platform": "cpu",
        "engine": "host (native C++ step, trackers/host_sort.py)",
        "reference_ms": {str(k): v for k, v in REFERENCE_MS.items()},
        "rows": rows,
        "vs_reference": vs_ref,
    }))


if __name__ == "__main__":
    main()
