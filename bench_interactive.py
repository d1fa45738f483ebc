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
import gc
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
# BatchSORT per-call (one scene x N), benchmarks.md:116-120 (IoU) and
# :127-131 (Maha)
BATCH_REF_MS = {10: 0.106876, 100: 1.616542, 500: 20.454230}
BATCH_MAHA_REF_MS = {10: 0.114592, 100: 1.533445, 500: 18.270742}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(args):
    """One full capture: every row measured once (internal per-row medians
    over `--reps` warm calls).  Returns the rows dict."""
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

    # ---- generic store search (reference benches/simple_search.rs +
    # track_search.rs workloads; no published numbers in benchmarks.md, so
    # the rows record OUR latency at the reference's shapes) --------------
    from similari_tpu.core.examples import (
        BatchedSimpleMetric, SimpleAttributeUpdate, SimpleAttrs,
    )
    from similari_tpu.core.store import TrackStoreBuilder
    from similari_tpu.core.track import ObservationBuilder

    def store_query_ms(vec_len, count, track_len=1, use_arrays=False,
                       reps=20):
        rng = np.random.default_rng(5)
        db = (TrackStoreBuilder(4).default_attributes(SimpleAttrs())
              .metric(BatchedSimpleMetric()).build())
        for i in range(count):
            for k in range(track_len):
                db.add(i, 0, 1.0,
                       rng.uniform(0, 1, vec_len).astype(np.float32),
                       SimpleAttributeUpdate() if k == 0 else None)

        def make_cand():
            b = db.new_track(count + 1)
            for k in range(track_len):
                ob = (ObservationBuilder(0).observation_attributes(1.0)
                      .observation(rng.uniform(0, 1, vec_len)
                                   .astype(np.float32)))
                if k == 0:  # SimpleAttrs update is one-shot
                    ob = ob.track_attributes_update(SimpleAttributeUpdate())
                b.observation(ob.build())
            return b.build()

        cand = make_cand()
        if use_arrays:
            db.foreign_track_distances_arrays(cand, 0, True)  # build index
        # the setup loop above allocates `count` track object graphs; pay its
        # generational-GC debt BEFORE the timed region, or a collection pause
        # (measured 35-130 ms spikes) lands inside a timed call and the
        # median reports setup garbage, not query latency
        gc.collect()
        # ... and freeze the surviving store graph out of the collector: the
        # records query allocates ~count*track_len record objects per call,
        # whose gen2 triggers would otherwise re-scan the whole setup heap
        # inside the timed region (measured: track-search median 83 -> 51 ms,
        # max 98 -> 56, by the freeze alone).  This is the standard CPython
        # serving posture (freeze after warmup); the query's own garbage is
        # still collected and still billed to the query.
        gc.freeze()
        try:
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                if use_arrays:
                    db.foreign_track_distances_arrays(cand, 0, True)
                else:
                    d, e = db.foreign_track_distances([cand], 0, True)
                    assert not e
                times.append(time.perf_counter() - t0)
        finally:  # a raise must not leave the collector frozen for the
            # remaining rows of the capture
            gc.unfreeze()
        return statistics.median(times) * 1e3

    for vec_len, count in ((128, 1000), (128, 10000), (512, 1000),
                           (512, 10000)):
        ms_rec = store_query_ms(vec_len, count, reps=15 if count >= 10000
                                else 20)
        ms_arr = store_query_ms(vec_len, count, use_arrays=True)
        rows[f"store_search_{vec_len}_{count}_ms"] = round(ms_rec, 3)
        rows[f"store_search_{vec_len}_{count}_arrays_ms"] = round(ms_arr, 3)
        log(f"store {vec_len:4d}-d x {count:6d} tracks: {ms_rec:8.3f} ms "
            f"records / {ms_arr:7.3f} ms arrays per query")
    ms_rec = store_query_ms(256, 100, track_len=30, reps=10)
    ms_arr = store_query_ms(256, 100, track_len=30, use_arrays=True)
    rows["track_search_256_30_100_ms"] = round(ms_rec, 3)
    rows["track_search_256_30_100_arrays_ms"] = round(ms_arr, 3)
    log(f"track search 256-d x 30 obs x 100 tracks: {ms_rec:.3f} ms records"
        f" / {ms_arr:.3f} ms arrays")

    # ---- Kalman filter + own-area shares (reference benches/kalman_bbox.rs
    # :100k predict/update steps per iter, benches/kalman_2d_point.rs,
    # benches/bbox_own_areas.rs — no published numbers; rows record OURS) --
    from similari_tpu.utils.bbox import Universal2DBox
    from similari_tpu.utils.kalman import (
        Point2DKalmanFilter, Universal2DBoxKalmanFilter,
    )

    kf = Universal2DBoxKalmanFilter()
    rng = np.random.default_rng(6)
    st = kf.initiate(Universal2DBox(0.0, 0.0, 0.0, 2.0, 5.0))
    n_steps = 100_000
    zs = rng.normal(size=(n_steps, 2)).astype(np.float32)
    t0 = time.perf_counter()
    for i in range(n_steps):
        st = kf.predict(st)
        st = kf.update(st, Universal2DBox(
            float(zs[i, 0]), float(zs[i, 1]), 0.0, 2.0, 5.0))
    rows["kalman_bbox_100k_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    log(f"kalman bbox 100k predict/update: {rows['kalman_bbox_100k_ms']} ms"
        " (reference bench exists, no published number)")
    seq = np.zeros((n_steps, 5), np.float32)
    seq[:, 0] = zs[:, 0]
    seq[:, 1] = zs[:, 1]
    seq[:, 3] = 2.0
    seq[:, 4] = 5.0
    kf.filter_sequence(seq[:100])  # warm (builds native lib if needed)
    t0 = time.perf_counter()
    kf.filter_sequence(seq)
    rows["kalman_bbox_100k_bulk_ms"] = round(
        (time.perf_counter() - t0) * 1e3, 2)
    log(f"kalman bbox 100k bulk filter_sequence: "
        f"{rows['kalman_bbox_100k_bulk_ms']} ms")

    pkf = Point2DKalmanFilter()
    ps = pkf.initiate(0.0, 0.0)
    t0 = time.perf_counter()
    for i in range(n_steps):
        ps = pkf.predict(ps)
        ps = pkf.update(ps, float(zs[i, 0]), float(zs[i, 1]))
    rows["kalman_point_100k_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    log(f"kalman point 100k predict/update: {rows['kalman_point_100k_ms']} ms")
    pkf.filter_sequence(zs[:100])  # warm
    t0 = time.perf_counter()
    pkf.filter_sequence(zs)
    rows["kalman_point_100k_bulk_ms"] = round(
        (time.perf_counter() - t0) * 1e3, 2)
    log(f"kalman point 100k bulk filter_sequence: "
        f"{rows['kalman_point_100k_bulk_ms']} ms")

    from similari_tpu.utils.clipping import (
        exclusively_owned_areas_normalized_shares,
    )

    import jax
    import jax.numpy as jnp
    from functools import partial

    from similari_tpu.ops.ownarea import own_area_shares

    for n in (10, 25, 50, 100):
        rng = np.random.default_rng(7)
        boxes = [
            Universal2DBox(float(i + rng.uniform(0, 20)),
                           float(i + rng.uniform(0, 20)), 0.0, 1.0,
                           float(10 + rng.uniform(0, 5)))
            for i in range(n)
        ]
        # production path: the device inclusion-exclusion kernel
        # (ops/ownarea.py — fused into the jitted visual step); the host f64
        # polygon oracle (utils/clipping.py) is the exactness reference and
        # deliberately unoptimized, measured only at n=10 for the record
        vec = np.asarray([[b.xc, b.yc, 0.0, b.aspect, b.height]
                          for b in boxes], np.float32)
        fn = jax.jit(partial(own_area_shares, order=3, neighbors=8))
        bj = jnp.asarray(vec)
        vj = jnp.ones((n,), bool)
        np.asarray(fn(bj, vj))  # compile
        t0 = time.perf_counter()
        reps_oa = 20
        for _ in range(reps_oa):
            out = fn(bj, vj)
        np.asarray(out)
        rows[f"own_areas_{n}_ms"] = round(
            (time.perf_counter() - t0) / reps_oa * 1e3, 3)
        if n == 10:
            exclusively_owned_areas_normalized_shares(boxes)  # warm
            t0 = time.perf_counter()
            for _ in range(5):
                exclusively_owned_areas_normalized_shares(boxes)
            rows["own_areas_10_oracle_ms"] = round(
                (time.perf_counter() - t0) / 5 * 1e3, 3)
    log("own-area shares (device kernel) ms/frame: " + ", ".join(
        f"{n}:{rows[f'own_areas_{n}_ms']}" for n in (10, 25, 50, 100))
        + f"; f64 oracle at 10: {rows['own_areas_10_oracle_ms']}")

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

    for kind, n in (("iou", 10), ("iou", 100), ("iou", 500),
                    ("maha", 10), ("maha", 100), ("maha", 500)):
        rng = np.random.default_rng(4)
        xy = rng.uniform(0, 1000.0 * n, (n, 2)).astype(np.float32)
        stc = SpatioTemporalConstraints()
        stc.add_constraints([(1, 1.0)])
        btr = BatchSort(1, 1, bbox_history=10, max_idle_epochs=1,
                        method=(PositionalMetricType.iou(0.3) if kind == "iou"
                                else PositionalMetricType.maha()),
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
        key = (f"batch_sort_{n}_ms" if kind == "iou"
               else f"batch_sort_maha_{n}_ms")
        rows[key] = round(ms, 3)
        ref = (BATCH_REF_MS if kind == "iou" else BATCH_MAHA_REF_MS)[n]
        log(f"bat{kind[0]} {n:4d} objects: {ms:8.3f} ms/predict "
            f"({1e3 / ms:8.1f} FPS)  reference {ref:.3f} ms [x{ref/ms:.2f}]")

    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, nargs="*",
                    default=[10, 100, 200, 300, 500, 1000])
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--captures", type=int, default=3,
                    help="independent full captures; reported rows are "
                    "per-row medians (the bench.py point-reps treatment — "
                    "one capture's tail sample must not become the record)")
    args = ap.parse_args()

    caps = []
    for c in range(args.captures):
        if args.captures > 1:
            log(f"---- capture {c + 1}/{args.captures} ----")
        caps.append(measure(args))
    rows = {k: round(statistics.median([cap[k] for cap in caps]), 3)
            for k in caps[0]}
    spread = {k: [min(cap[k] for cap in caps), max(cap[k] for cap in caps)]
              for k in caps[0]} if args.captures > 1 else {}

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
    out = {
        "metric": "interactive_sort_latency_ms",
        "platform": "cpu",
        "engine": "host (native C++ step, trackers/host_sort.py)",
        "reference_ms": {str(k): v for k, v in REFERENCE_MS.items()},
        "captures": args.captures,
        "rows": rows,
        "vs_reference": vs_ref,
    }
    if spread:
        out["spread_ms"] = spread
    print(json.dumps(out))


if __name__ == "__main__":
    main()
