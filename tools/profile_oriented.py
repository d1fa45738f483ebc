#!/usr/bin/env python
"""Where does the oriented-500 interactive call spend its time?

Round-5 VERDICT item 7 asks either for oriented-500 <= ~0.25 ms or the
measured cost split showing the clip is no longer dominant after the
16-lane rewrite (native/clip.h).  This experiment decomposes the
`INTERACTIVE_r05.json` oriented-500 row (bench_interactive.py workload:
500 boxes, 30-60 px, uniform in 2000x2000, sigma=2 px motion) into:

  1. full `Sort.predict_arrays` per-call median        (the published row)
  2. the native `SortStepSession.step` alone           (Python wrapper = 1-2)
  3. the SAME zero-angle stream through an ALIGNED session
  4. the SAME zero-angle stream through a FORCED-ORIENTED session
     (3-4 isolates the clip + box_rot surcharge with identical pair
     structure: the 16-lane clip does the same work for angle=0)
  5. a NumPy replica of the grid scan counts pair_weight calls, giving
     implied ns per rotated-IoU evaluation

Output: one JSON line (artifact `ORIENTED_SPLIT_r05.json`).
"""

import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_stream(n, oriented, seed=1):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 2000, (n, 2)).astype(np.float32)
    wh = rng.uniform(30, 60, (n, 2)).astype(np.float32)
    ang = rng.uniform(0, 1.0, (n,)).astype(np.float32) if oriented else None

    def frame():
        nonlocal xy
        xy = xy + rng.uniform(-2, 2, xy.shape).astype(np.float32)
        boxes = np.zeros((n, 5), np.float32)
        boxes[:, :2] = xy
        if oriented:
            boxes[:, 2] = ang
        boxes[:, 3] = wh[:, 0] / wh[:, 1]
        boxes[:, 4] = wh[:, 1]
        return boxes, np.ones((n,), np.float32)

    return frame


def timed(fn, reps=50):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return statistics.median(times) * 1e3


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from similari_tpu import native
    from similari_tpu.trackers import PositionalMetricType, Sort

    assert native.sort_step_available()
    n = 500
    out = {}

    # ---- 1+2: the published oriented workload ---------------------------
    for name, oriented in (("oriented", True), ("aligned", False)):
        frame = make_stream(n, oriented)
        tracker = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
                       method=PositionalMetricType.iou(0.3))
        for _ in range(5):
            tracker.predict_arrays(0, *frame())
        out[f"{name}_full_ms"] = round(
            timed(lambda: tracker.predict_arrays(0, *frame())), 4)
        store = tracker._get_store(0)
        session = store.session
        epoch = [1000]

        def native_only():
            epoch[0] += 1
            b, c = frame()
            session.step(b, c, epoch[0], 10 ** 6)

        out[f"{name}_native_ms"] = round(timed(native_only), 4)

        if not oriented:
            # ---- 4: forced-oriented session on the SAME aligned state ----
            hcfg = tracker._host_cfgs[True]
            fses = native.SortStepSession(hcfg, store.state)

            def forced():
                epoch[0] += 1
                b, c = frame()
                fses.step(b, c, epoch[0], 10 ** 6)

            out["aligned_forced_oriented_native_ms"] = round(timed(forced), 4)

            # ---- 5: pair_weight call count (NumPy grid-scan replica) -----
            st = store.state
            # the step's compat filter is active AND recently updated —
            # counting the raw active flags doubles C with the stale
            # warm-up cohort (last_epoch stuck at the first frames)
            act = st.active.astype(bool)
            act &= (int(st.last_epoch.max()) - st.last_epoch) <= 5
            pred = st.pred_box[act]
            r = np.sqrt((pred[:, 3] * pred[:, 4]) ** 2 + pred[:, 4] ** 2) / 2
            rmax = max(float(r.max()), 1.0)
            cell = max(rmax, float(np.ptp(pred[:, 0])) / 1022.0,
                       float(np.ptp(pred[:, 1])) / 1022.0)
            b, _ = frame()
            det_r = np.sqrt((b[:, 3] * b[:, 4]) ** 2 + b[:, 4] ** 2) / 2
            span = ((det_r + rmax) / cell).astype(np.int32) + 1
            # a track is scanned when its cell is within the det's window:
            # |cell(track) - cell(det)| <= span in both axes
            tcx = ((pred[:, 0] - pred[:, 0].min()) / cell).astype(np.int64)
            tcy = ((pred[:, 1] - pred[:, 1].min()) / cell).astype(np.int64)
            dcx = ((b[:, 0] - pred[:, 0].min()) / cell).astype(np.int64)
            dcy = ((b[:, 1] - pred[:, 1].min()) / cell).astype(np.int64)
            hits = ((np.abs(tcx[None, :] - dcx[:, None]) <= span[:, None])
                    & (np.abs(tcy[None, :] - dcy[:, None]) <= span[:, None]))
            out["tracks_active"] = int(act.sum())
            out["pair_weight_calls"] = int(hits.sum())

    out["python_wrapper_ms"] = round(
        out["oriented_full_ms"] - out["oriented_native_ms"], 4)
    out["clip_surcharge_ms"] = round(
        out["aligned_forced_oriented_native_ms"] - out["aligned_native_ms"],
        4)
    if out.get("pair_weight_calls"):
        out["implied_ns_per_rotated_iou"] = round(
            out["clip_surcharge_ms"] * 1e6 / out["pair_weight_calls"], 1)
    for k, v in out.items():
        log(f"{k}: {v}")
    print(json.dumps({"metric": "oriented_500_cost_split", **out}))


if __name__ == "__main__":
    main()
