#!/usr/bin/env python
"""Adversarial accuracy suite (round-4 VERDICT item 8).

Runs occlusion/churn-heavy synthetic scenarios through the full tracking
stack and reports MOTA/IDF1 across the engine axes that could plausibly
diverge:

  host      — interactive host engine (native C++ step, exact JV voting)
  device_jv — jitted device scan with the exact host-callback JV solver
  auction   — jitted device scan with the on-device Jacobi auction
  auction_norecycle — auction without in-step idle recycling (capacity
              sized up so nothing overflows)

The parity bar is BASELINE.json's: every axis within 0.5 pt MOTA/IDF1 of
the host exact-JV baseline.  Output: a markdown table on stderr and one
JSON artifact (default ADVERSARIAL_r04.json).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SCENARIOS = ("crossing", "fp_burst", "idle_gaps", "churn", "capacity")
AXES = ("host", "device_jv", "auction", "auction_norecycle")


def run_axis(axis, dets, capacity):
    from similari_tpu.eval.mot import (
        run_sequence_device,
        run_sequence_interactive,
    )
    from similari_tpu.trackers import PositionalMetricType, Sort

    if axis == "host":
        tracker = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
                       method=PositionalMetricType.iou(0.3), engine="host",
                       initial_capacity=capacity)
        return run_sequence_interactive(tracker, dets)
    kw = dict(method="iou", iou_threshold=0.3, max_idle_epochs=5,
              capacity=capacity)
    if axis == "device_jv":
        out, _ = run_sequence_device(dets, assignment="native", **kw)
    elif axis == "auction":
        out, _ = run_sequence_device(dets, assignment="auction", **kw)
    elif axis == "auction_norecycle":
        out, _ = run_sequence_device(dets, assignment="auction",
                                     recycle_idle=False, **{
                                         **kw, "capacity": 4 * capacity})
    else:
        raise ValueError(axis)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ADVERSARIAL_r04.json")
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from similari_tpu.eval.metrics import clear_metrics, identity_metrics
    from similari_tpu.eval.synthetic import generate_adversarial_sequence

    results = {}
    lines = [
        "| Scenario | axis | MOTA | IDF1 | ΔMOTA vs host (pt) | ΔIDF1 (pt) |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    for scenario in SCENARIOS:
        capacity = 1024 if scenario == "capacity" else 256
        agg = {a: {"MOTA": [], "IDF1": []} for a in AXES}
        for seed in args.seeds:
            gt, dets = generate_adversarial_sequence(scenario, seed)
            for axis in AXES:
                pred = run_axis(axis, dets, capacity)
                cm = clear_metrics(gt, pred)
                im = identity_metrics(gt, pred)
                agg[axis]["MOTA"].append(cm["MOTA"] * 100)
                agg[axis]["IDF1"].append(im["IDF1"] * 100)
        base = {k: sum(v) / len(v) for k, v in agg["host"].items()}
        for axis in AXES:
            mota = sum(agg[axis]["MOTA"]) / len(agg[axis]["MOTA"])
            idf1 = sum(agg[axis]["IDF1"]) / len(agg[axis]["IDF1"])
            dm = mota - base["MOTA"]
            di = idf1 - base["IDF1"]
            if axis != "host":
                worst = max(worst, abs(dm), abs(di))
            results[f"{scenario}_{axis}"] = {
                "MOTA": round(mota, 2), "IDF1": round(idf1, 2),
                "dMOTA": round(dm, 2), "dIDF1": round(di, 2),
            }
            lines.append(
                f"| {scenario} | {axis} | {mota:.2f} | {idf1:.2f} | "
                f"{dm:+.2f} | {di:+.2f} |")
            log(f"{scenario:10s} {axis:18s} MOTA {mota:6.2f}  IDF1 {idf1:6.2f}"
                f"  d=({dm:+.2f}, {di:+.2f})")
    log("\n".join(lines))
    log(f"worst |delta| across non-host axes: {worst:.2f} pt "
        f"({'PASS' if worst <= 0.5 else 'FAIL'} vs the 0.5 pt parity bar)")
    blob = {
        "metric": "adversarial_accuracy_deltas",
        "parity_bar_pt": 0.5,
        "worst_abs_delta_pt": round(worst, 3),
        "seeds": args.seeds,
        "rows": results,
        "table_md": "\n".join(lines),
    }
    Path(args.out).write_text(json.dumps(blob, indent=1))
    print(json.dumps({"metric": "adversarial_worst_delta_pt",
                      "value": round(worst, 3), "pass": worst <= 0.5}))


if __name__ == "__main__":
    main()
