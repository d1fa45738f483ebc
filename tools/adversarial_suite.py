#!/usr/bin/env python
"""Adversarial accuracy suite (round-4 VERDICT item 8 + round-5 item 1).

Runs occlusion/churn-heavy synthetic scenarios through the full tracking
stack and reports MOTA/IDF1 across the engine axes that could plausibly
diverge.  Two families:

SORT scenarios (crossing, fp_burst, idle_gaps, churn, capacity), axes:
  host      — interactive host engine (native C++ step, exact JV voting)
  device_jv — jitted device scan with the exact host-callback JV solver
  auction   — jitted device scan with the on-device Jacobi auction
  auction_norecycle — auction without in-step idle recycling (capacity
              sized up so nothing overflows)

VisualSORT scenarios (round-5: ReID-featured streams with feature drift
and occlusion-correlated quality, the regime of the reference's recorded
regression `/root/reference/python/bugfixes/bug_vs_1/`), per-scenario axes
over the cascade (`/root/reference/src/trackers/visual_sort/voting.rs:45-101`):
  reid_crossing — vhost (host engine, exact JV) / vdevice_jv / vauction /
                  vbf16 (the production bf16 gallery) / vpallas (the fused
                  on-chip kernel, interpret-mode on CPU)
  reid_gaps     — vhost / vauction / vbf16 / vpallas
  reid_oriented — vhost / vauction / vbf16 (rotated boxes through the
                  clip kernels; pallas kernel is aligned-only)
  reid_ownarea  — own-area gating ON: exact f64 polygon shares via the
                  host engine (baseline) and via the device step, vs the
                  device inclusion-exclusion kernel (ops/ownarea.py)
  reid_maha     — Mahalanobis positional metric inside the cascade:
                  vhost / vauction / vbf16

The crossing geometry is tightened (round-5) until the cost matrices hold
genuine near-ties — sigma=3 px noise on 34-px boxes, passes within ~5 px —
so every axis PAYS id-switches (absolute scores < 100) and the suite
certifies the deltas between axes, not just agreement on easy streams.
The parity bar is BASELINE.json's: every axis within 0.5 pt MOTA/IDF1 of
its scenario baseline.  Output: a markdown table on stderr and one JSON
artifact (default ADVERSARIAL_r05.json).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SORT_SCENARIOS = ("crossing", "fp_burst", "idle_gaps", "churn", "capacity")
SORT_AXES = ("host", "device_jv", "auction", "auction_norecycle")

REID_AXES = {
    "reid_crossing": ("vhost", "vdevice_jv", "vauction", "vbf16", "vpallas"),
    "reid_confusable": ("vhost", "vauction", "vbf16", "vpallas"),
    "reid_gaps": ("vhost", "vauction", "vbf16", "vpallas"),
    "reid_oriented": ("vhost", "vauction", "vbf16"),
    "reid_ownarea": ("vhost_oa", "vdevice_oa_host", "vdevice_oa_dev"),
    "reid_maha": ("vhost_maha", "vauction_maha", "vbf16_maha"),
}

# shared VisualSORT configuration (host opts and device cfg built from the
# same numbers; quality gates nonzero so the occlusion-degraded features
# actually engage them)
VIS = dict(
    visual_kind="cosine", visual_threshold=0.5, minimal_track_length=3,
    iou_threshold=0.3, max_idle_epochs=5, gallery=3,
    quality_use=0.2, quality_collect=0.6,
)
OWN_AREA = dict(own_area_use=0.4, own_area_collect=0.6)


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


def _host_visual_tracker(maha=False, own_area=False, capacity=256):
    from similari_tpu.trackers import (
        PositionalMetricType, VisualSort, VisualSortMetricType,
        VisualSortOptions,
    )

    opts = VisualSortOptions()
    opts.visual_metric(VisualSortMetricType.cosine(VIS["visual_threshold"]))
    opts.positional_metric(
        PositionalMetricType.maha() if maha
        else PositionalMetricType.iou(VIS["iou_threshold"]))
    opts.visual_minimal_track_length(VIS["minimal_track_length"])
    opts.visual_max_observations(VIS["gallery"])
    opts.max_idle_epochs(VIS["max_idle_epochs"])
    opts.visual_minimal_quality_use(VIS["quality_use"])
    opts.visual_minimal_quality_collect(VIS["quality_collect"])
    if own_area:
        opts.visual_minimal_own_area_percentage_use(OWN_AREA["own_area_use"])
        opts.visual_minimal_own_area_percentage_collect(
            OWN_AREA["own_area_collect"])
        opts.own_area_backend("host")  # exact f64 polygon oracle
    return VisualSort(1, opts, initial_capacity=capacity, engine="host",
                      assignment_backend="native")


def run_visual_axis(axis, dets, feats, quals, capacity, oriented=False):
    from similari_tpu.eval.mot import (
        run_sequence_device_visual,
        run_sequence_interactive_visual,
    )

    if axis.startswith("vhost"):
        tracker = _host_visual_tracker(
            maha=axis.endswith("_maha"), own_area=axis.endswith("_oa"),
            capacity=capacity)
        return run_sequence_interactive_visual(tracker, dets, feats, quals)

    kw = dict(
        visual_kind=VIS["visual_kind"],
        visual_threshold=VIS["visual_threshold"],
        minimal_track_length=VIS["minimal_track_length"],
        iou_threshold=VIS["iou_threshold"],
        max_idle_epochs=VIS["max_idle_epochs"],
        gallery=VIS["gallery"],
        capacity=capacity,
        qualities=quals,
        visual_minimal_quality_use=VIS["quality_use"],
        visual_minimal_quality_collect=VIS["quality_collect"],
        oriented=oriented,
    )
    if axis == "vdevice_jv":
        out, _ = run_sequence_device_visual(
            dets, feats, assignment="native", feature_precision="f32", **kw)
    elif axis == "vauction":
        out, _ = run_sequence_device_visual(
            dets, feats, assignment="auction", feature_precision="f32", **kw)
    elif axis == "vbf16":
        out, _ = run_sequence_device_visual(
            dets, feats, assignment="auction", feature_precision="bf16", **kw)
    elif axis == "vpallas":
        out, _ = run_sequence_device_visual(
            dets, feats, engine="pallas", assignment="auction",
            feature_precision="f32", **kw)
    elif axis == "vdevice_oa_host":
        out, _ = run_sequence_device_visual(
            dets, feats, assignment="native", feature_precision="f32",
            own_area_backend="host", **OWN_AREA, **kw)
    elif axis == "vdevice_oa_dev":
        out, _ = run_sequence_device_visual(
            dets, feats, assignment="native", feature_precision="f32",
            own_area_backend="device", **OWN_AREA, **kw)
    elif axis == "vauction_maha":
        out, _ = run_sequence_device_visual(
            dets, feats, assignment="auction", feature_precision="f32",
            positional_kind="maha", **kw)
    elif axis == "vbf16_maha":
        out, _ = run_sequence_device_visual(
            dets, feats, assignment="auction", feature_precision="bf16",
            positional_kind="maha", **kw)
    else:
        raise ValueError(axis)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ADVERSARIAL_r05.json")
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    ap.add_argument("--family", choices=["sort", "visual", "all"],
                    default="all")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from similari_tpu.eval.metrics import clear_metrics, identity_metrics
    from similari_tpu.eval.synthetic import (
        generate_adversarial_sequence,
        generate_reid_adversarial_sequence,
    )

    results = {}
    lines = [
        "| Scenario | axis | MOTA | IDF1 | ΔMOTA vs baseline (pt) | ΔIDF1 (pt) |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    nonzero = 0

    def score_block(scenario, axes, runner):
        nonlocal worst, nonzero
        agg = {a: {"MOTA": [], "IDF1": []} for a in axes}
        for seed in args.seeds:
            streams = runner.make(seed)
            for axis in axes:
                pred = runner.run(axis, streams)
                gt = streams[0]
                cm = clear_metrics(gt, pred)
                im = identity_metrics(gt, pred)
                agg[axis]["MOTA"].append(cm["MOTA"] * 100)
                agg[axis]["IDF1"].append(im["IDF1"] * 100)
                log(f"  seed {seed} {axis:18s} MOTA "
                    f"{agg[axis]['MOTA'][-1]:6.2f}  IDF1 "
                    f"{agg[axis]['IDF1'][-1]:6.2f}")
        base = {k: sum(v) / len(v) for k, v in agg[axes[0]].items()}
        for axis in axes:
            mota = sum(agg[axis]["MOTA"]) / len(agg[axis]["MOTA"])
            idf1 = sum(agg[axis]["IDF1"]) / len(agg[axis]["IDF1"])
            dm = mota - base["MOTA"]
            di = idf1 - base["IDF1"]
            if axis != axes[0]:
                worst = max(worst, abs(dm), abs(di))
                if abs(dm) > 1e-9 or abs(di) > 1e-9:
                    nonzero += 1
            results[f"{scenario}_{axis}"] = {
                "MOTA": round(mota, 2), "IDF1": round(idf1, 2),
                "dMOTA": round(dm, 2), "dIDF1": round(di, 2),
            }
            lines.append(
                f"| {scenario} | {axis} | {mota:.2f} | {idf1:.2f} | "
                f"{dm:+.2f} | {di:+.2f} |")
            log(f"{scenario:14s} {axis:18s} MOTA {mota:6.2f}  IDF1 "
                f"{idf1:6.2f}  d=({dm:+.2f}, {di:+.2f})")

    class SortRunner:
        def __init__(self, scenario):
            self.scenario = scenario
            self.capacity = 1024 if scenario == "capacity" else 256

        def make(self, seed):
            # 240 frames: the tightened crossing needs the long stream (the
            # columns bounce and re-cross) for smooth delta statistics
            return generate_adversarial_sequence(self.scenario, seed,
                                                 n_frames=240)

        def run(self, axis, streams):
            gt, dets = streams
            return run_axis(axis, dets, self.capacity)

    class VisualRunner:
        def __init__(self, scenario):
            self.scenario = scenario
            self.capacity = 256
            base = {"reid_ownarea": "reid_crossing",
                    "reid_maha": "reid_crossing"}.get(scenario, scenario)
            self.stream_scenario = base
            self.oriented = scenario == "reid_oriented"

        def make(self, seed):
            return generate_reid_adversarial_sequence(
                self.stream_scenario, seed)

        def run(self, axis, streams):
            gt, dets, feats, quals = streams
            return run_visual_axis(axis, dets, feats, quals, self.capacity,
                                   oriented=self.oriented)

    if args.family in ("sort", "all"):
        for scenario in SORT_SCENARIOS:
            score_block(scenario, SORT_AXES, SortRunner(scenario))
    if args.family in ("visual", "all"):
        for scenario, axes in REID_AXES.items():
            score_block(scenario, axes, VisualRunner(scenario))

    log("\n".join(lines))
    log(f"worst |delta| across non-baseline axes: {worst:.2f} pt "
        f"({'PASS' if worst <= 0.5 else 'FAIL'} vs the 0.5 pt parity bar); "
        f"{nonzero} axis rows with a nonzero delta")
    blob = {
        "metric": "adversarial_accuracy_deltas",
        "parity_bar_pt": 0.5,
        "worst_abs_delta_pt": round(worst, 3),
        "nonzero_delta_rows": nonzero,
        "seeds": args.seeds,
        "rows": results,
        "table_md": "\n".join(lines),
    }
    Path(args.out).write_text(json.dumps(blob, indent=1))
    print(json.dumps({"metric": "adversarial_worst_delta_pt",
                      "value": round(worst, 3), "pass": worst <= 0.5,
                      "nonzero_delta_rows": nonzero}))


if __name__ == "__main__":
    main()
