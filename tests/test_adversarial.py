"""Adversarial accuracy deltas (round-4 VERDICT item 8, reduced CI subset).

The full 5-scenario x 4-axis suite is `tools/adversarial_suite.py`
(artifact: ADVERSARIAL_rNN.json); this test keeps two adversarial
scenarios in CI and asserts the BASELINE.json parity bar: every engine
axis within 0.5 pt MOTA/IDF1 of the host exact-JV baseline.
"""

import numpy as np
import pytest

from similari_tpu.eval.metrics import clear_metrics, identity_metrics
from similari_tpu.eval.mot import run_sequence_device, run_sequence_interactive
from similari_tpu.eval.synthetic import generate_adversarial_sequence
from similari_tpu.trackers import PositionalMetricType, Sort


def _axis(axis, dets, capacity=256):
    if axis == "host":
        tracker = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
                       method=PositionalMetricType.iou(0.3), engine="host",
                       initial_capacity=capacity)
        return run_sequence_interactive(tracker, dets)
    assignment = "auction" if axis.startswith("auction") else "native"
    out, _ = run_sequence_device(
        dets, method="iou", iou_threshold=0.3, max_idle_epochs=5,
        capacity=capacity, assignment=assignment,
        recycle_idle=not axis.endswith("norecycle"))
    return out


@pytest.mark.parametrize("scenario", ["crossing", "idle_gaps"])
def test_adversarial_axes_within_parity_bar(scenario):
    gt, dets = generate_adversarial_sequence(scenario, seed=0, n_frames=80)
    scores = {}
    for axis in ("host", "auction", "auction_norecycle"):
        pred = _axis(axis, dets, capacity=256 if axis != "auction_norecycle"
                     else 1024)
        scores[axis] = (
            clear_metrics(gt, pred)["MOTA"] * 100,
            identity_metrics(gt, pred)["IDF1"] * 100,
        )
    base = scores["host"]
    for axis, (mota, idf1) in scores.items():
        assert abs(mota - base[0]) <= 0.5, (scenario, axis, scores)
        assert abs(idf1 - base[1]) <= 0.5, (scenario, axis, scores)


def test_adversarial_visual_axes_within_parity_bar():
    """VisualSORT engine axes on a ReID-featured adversarial stream
    (round-5 VERDICT item 1, reduced CI subset: host engine vs device
    auction vs the production bf16 gallery)."""
    from similari_tpu.eval.mot import (
        run_sequence_device_visual,
        run_sequence_interactive_visual,
    )
    from similari_tpu.eval.synthetic import (
        generate_reid_adversarial_sequence,
    )
    from similari_tpu.trackers import (
        VisualSort, VisualSortMetricType, VisualSortOptions,
    )

    gt, dets, feats, quals = generate_reid_adversarial_sequence(
        "reid_crossing", seed=0, n_frames=80)
    kw = dict(visual_kind="cosine", visual_threshold=0.5,
              minimal_track_length=3, iou_threshold=0.3, max_idle_epochs=5,
              gallery=3, capacity=256, qualities=quals,
              visual_minimal_quality_use=0.2,
              visual_minimal_quality_collect=0.6)
    opts = VisualSortOptions()
    opts.visual_metric(VisualSortMetricType.cosine(0.5))
    opts.visual_minimal_track_length(3)
    opts.visual_max_observations(3)
    opts.max_idle_epochs(5)
    opts.visual_minimal_quality_use(0.2)
    opts.visual_minimal_quality_collect(0.6)
    host = VisualSort(1, opts, initial_capacity=256, engine="host",
                      assignment_backend="native")
    scores = {}
    pred = run_sequence_interactive_visual(host, dets, feats, quals)
    scores["vhost"] = (clear_metrics(gt, pred)["MOTA"] * 100,
                       identity_metrics(gt, pred)["IDF1"] * 100)
    for axis, fp in (("vauction", "f32"), ("vbf16", "bf16")):
        pred, _ = run_sequence_device_visual(
            dets, feats, assignment="auction", feature_precision=fp, **kw)
        scores[axis] = (clear_metrics(gt, pred)["MOTA"] * 100,
                        identity_metrics(gt, pred)["IDF1"] * 100)
    base = scores["vhost"]
    for axis, (mota, idf1) in scores.items():
        assert abs(mota - base[0]) <= 0.5, (axis, scores)
        assert abs(idf1 - base[1]) <= 0.5, (axis, scores)


def test_idle_gap_scenario_shapes():
    """Gaps must actually remove detections while gt keeps the objects."""
    gt, dets = generate_adversarial_sequence("idle_gaps", seed=1)
    n_gt = sum(len(v) for v in gt.values())
    n_det = sum(len(v) for v in dets.values())
    assert n_det < n_gt  # windows carved out
    assert n_det > 0.8 * n_gt  # but most detections survive
