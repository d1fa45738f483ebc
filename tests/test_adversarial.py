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


def test_idle_gap_scenario_shapes():
    """Gaps must actually remove detections while gt keeps the objects."""
    gt, dets = generate_adversarial_sequence("idle_gaps", seed=1)
    n_gt = sum(len(v) for v in gt.values())
    n_det = sum(len(v) for v in dets.values())
    assert n_det < n_gt  # windows carved out
    assert n_det > 0.8 * n_gt  # but most detections survive
