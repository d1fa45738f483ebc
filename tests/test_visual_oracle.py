"""Property test: the fused visual step vs a literal reference pipeline oracle."""

import numpy as np
import pytest

from reference_visual import RefVisualSort
from similari_tpu import BoundingBox
from similari_tpu.trackers import PositionalMetricType
from similari_tpu.trackers.visual import (
    VisualSort,
    VisualSortMetricType,
    VisualSortObservation,
    VisualSortObservationSet,
    VisualSortOptions,
)
from similari_tpu.trackers.sort import VotingType


def run_stream(engine, seed, n_objects, steps, feat_dim=16, p_feat=0.8,
               quality_lo=0.4, mtl=2, min_votes=1, q_use=0.5, q_collect=0.6,
               visual_kind="euclidean", visual_threshold=2.0,
               positional_kind="iou"):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 400, size=(n_objects, 2)).astype(np.float32)
    identities = rng.normal(size=(n_objects, feat_dim)).astype(np.float32) * 3

    opts = (
        VisualSortOptions()
        .max_idle_epochs(5)
        .kept_history_length(1)
        .visual_metric(
            VisualSortMetricType.euclidean(visual_threshold)
            if visual_kind == "euclidean"
            else VisualSortMetricType.cosine(visual_threshold)
        )
        .positional_metric(
            PositionalMetricType.iou(0.3)
            if positional_kind == "iou"
            else PositionalMetricType.maha()
        )
        .visual_minimal_track_length(mtl)
        .visual_minimal_quality_use(q_use)
        .visual_minimal_quality_collect(q_collect)
        .visual_max_observations(4)
        .visual_min_votes(min_votes)
    )
    dev = VisualSort(1, opts, assignment_backend="hungarian", engine=engine)
    ref = RefVisualSort(
        iou_threshold=0.3,
        positional_kind=positional_kind,
        visual_kind=visual_kind,
        visual_threshold=visual_threshold,
        minimal_track_length=mtl,
        quality_use=q_use,
        quality_collect=q_collect,
        max_observations=4,
        min_votes=min_votes,
        max_idle_epochs=5,
    )

    mismatch_id = mismatch_vt = total = 0
    for step in range(steps):
        xy += rng.uniform(-3, 3, size=xy.shape).astype(np.float32)
        boxes, confs, feats, quals = [], [], [], []
        obs_set = VisualSortObservationSet()
        for i in range(n_objects):
            w, h = 20.0, 40.0
            z = np.array([xy[i, 0], xy[i, 1], 0.0, w / h, h], np.float32)
            conf = 1.0
            has_feat = rng.uniform() < p_feat
            feat = (
                (identities[i] + rng.normal(size=feat_dim) * 0.05).astype(np.float32)
                if has_feat
                else None
            )
            q = float(rng.uniform(quality_lo, 1.0))
            boxes.append(z)
            confs.append(conf)
            feats.append(feat)
            quals.append(q)
            bb = BoundingBox.new_with_confidence(
                float(z[0] - w / 2), float(z[1] - h / 2), w, h, conf
            ).as_xyaah()
            obs_set.add(VisualSortObservation(feat, q, bb, i))

        dev_tracks = dev.predict(obs_set)
        ref_ids, ref_vt = ref.predict(boxes, confs, feats, quals)
        for i, tr in enumerate(dev_tracks):
            total += 1
            if tr.id != ref_ids[i]:
                mismatch_id += 1
            want_vt = (
                VotingType.Visual if ref_vt[i] == "visual" else VotingType.Positional
            )
            if tr.voting_type != want_vt:
                mismatch_vt += 1
    return mismatch_id, mismatch_vt, total


@pytest.mark.parametrize("engine", ["host", "device"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_visual_step_matches_oracle(seed, engine):
    mid, mvt, total = run_stream(engine, seed, n_objects=10, steps=10)
    assert mid == 0, f"{mid}/{total} id mismatches"
    assert mvt <= 0.02 * total, f"{mvt}/{total} voting-type mismatches"


@pytest.mark.parametrize("engine", ["host", "device"])
@pytest.mark.parametrize("seed", [0, 3])
def test_visual_cosine_matches_oracle(seed, engine):
    """Cosine ReID metric (`VisualSortMetricType::Cosine`,
    `visual_sort/metric.rs:52-65`): similarity-thresholded, weight = 1 - sim."""
    mid, mvt, total = run_stream(engine, seed, n_objects=10, steps=10,
        visual_kind="cosine", visual_threshold=0.7,
    )
    assert mid == 0, f"{mid}/{total} id mismatches"
    assert mvt <= 0.02 * total, f"{mvt}/{total} voting-type mismatches"


@pytest.mark.parametrize("engine", ["host", "device"])
@pytest.mark.parametrize("seed", [0, 4])
def test_visual_maha_positional_matches_oracle(seed, engine):
    """Mahalanobis positional fallback (`PositionalMetricType::Mahalanobis`,
    `sort/metric.rs:58-72` via the visual cascade's second stage)."""
    mid, mvt, total = run_stream(engine, seed, n_objects=10, steps=10, positional_kind="maha",
    )
    assert mid == 0, f"{mid}/{total} id mismatches"
    assert mvt <= 0.02 * total, f"{mvt}/{total} voting-type mismatches"


@pytest.mark.parametrize("engine", ["host", "device"])
def test_visual_oracle_with_gates_and_dropouts(engine):
    mid, mvt, total = run_stream(
        engine, 7, n_objects=14, steps=12, p_feat=0.6, quality_lo=0.3, mtl=3,
        min_votes=2,
    )
    assert mid <= 0.01 * total, f"{mid}/{total} id mismatches"
