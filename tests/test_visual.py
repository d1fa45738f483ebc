"""VisualSORT end-to-end tests mirroring the reference scenario
(`/root/reference/src/trackers/visual_sort/simple_api.rs:316-667`) — walks the
feature-gallery state machine: collect/use quality gates, minimal track
length, visual-vs-positional cascade voting."""

import numpy as np
import pytest

from similari_tpu import BoundingBox
from similari_tpu.trackers import PositionalMetricType, VotingType
from similari_tpu.trackers.visual import (
    VisualSort,
    VisualSortMetricType,
    VisualSortObservation,
    VisualSortObservationSet,
    VisualSortOptions,
)


def obs_set(*observations):
    s = VisualSortObservationSet()
    for o in observations:
        s.add(o)
    return s


def make_tracker():
    opts = (
        VisualSortOptions()
        .max_idle_epochs(3)
        .kept_history_length(3)
        .visual_metric(VisualSortMetricType.euclidean(1.0))
        .positional_metric(PositionalMetricType.maha())
        .visual_minimal_track_length(2)
        .visual_minimal_area(5.0)
        .visual_minimal_quality_use(0.45)
        .visual_minimal_quality_collect(0.7)
        .visual_max_observations(3)
        .visual_min_votes(2)
    )
    return VisualSort(1, opts)


def scene_state(tracker, scene_id, slot):
    st = tracker._scenes[scene_id].state
    return {
        "collected": int(np.asarray(st.collected)[slot]),
        "length": int(np.asarray(st.length)[slot]),
    }


def test_visual_sort_scenario():
    tracker = make_tracker()

    # new track
    tracks = tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                [1.0, 1.0], 0.9, BoundingBox(1.0, 1.0, 3.0, 5.0).as_xyaah(), 13
            )
        ),
    )
    t = tracks[0]
    assert t.custom_object_id == 13
    assert t.scene_id == 10
    assert t.voting_type == VotingType.Positional
    assert t.epoch == 1
    first_track_id = t.id
    slot = None
    st = tracker._scenes[10].state
    slot = int(np.nonzero(np.asarray(st.active))[0][0])
    s = scene_state(tracker, 10, slot)
    assert s["collected"] == 1 and s["length"] == 1

    # another scene — new track
    tracks = tracker.predict_with_scene(
        1,
        obs_set(
            VisualSortObservation(
                [1.0, 1.0], 0.9, BoundingBox(1.0, 1.0, 3.0, 5.0).as_xyaah(), 133
            )
        ),
    )
    assert tracks[0].custom_object_id == 133
    assert tracks[0].scene_id == 1
    assert tracks[0].voting_type == VotingType.Positional

    # merge by bbox position (track too short for visual voting)
    tracks = tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                [0.95, 0.95], 0.93, BoundingBox(1.1, 1.1, 3.05, 5.01).as_xyaah(), 15
            )
        ),
    )
    t = tracks[0]
    assert t.id == first_track_id
    assert t.voting_type == VotingType.Positional
    assert t.epoch == 2
    s = scene_state(tracker, 10, slot)
    assert s["collected"] == 2 and s["length"] == 2

    # no visual feature at all -> positional merge, nothing collected
    tracks = tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                None, 0.93, BoundingBox(1.11, 1.15, 3.15, 5.05).as_xyaah(), 25
            )
        ),
    )
    t = tracks[0]
    assert t.id == first_track_id
    assert t.voting_type == VotingType.Positional
    s = scene_state(tracker, 10, slot)
    assert s["collected"] == 2 and s["length"] == 3

    # again no feature
    tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                None, 0.93, BoundingBox(1.15, 1.25, 3.10, 5.05).as_xyaah(), 2
            )
        ),
    )
    s = scene_state(tracker, 10, slot)
    assert s["collected"] == 2 and s["length"] == 4

    # low quality: not usable, not collectable -> positional, not collected
    tracks = tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                [0.97, 0.97], 0.44, BoundingBox(1.15, 1.25, 3.10, 5.05).as_xyaah(), 2
            )
        ),
    )
    assert tracks[0].voting_type == VotingType.Positional
    s = scene_state(tracker, 10, slot)
    assert s["collected"] == 2 and s["length"] == 5

    # usable but not collectable -> VISUAL merge, not collected
    tracks = tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                [0.97, 0.97], 0.6, BoundingBox(1.15, 1.25, 3.10, 5.05).as_xyaah(), 2
            )
        ),
    )
    assert tracks[0].voting_type == VotingType.Visual
    s = scene_state(tracker, 10, slot)
    assert s["collected"] == 2 and s["length"] == 6

    # usable and collectable -> VISUAL merge, collected
    tracks = tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                [0.97, 0.97], 0.8, BoundingBox(1.15, 1.25, 3.10, 5.05).as_xyaah(), 2
            )
        ),
    )
    assert tracks[0].voting_type == VotingType.Visual
    s = scene_state(tracker, 10, slot)
    assert s["collected"] == 3 and s["length"] == 7

    # far-away box -> second track
    tracks = tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                [0.1, 0.1], 0.9, BoundingBox(10.0, 10.0, 3.0, 5.0).as_xyaah(), 33
            )
        ),
    )
    t = tracks[0]
    assert t.custom_object_id == 33
    assert t.voting_type == VotingType.Positional
    assert t.epoch == 8
    assert t.id != first_track_id
    other_track_id = t.id

    # second segment: still positional (collected < minimal_track_length)
    tracks = tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                [0.12, 0.15], 0.88, BoundingBox(10.1, 10.1, 3.0, 5.0).as_xyaah(), 35
            )
        ),
    )
    assert tracks[0].id == other_track_id
    assert tracks[0].voting_type == VotingType.Positional

    # third segment: now visual
    tracks = tracker.predict_with_scene(
        10,
        obs_set(
            VisualSortObservation(
                [0.12, 0.14], 0.87, BoundingBox(10.1, 10.1, 3.0, 5.0).as_xyaah(), 31
            )
        ),
    )
    assert tracks[0].id == other_track_id
    assert tracks[0].voting_type == VotingType.Visual

    # waste everything
    tracker.skip_epochs_for_scene(10, 5)
    wasted = tracker.wasted()
    ids = sorted(w.id for w in wasted)
    assert first_track_id in ids and other_track_id in ids
    w = [x for x in wasted if x.id == first_track_id][0]
    assert w.length == 7
    assert len(w.observed_boxes) == 3  # kept_history_length
    assert w.observed_features[-1] is not None


def test_two_objects_reid_by_feature():
    """Identity held by appearance when geometry is ambiguous."""
    opts = (
        VisualSortOptions()
        .max_idle_epochs(5)
        .kept_history_length(2)
        .visual_metric(VisualSortMetricType.cosine(0.2))
        .positional_metric(PositionalMetricType.iou(0.3))
        .visual_minimal_track_length(1)
        .visual_max_observations(5)
        .visual_min_votes(1)
    )
    tracker = VisualSort(1, opts)
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=32).astype(np.float32)
    f2 = -f1  # orthogonal-ish identity

    ids = None
    for step in range(6):
        y = step * 0.5
        s = obs_set(
            VisualSortObservation(
                f1 + rng.normal(size=32) * 0.01, 0.9,
                BoundingBox(0.0, y, 10.0, 20.0).as_xyaah(), 1,
            ),
            VisualSortObservation(
                f2 + rng.normal(size=32) * 0.01, 0.9,
                BoundingBox(3.0, y, 10.0, 20.0).as_xyaah(), 2,
            ),
        )
        tracks = tracker.predict(s)
        cur = {t.custom_object_id: t.id for t in tracks}
        if ids is None:
            ids = cur
            assert cur[1] != cur[2]
        else:
            assert cur == ids


def test_gallery_eviction_by_quality():
    """Gallery keeps the max_observations best-quality features."""
    opts = (
        VisualSortOptions()
        .max_idle_epochs(5)
        .visual_metric(VisualSortMetricType.euclidean(10.0))
        .positional_metric(PositionalMetricType.iou(0.3))
        .visual_minimal_track_length(1)
        .visual_max_observations(3)
        .visual_min_votes(1)
    )
    tracker = VisualSort(1, opts)
    qualities = [0.5, 0.9, 0.3, 0.8, 0.7]
    for i, q in enumerate(qualities):
        s = obs_set(
            VisualSortObservation(
                [float(i), float(i)], q, BoundingBox(0.0, 0.0, 10.0, 20.0).as_xyaah(), 1
            )
        )
        tracker.predict(s)
    st = tracker._scenes[0].state
    slot = int(np.nonzero(np.asarray(st.active))[0][0])
    valid = np.asarray(st.feat_valid)[slot]
    q = np.asarray(st.feat_quality)[slot][valid]
    assert valid.sum() == 3
    # the newest (0.7) is always kept; the rest are the best of the old ones
    assert sorted(q.tolist(), reverse=True) == pytest.approx([0.9, 0.8, 0.7])


def test_empty_and_no_feature_predicts():
    tracker = make_tracker()
    assert tracker.predict(obs_set()) == []
    tracks = tracker.predict(
        obs_set(
            VisualSortObservation(
                None, None, BoundingBox(0.0, 0.0, 5.0, 10.0).as_xyaah(), None
            )
        )
    )
    assert len(tracks) == 1
    assert tracks[0].voting_type == VotingType.Positional
