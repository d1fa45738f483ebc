"""Checkpoint/resume + SortVoting standalone + profiling utils."""

import numpy as np
import pytest

from similari_tpu import BoundingBox, PositionalMetricType, Sort
from similari_tpu.core.track import ObservationMetricOk
from similari_tpu.core.voting import SortVoting
from similari_tpu.trackers.visual import (
    VisualSort,
    VisualSortMetricType,
    VisualSortObservation,
    VisualSortObservationSet,
    VisualSortOptions,
)
from similari_tpu.utils.checkpoint import load_tracker, save_tracker
from similari_tpu.utils.profiling import StepTimer


def test_sort_checkpoint_roundtrip(tmp_path):
    t = Sort(shards=1, bbox_history=3, max_idle_epochs=5,
             method=PositionalMetricType.iou(0.3))
    for step in range(4):
        bb = BoundingBox(step * 0.1, 0.0, 10.0, 20.0)
        t.predict([(bb.as_xyaah(), 7)])
    path = tmp_path / "ckpt.npz"
    save_tracker(t, path)

    t2 = Sort(shards=1, bbox_history=3, max_idle_epochs=5,
              method=PositionalMetricType.iou(0.3))
    load_tracker(t2, path)
    assert t2.current_epoch() == 4

    # resumed tracker continues the same track
    bb = BoundingBox(0.5, 0.0, 10.0, 20.0)
    v = t2.predict([(bb.as_xyaah(), 7)])
    assert v[0].id == 1
    assert v[0].length == 5


def test_visual_checkpoint_roundtrip(tmp_path):
    opts = (
        VisualSortOptions()
        .max_idle_epochs(5)
        .visual_metric(VisualSortMetricType.euclidean(10.0))
        .positional_metric(PositionalMetricType.iou(0.3))
        .visual_minimal_track_length(1)
    )
    t = VisualSort(1, opts)
    s = VisualSortObservationSet()
    s.add(VisualSortObservation([0.1] * 16, 0.9,
                                BoundingBox(0, 0, 5, 10).as_xyaah(), 1))
    t.predict(s)
    path = tmp_path / "v.npz"
    save_tracker(t, path)

    t2 = VisualSort(1, opts)
    load_tracker(t2, path)
    assert t2._feature_dim == 16
    s2 = VisualSortObservationSet()
    s2.add(VisualSortObservation([0.1] * 16, 0.9,
                                 BoundingBox(0.1, 0, 5, 10).as_xyaah(), 2))
    v = t2.predict(s2)
    assert v[0].id == 1 and v[0].length == 2


def test_sort_voting_standalone():
    """Reference golden, `sort/voting.rs:110-174`."""
    v = SortVoting(0.3, 3, 3)
    recs = [
        ObservationMetricOk(10, 20, 0.6, None),
        ObservationMetricOk(10, 25, 0.4, None),
        ObservationMetricOk(10, 30, 0.4, None),
        ObservationMetricOk(11, 20, 0.5, None),
        ObservationMetricOk(11, 25, 0.69, None),
        ObservationMetricOk(11, 30, 0.4, None),
        ObservationMetricOk(12, 20, 0.2, None),
        ObservationMetricOk(12, 25, 0.27, None),
        ObservationMetricOk(12, 30, 0.28, None),
    ]
    assert v.winners(recs) == {10: [20], 11: [25], 12: [12]}


def test_step_timer():
    t = StepTimer()
    with t.step(scenes=4):
        pass
    assert t.total_scenes == 4
    assert t.scenes_per_sec > 0
    assert "steps_per_sec" in t.summary()


def test_checkpoint_preserves_oriented_flag_and_resets_host_engine():
    """Regression (round-3 review): the sticky per-scene `oriented` flag was
    dropped on save/load, and loading into a tracker that had stepped in
    host mode left a stale native session bound to pre-load buffers."""
    import numpy as np

    from similari_tpu.trackers import PositionalMetricType, Sort
    from similari_tpu.utils.checkpoint import load_tracker, save_tracker

    t1 = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
              method=PositionalMetricType.iou(0.3))
    rot = np.array([[50.0, 50, 0.6, 1.0, 20]], np.float32)
    conf = np.ones((1,), np.float32)
    _, ids0, _, _, _ = t1.predict_arrays(0, rot, conf)
    assert t1._scenes[0].oriented
    save_tracker(t1, "/tmp/ckpt_oriented.npz")

    t2 = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
              method=PositionalMetricType.iou(0.3))
    # step the fresh tracker in HOST mode first (axis-aligned) so load must
    # clear the host/session residue
    t2.predict_arrays(1, np.array([[5.0, 5, 0, 1, 10]], np.float32), conf)
    assert t2._scenes[1].host
    load_tracker(t2, "/tmp/ckpt_oriented.npz")
    assert t2._scenes[0].oriented
    assert not t2._scenes[0].host and t2._scenes[0].session is None
    # restored rotated track must keep its id through the device engine
    rot2 = rot.copy(); rot2[0, 0] += 1
    _, ids1, _, _, _ = t2.predict_arrays(0, rot2, conf)
    np.testing.assert_array_equal(ids1, ids0)
