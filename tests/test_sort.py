"""End-to-end Sort tracker tests, mirroring the reference scenarios
(`/root/reference/src/trackers/sort/simple_api.rs:271-433`)."""

import numpy as np
import pytest

from similari_tpu import BoundingBox, Universal2DBox
from similari_tpu.trackers import (
    PositionalMetricType,
    Sort,
    SpatioTemporalConstraints,
)


def make_sort(**kw):
    args = dict(
        shards=1,
        bbox_history=10,
        max_idle_epochs=2,
        method=PositionalMetricType.iou(0.3),
        min_confidence=0.05,
    )
    args.update(kw)
    return Sort(**args)


def test_sort_scenario():
    t = make_sort()
    assert t.current_epoch() == 0

    bb = BoundingBox(0.0, 0.0, 10.0, 20.0)
    v = t.predict([(bb.as_xyaah(), None)])
    assert t.wasted() == []
    assert len(v) == 1
    track_id = v[0].id
    assert v[0].custom_object_id is None
    assert v[0].length == 1
    assert v[0].observed_bbox == bb.as_xyaah()
    assert v[0].epoch == 1
    assert t.current_epoch() == 1

    bb = BoundingBox(0.1, 0.1, 10.1, 20.0)
    v = t.predict([(bb.as_xyaah(), 2)])
    assert t.wasted() == []
    assert len(v) == 1
    assert v[0].custom_object_id == 2
    assert v[0].id == track_id
    assert v[0].length == 2
    assert v[0].observed_bbox == bb.as_xyaah()
    assert v[0].epoch == 2

    # far away box -> new track
    bb = BoundingBox(10.1, 10.1, 10.1, 20.0)
    v = t.predict([(bb.as_xyaah(), 3)])
    assert len(v) == 1
    assert v[0].custom_object_id == 3
    assert v[0].id != track_id
    assert t.wasted() == []
    assert t.current_epoch() == 3

    assert t.predict([]) == []
    assert t.wasted() == []
    assert t.current_epoch() == 4

    assert t.predict([]) == []
    wasted = t.wasted()
    assert len(wasted) == 1
    assert wasted[0].id == track_id
    assert t.current_epoch() == 5


def test_sort_with_scenes():
    t = make_sort()
    bb = BoundingBox(0.0, 0.0, 10.0, 20.0)
    assert t.current_epoch_with_scene(1) == 0
    assert t.current_epoch_with_scene(2) == 0

    t.predict_with_scene(1, [(bb.as_xyaah(), 4)])
    t.predict_with_scene(1, [(bb.as_xyaah(), 5)])
    assert t.current_epoch_with_scene(1) == 2
    assert t.current_epoch_with_scene(2) == 0

    t.predict_with_scene(2, [(bb.as_xyaah(), 6)])
    assert t.current_epoch_with_scene(1) == 2
    assert t.current_epoch_with_scene(2) == 1


def test_scene_isolation():
    """Same box in two scenes must form two distinct tracks."""
    t = make_sort()
    bb = BoundingBox(0.0, 0.0, 10.0, 20.0)
    v1 = t.predict_with_scene(1, [(bb.as_xyaah(), None)])
    v2 = t.predict_with_scene(2, [(bb.as_xyaah(), None)])
    assert v1[0].id != v2[0].id
    assert v1[0].scene_id == 1 and v2[0].scene_id == 2


def test_idle_tracks():
    t = make_sort()
    bb = BoundingBox(0.0, 0.0, 10.0, 20.0)
    t.predict_with_scene(1, [(bb.as_xyaah(), 4)])
    assert t.idle_tracks_with_scene(1) == []
    t.predict_with_scene(1, [])
    idle = t.idle_tracks_with_scene(1)
    assert len(idle) == 1
    assert idle[0].id == 1
    assert idle[0].custom_object_id == 4


def test_clear_wasted():
    t = make_sort()
    bb = BoundingBox(0.0, 0.0, 10.0, 20.0)
    t.predict_with_scene(1, [(bb.as_xyaah(), 4)])
    t.skip_epochs_for_scene(1, 3)
    assert len(t._wasted_bin) == 1
    t.clear_wasted()
    assert t.wasted() == []


def test_maha_tracking():
    t = make_sort(method=PositionalMetricType.maha(), max_idle_epochs=5)
    ids = set()
    for step in range(5):
        bb = BoundingBox(0.0 + step, 0.0 + step * 0.5, 10.0, 20.0)
        v = t.predict([(bb.as_xyaah(), None)])
        assert len(v) == 1
        ids.add(v[0].id)
        assert v[0].length == step + 1
    assert len(ids) == 1  # one stable track through the motion


def test_two_objects_iou():
    t = make_sort(max_idle_epochs=5)
    ids0 = None
    for step in range(6):
        b1 = BoundingBox(0.0 + step * 0.3, 0.0, 8.0, 16.0)
        b2 = BoundingBox(40.0 - step * 0.3, 5.0, 8.0, 16.0)
        v = t.predict([(b1.as_xyaah(), 1), (b2.as_xyaah(), 2)])
        assert len(v) == 2
        cur = {tr.custom_object_id: tr.id for tr in v}
        if ids0 is None:
            ids0 = cur
            assert cur[1] != cur[2]
        else:
            assert cur == ids0


def test_crossing_objects_maha():
    """Two objects whose tracks approach each other keep identities (Maha)."""
    t = make_sort(method=PositionalMetricType.maha(), max_idle_epochs=5)
    ids = None
    for step in range(8):
        y1 = 0.0 + step * 2.0
        y2 = 30.0 - step * 2.0
        b1 = BoundingBox(0.0, y1, 8.0, 16.0)
        b2 = BoundingBox(2.0, y2, 8.0, 16.0)
        v = t.predict([(b1.as_xyaah(), 1), (b2.as_xyaah(), 2)])
        cur = {tr.custom_object_id: tr.id for tr in v}
        if ids is None:
            ids = cur
        else:
            assert cur == ids, f"identity switch at step {step}"


def test_oriented_boxes():
    t = make_sort(max_idle_epochs=3)
    ids = set()
    for step in range(4):
        bb = Universal2DBox(10.0 + step * 0.2, 10.0, None, 0.5, 10.0)
        bb.rotate(0.3 + step * 0.02)
        v = t.predict([(bb, None)])
        ids.add(v[0].id)
    assert len(ids) == 1


def test_capacity_growth():
    t = make_sort(initial_capacity=8, max_idle_epochs=100)
    # force growth past initial capacity with disjoint boxes
    for wave in range(3):
        boxes = [
            (BoundingBox(100.0 * i + wave * 2000.0, 0.0, 10.0, 20.0).as_xyaah(), None)
            for i in range(6)
        ]
        v = t.predict(boxes)
        assert len(v) == 6
    assert t.shard_stats()[0] == 18


def test_spatio_temporal_constraints():
    stc = SpatioTemporalConstraints()
    stc.add_constraints([(1, 0.1)])  # epoch-delta 1 must be within 0.1 x 2R
    t = make_sort(spatio_temporal_constraints=stc, max_idle_epochs=5)
    b1 = BoundingBox(0.0, 0.0, 10.0, 20.0)
    v1 = t.predict([(b1.as_xyaah(), None)])
    # big jump: IoU would still overlap slightly but constraint kills it
    b2 = BoundingBox(8.0, 14.0, 10.0, 20.0)
    v2 = t.predict([(b2.as_xyaah(), None)])
    assert v2[0].id != v1[0].id


def test_wasted_histories():
    t = make_sort(bbox_history=3, max_idle_epochs=1)
    for step in range(5):
        bb = BoundingBox(0.0 + step * 0.1, 0.0, 10.0, 20.0)
        t.predict([(bb.as_xyaah(), None)])
    t.skip_epochs(5)
    w = t.wasted()
    assert len(w) == 1
    assert w[0].length == 5
    assert len(w[0].observed_boxes) == 3  # bounded by history_length
    # newest last: xc of last observed = 5 + 0.4
    assert abs(w[0].observed_boxes[-1].xc - 5.4) < 1e-4


def test_confidence_effect():
    """Candidate confidence scales the IoU weight (`metric.rs:43-47,71`)."""
    t = make_sort()
    bb = BoundingBox.new_with_confidence(0.0, 0.0, 10.0, 20.0, 0.9)
    v = t.predict([(bb.as_xyaah(), None)])
    assert v[0].predicted_bbox.confidence == pytest.approx(0.9)


@pytest.mark.parametrize("backend", ["hungarian", "auction"])
def test_backends_agree(backend):
    t = make_sort(assignment_backend=backend, max_idle_epochs=5)
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 200, size=(10, 2))
    ids = None
    for step in range(5):
        pos += rng.uniform(-1, 1, size=pos.shape)
        boxes = [
            (BoundingBox(float(x), float(y), 10.0, 20.0).as_xyaah(), i)
            for i, (x, y) in enumerate(pos)
        ]
        v = t.predict(boxes)
        cur = {tr.custom_object_id: tr.id for tr in v}
        if ids is None:
            ids = cur
        else:
            assert cur == ids


def test_oriented_end_to_end_scene_sticky():
    """A scene flips to the oriented kernel when a rotated box appears and
    keeps tracking correctly."""
    t = make_sort(max_idle_epochs=5)
    ids = set()
    for step in range(3):  # axis-aligned phase
        bb = BoundingBox(10.0 + step * 0.2, 10.0, 8.0, 16.0)
        v = t.predict([(bb.as_xyaah(), None)])
        ids.add(v[0].id)
    for step in range(3):  # rotated phase, same object slowly rotating
        ubb = Universal2DBox(14.6 + step * 0.2, 18.0, None, 0.5, 16.0)
        ubb.rotate(0.05 * (step + 1))
        v = t.predict([(ubb, None)])
        ids.add(v[0].id)
    assert len(ids) == 1
    assert t._scenes[0].oriented


def test_build_wasted_records_ring_wraparound():
    """The shared export builder must unroll the ring oldest-first when
    length > history (slot 0 holds the (h+1)-th frame after wrap)."""
    from similari_tpu.trackers.sort import WastedSortTrack
    from similari_tpu.trackers.waste import build_wasted_records

    h = 3
    # track saw 5 frames, ring of 3: frames 3,4,5 live at ring slots
    # (5-3+j)%3 = 2,0,1 -> xc values must come out as 30,40,50
    hist_obs = np.zeros((1, h, 5), np.float32)
    hist_pred = np.zeros((1, h, 5), np.float32)
    for frame, slot in [(4, 0), (5, 1), (3, 2)]:
        hist_obs[0, slot, 0] = frame * 10.0
        hist_pred[0, slot, 0] = frame * 10.0 + 1.0
        hist_obs[0, slot, 3] = hist_pred[0, slot, 3] = 0.5
        hist_obs[0, slot, 4] = hist_pred[0, slot, 4] = 20.0
    hist_conf = np.full((1, h), 0.9, np.float32)
    recs = build_wasted_records(
        WastedSortTrack, 7, h, hist_obs, hist_pred, hist_conf,
        np.array([5]), np.array([42]), np.array([11]))
    (r,) = recs
    assert (r.id, r.scene_id, r.epoch, r.length) == (42, 7, 11, 5)
    assert [b.xc for b in r.observed_boxes] == [30.0, 40.0, 50.0]
    assert [b.xc for b in r.predicted_boxes] == [31.0, 41.0, 51.0]
    assert r.observed_bbox.xc == 50.0 and r.predicted_bbox.xc == 51.0
