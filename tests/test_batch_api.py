"""BatchSort / BatchVisualSort API tests (reference `sort/batch_api.rs:552-…`)."""

import numpy as np
import pytest

from similari_tpu import (
    BatchSort,
    BatchVisualSort,
    BoundingBox,
    PositionalMetricType,
    SortPredictionBatchRequest,
    VisualSortObservation,
    VisualSortPredictionBatchRequest,
)
from similari_tpu.trackers.visual import VisualSortMetricType, VisualSortOptions


def test_batch_sort_two_scenes():
    bs = BatchSort(
        distance_shards=1,
        voting_shards=1,
        bbox_history=1,
        max_idle_epochs=1,
        method=PositionalMetricType.maha(),
    )
    req = SortPredictionBatchRequest()
    req.add(0, BoundingBox(0.0, 0.0, 5.0, 10.0).as_xyaah(), 1)
    req.add(1, BoundingBox(0.0, 0.0, 5.0, 10.0).as_xyaah(), 2)
    assert req.batch_size() == 2
    res = bs.predict(req)
    assert res.batch_size() == 2
    got = {}
    while res.ready():
        scene_id, tracks = res.get()
        got[scene_id] = tracks
    assert set(got) == {0, 1}
    assert got[0][0].custom_object_id == 1
    assert got[1][0].custom_object_id == 2
    assert got[0][0].id != got[1][0].id


def test_batch_sort_continuity():
    bs = BatchSort(method=PositionalMetricType.iou(0.3), max_idle_epochs=5)
    first_ids = {}
    for step in range(4):
        req = SortPredictionBatchRequest()
        for scene in range(3):
            req.add(
                scene,
                BoundingBox(10.0 * scene + step * 0.1, 0.0, 5.0, 10.0).as_xyaah(),
                scene,
            )
        res = bs.predict(req)
        while res.ready():
            scene_id, tracks = res.get()
            if step == 0:
                first_ids[scene_id] = tracks[0].id
            else:
                assert tracks[0].id == first_ids[scene_id]


def test_batch_visual_sort():
    opts = (
        VisualSortOptions()
        .max_idle_epochs(5)
        .visual_metric(VisualSortMetricType.euclidean(10.0))
        .positional_metric(PositionalMetricType.iou(0.3))
        .visual_minimal_track_length(1)
    )
    bvs = BatchVisualSort(1, 1, opts)
    req = VisualSortPredictionBatchRequest()
    req.add(
        7,
        VisualSortObservation(
            np.array([0.1, 0.1]), 0.96, BoundingBox(0, 0, 5, 10).as_xyaah(), 10
        ),
    )
    res = bvs.predict(req)
    assert res.batch_size() == 1
    scene_id, tracks = res.get()
    assert scene_id == 7
    assert tracks[0].custom_object_id == 10
    bvs.skip_epochs_for_scene(7, 10)
    wasted = bvs.wasted()
    assert len(wasted) == 1


def test_batch_sort_many_scenes_single_dispatch():
    """Persistent batched engine: ids unique across scenes, tracks stable."""
    bs = BatchSort(method=PositionalMetricType.iou(0.3), max_idle_epochs=3)
    all_ids = {}
    for step in range(5):
        req = SortPredictionBatchRequest()
        for scene in range(12):
            for obj in range(3):
                req.add(
                    scene,
                    BoundingBox(
                        200.0 * obj + step * 0.2, 50.0 * scene, 10.0, 20.0
                    ).as_xyaah(),
                    obj,
                )
        res = bs.predict(req)
        seen = set()
        while res.ready():
            scene_id, tracks = res.get()
            for t in tracks:
                assert t.id not in seen  # unique within the step
                seen.add(t.id)
                key = (scene_id, t.custom_object_id)
                if step == 0:
                    all_ids[key] = t.id
                else:
                    assert all_ids[key] == t.id, key
    assert bs.shard_stats()[0] == 36


def test_batch_sort_waste_and_idle():
    bs = BatchSort(method=PositionalMetricType.iou(0.3), max_idle_epochs=1)
    req = SortPredictionBatchRequest()
    req.add(3, BoundingBox(0.0, 0.0, 10.0, 20.0).as_xyaah(), 9)
    bs.predict(req)
    assert bs.idle_tracks_with_scene(3) == []
    # scene 3 idles while scene 4 advances
    req = SortPredictionBatchRequest()
    req.add(4, BoundingBox(500.0, 0.0, 10.0, 20.0).as_xyaah(), 10)
    bs.predict(req)
    req = SortPredictionBatchRequest()
    req.add(3, BoundingBox(0.0, 0.0, 10.0, 20.0).as_xyaah(), 9)
    req.add(4, BoundingBox(500.0, 0.0, 10.0, 20.0).as_xyaah(), 10)
    res = bs.predict(req)
    got = dict(res.get() for _ in range(2))
    assert got[3][0].custom_object_id == 9
    assert got[3][0].length == 2  # scene-3 track survived its 1-epoch gap... 
    bs.skip_epochs_for_scene(3, 5)
    wasted = bs.wasted()
    assert any(w.scene_id == 3 for w in wasted)


def test_batch_visual_many_scenes_reid():
    """Device-batched visual engine: appearance-based identity across scenes."""
    opts = (
        VisualSortOptions()
        .max_idle_epochs(5)
        .visual_metric(VisualSortMetricType.cosine(0.3))
        .positional_metric(PositionalMetricType.iou(0.3))
        .visual_minimal_track_length(1)
    )
    bvs = BatchVisualSort(1, 1, opts)
    rng = np.random.default_rng(0)
    idents = rng.normal(size=(6, 2, 16)).astype(np.float32)
    ids0 = {}
    for step in range(4):
        req = VisualSortPredictionBatchRequest()
        for scene in range(6):
            for obj in range(2):
                feat = idents[scene, obj] + rng.normal(size=16).astype(np.float32) * 0.01
                req.add(
                    scene,
                    VisualSortObservation(
                        feat, 0.9,
                        BoundingBox(200.0 * obj + step * 0.2, 0.0, 10.0, 20.0).as_xyaah(),
                        obj,
                    ),
                )
        res = bvs.predict(req)
        while res.ready():
            scene_id, tracks = res.get()
            for t in tracks:
                key = (scene_id, t.custom_object_id)
                if step == 0:
                    ids0[key] = t.id
                else:
                    assert ids0[key] == t.id
    assert bvs.shard_stats()[0] == 12
    bvs.skip_epochs_for_scene(2, 10)
    wasted = bvs.wasted()
    assert len(wasted) == 2 and all(w.scene_id == 2 for w in wasted)


def test_batch_request_is_single_use():
    """Regression (round-3 review): reusing a consumed request crashed with
    AttributeError / silently re-predicted; it must raise clearly."""
    from similari_tpu.utils.bbox import BoundingBox

    t = BatchSort(1, 1, method=PositionalMetricType.iou(0.3))
    req = SortPredictionBatchRequest()
    req.add(0, BoundingBox(0, 0, 10, 20).as_xyaah())
    t.predict(req)
    with pytest.raises(RuntimeError, match="consumed"):
        req.add(0, BoundingBox(5, 5, 10, 20).as_xyaah())
    with pytest.raises(RuntimeError, match="consumed"):
        t.predict(req)


def test_visual_sort_set_auto_waste_periodicity():
    """Regression (round-3 review): VisualSort ignored set_auto_waste and
    always reset the counter to the default 100."""
    import numpy as np

    from similari_tpu import (
        BoundingBox, PositionalMetricType as PMT, VisualSort,
        VisualSortMetricType, VisualSortObservation, VisualSortObservationSet,
        VisualSortOptions,
    )

    opts = VisualSortOptions()
    opts.visual_metric(VisualSortMetricType.euclidean(5.0))
    opts.positional_metric(PMT.iou(0.3))
    opts.visual_minimal_track_length(2)
    opts.max_idle_epochs(1)
    tr = VisualSort(1, opts)

    def obs(x):
        o = VisualSortObservationSet()
        o.add(VisualSortObservation(
            feature=np.ones(4, np.float32), feature_quality=0.9,
            bounding_box=BoundingBox(x, 10.0, 10.0, 20.0).as_xyaah(),
            custom_object_id=None))
        return o

    tr.set_auto_waste(2)
    tr.predict(obs(0.0))      # counter 0 -> waste runs, reset to 2
    tr.skip_epochs(5)         # the track goes stale
    tr.predict(obs(500.0))    # counter 2 -> 1
    tr.predict(obs(500.0))    # counter 1 -> 0
    tr.predict(obs(500.0))    # counter 0 -> auto-waste runs (period 2)
    assert tr.wasted_shard_stats()[0] >= 1  # stale track auto-wasted
