"""BatchSort / BatchVisualSort API tests (reference `sort/batch_api.rs:552-…`)."""

import numpy as np

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
