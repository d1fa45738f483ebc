"""Scale/stress tests (reference: 10k-track store streaming, store_tests.rs)."""

import numpy as np
import pytest

from similari_tpu import BoundingBox, PositionalMetricType, Sort
from similari_tpu.core import (
    NoopNotifier,
    ObservationBuilder,
    TrackStoreBuilder,
)
from similari_tpu.core.examples import (
    SimpleAttributeUpdate,
    SimpleAttrs,
    SimpleMetric,
)


def test_store_many_tracks_distance_stream():
    """Distance sweep over a few thousand stored tracks stays correct."""
    store = (
        TrackStoreBuilder(4)
        .default_attributes(SimpleAttrs())
        .metric(SimpleMetric())
        .notifier(NoopNotifier())
        .build()
    )
    n = 2000
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    for tid in range(1, n + 1):
        store.add(
            tid, 0, 0.5, feats[tid - 1],
            SimpleAttributeUpdate(),
        )
    assert sum(store.shard_stats()) == n

    cand = (
        store.new_track(10_000_000)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(0.5)
            .observation(feats[42])
            .track_attributes_update(SimpleAttributeUpdate())
            .build()
        )
        .build()
    )
    dists, errs = store.foreign_track_distances([cand], 0, False)
    assert errs == []
    assert len(dists) == n
    best = min(dists, key=lambda d: d.feature_distance)
    assert best.to_id == 43  # its own feature


def test_sort_many_objects_and_waste_cycles():
    """500 simultaneous objects, waves of replacement, capacity growth."""
    t = Sort(
        shards=1,
        bbox_history=1,
        max_idle_epochs=2,
        method=PositionalMetricType.iou(0.3),
        initial_capacity=64,
    )
    rng = np.random.default_rng(1)
    n = 500
    xy = rng.uniform(0, 5000, size=(n, 2)).astype(np.float32)
    ids = None
    for step in range(4):
        xy += rng.uniform(-1, 1, size=xy.shape).astype(np.float32)
        boxes = np.zeros((n, 5), np.float32)
        boxes[:, 0] = xy[:, 0]
        boxes[:, 1] = xy[:, 1]
        boxes[:, 3] = 0.5
        boxes[:, 4] = 20.0
        _, out_ids, _, _, _ = t.predict_arrays(0, boxes, np.ones(n, np.float32))
        if ids is None:
            ids = out_ids.copy()
        else:
            np.testing.assert_array_equal(out_ids, ids)
    assert t.shard_stats()[0] == n

    # teleport all objects -> all new tracks; old ones waste after idle window
    xy2 = xy + 50000.0
    for step in range(4):
        boxes = np.zeros((n, 5), np.float32)
        boxes[:, 0] = xy2[:, 0]
        boxes[:, 1] = xy2[:, 1]
        boxes[:, 3] = 0.5
        boxes[:, 4] = 20.0
        t.predict_arrays(0, boxes, np.ones(n, np.float32))
    wasted = t.wasted()
    assert len(wasted) == n
    assert t.shard_stats()[0] == n
