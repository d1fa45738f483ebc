"""Generic engine tests: Track, TrackStore, voting — mirroring the reference
unit tests (`/root/reference/src/track.rs:659-1277`, `store/store_tests.rs`,
`voting/topn.rs:139-279`)."""

import numpy as np
import pytest

from similari_tpu.core import (
    BestFitVoting,
    IncompatibleAttributes,
    NoopNotifier,
    Observation,
    ObservationBuilder,
    ObservationMetricOk,
    TopNVoting,
    TopNVotingElt,
    TrackStatus,
    TrackStore,
    TrackStoreBuilder,
)
from similari_tpu.core.examples import (
    BBoxAttributes,
    BBoxAttributesUpdate,
    IOUMetric,
    SetError,
    SimpleAttributeUpdate,
    SimpleAttrs,
    SimpleMetric,
    UnboundAttributeUpdate,
    UnboundAttrs,
    UnboundMetric,
)
from similari_tpu.utils.bbox import BoundingBox


def make_store(shards=2):
    return (
        TrackStoreBuilder(shards)
        .default_attributes(SimpleAttrs())
        .metric(SimpleMetric())
        .notifier(NoopNotifier())
        .build()
    )


def test_track_add_observation_and_attrs():
    store = make_store()
    track = (
        store.new_track(1)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(0.3)
            .observation([1.0, 0.0, 0.0])
            .track_attributes_update(SimpleAttributeUpdate())
            .build()
        )
        .build()
    )
    assert track.get_track_id() == 1
    assert track.attributes.set
    assert len(track.get_observations(0)) == 1


def test_attr_update_rollback():
    """Transactional rollback parity (`track.rs:963-1104`): failed update must
    leave the track unchanged."""
    store = make_store()
    track = (
        store.new_track(1)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(0.3)
            .observation([1.0, 0.0, 0.0])
            .track_attributes_update(SimpleAttributeUpdate())
            .build()
        )
        .build()
    )
    with pytest.raises(SetError):
        track.add_observation(
            0, 0.2, [0.0, 1.0, 0.0], SimpleAttributeUpdate()
        )
    # unchanged
    assert len(track.get_observations(0)) == 1
    assert track.attributes.set


def test_distances_and_incompatibility():
    store = make_store()

    def mk(tid, attr, feat, update=True):
        ob = ObservationBuilder(0).observation_attributes(attr).observation(feat)
        if update:
            ob = ob.track_attributes_update(SimpleAttributeUpdate())
        return store.new_track(tid).observation(ob.build()).build()

    t1 = mk(1, 0.3, [1.0, 0.0, 0.0])
    t2 = mk(2, 0.4, [0.0, 1.0, 0.0])
    dists = t1.distances(t2, 0)
    assert len(dists) == 1
    assert dists[0].attribute_metric == pytest.approx(0.1)
    assert dists[0].feature_distance == pytest.approx(np.sqrt(2), abs=1e-5)

    t3 = mk(3, 0.5, [0.0, 0.0, 1.0], update=False)  # attrs not set
    with pytest.raises(IncompatibleAttributes):
        t1.distances(t3, 0)


def test_track_merge():
    store = make_store()
    t1 = (
        store.new_track(1)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(0.3)
            .observation([1.0, 0.0, 0.0])
            .track_attributes_update(SimpleAttributeUpdate())
            .build()
        )
        .build()
    )
    t2 = (
        store.new_track(2)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(0.4)
            .observation([0.0, 1.0, 0.0])
            .track_attributes_update(SimpleAttributeUpdate())
            .build()
        )
        .build()
    )
    t1.merge(t2, [0], True)
    assert len(t1.get_observations(0)) == 2
    assert 2 in t1.get_merge_history()


def test_store_foreign_distances_and_usable():
    store = make_store()
    for tid, attr in ((1, 0.3), (2, 0.5), (3, 0.7)):
        store.add_track(
            store.new_track(tid)
            .observation(
                ObservationBuilder(0)
                .observation_attributes(attr)
                .observation([attr, 0.0, 0.0])
                .track_attributes_update(SimpleAttributeUpdate())
                .build()
            )
            .build()
        )
    cand = (
        store.new_track(100)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(0.4)
            .observation([0.4, 0.0, 0.0])
            .track_attributes_update(SimpleAttributeUpdate())
            .build()
        )
        .build()
    )
    dists, errs = store.foreign_track_distances([cand], 0, False)
    assert errs == []
    assert len(dists) == 3
    assert {d.to_id for d in dists} == {1, 2, 3}

    usable = store.find_usable()
    assert len(usable) == 3
    assert all(s == TrackStatus.Ready for _, s in usable)
    assert sum(store.shard_stats()) == 3


def test_store_merge_and_fetch():
    store = make_store()
    for tid, attr in ((1, 0.3), (2, 0.5)):
        store.add_track(
            store.new_track(tid)
            .observation(
                ObservationBuilder(0)
                .observation_attributes(attr)
                .observation([attr, 0.0, 0.0])
                .track_attributes_update(SimpleAttributeUpdate())
                .build()
            )
            .build()
        )
    store.merge_owned(1, 2)
    assert store.get(2) is None
    assert len(store.get(1).get_observations(0)) == 2
    fetched = store.fetch_tracks([1])
    assert len(fetched) == 1 and len(store) == 0


def test_iou_metric_track():
    store = (
        TrackStoreBuilder(1)
        .default_attributes(BBoxAttributes())
        .metric(IOUMetric(history=3))
        .notifier(NoopNotifier())
        .build()
    )
    t1 = (
        store.new_track(1)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(BoundingBox(0.0, 0.0, 5.0, 10.0))
            .track_attributes_update(BBoxAttributesUpdate())
            .build()
        )
        .build()
    )
    t2 = (
        store.new_track(2)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(BoundingBox(0.3, 0.3, 5.1, 10.0))
            .track_attributes_update(BBoxAttributesUpdate())
            .build()
        )
        .build()
    )
    dists = t1.distances(t2, 0)
    assert len(dists) == 1
    assert dists[0].attribute_metric > 0.8


def rec(f, t, d):
    return ObservationMetricOk(f, t, None, d)


def test_topn_voting_goldens():
    """`voting/topn.rs:145-228` exact goldens."""
    v = TopNVoting(5, 0.32, 1)

    w = v.winners([rec(0, 1, 0.2)])
    assert w == {0: [TopNVotingElt(0, 1, 0.0)]}

    w = v.winners([rec(0, 1, 0.2), rec(0, 1, 0.3)])
    assert w == {0: [TopNVotingElt(0, 1, 0.1)]}

    # 0.4 fails the filter but still raises max_dist
    w = v.winners([rec(0, 1, 0.2), rec(0, 1, 0.4)])
    assert w == {0: [TopNVotingElt(0, 1, 0.2)]}

    w = v.winners(
        [
            rec(0, 1, 0.2), rec(0, 1, 0.22),
            rec(0, 2, 0.21), rec(0, 2, 0.2),
            rec(0, 3, 0.22), rec(0, 3, 0.2),
            rec(0, 4, 0.23), rec(0, 4, 0.3),
            rec(0, 5, 0.24), rec(0, 5, 0.3),
            rec(0, 6, 0.25), rec(0, 6, 0.5),
        ]
    )
    got = sorted(w[0], key=lambda e: e.winner_track)
    assert got == [
        TopNVotingElt(0, 1, 0.58),
        TopNVotingElt(0, 2, 0.59),
        TopNVotingElt(0, 3, 0.58),
        TopNVotingElt(0, 4, 0.47),
        TopNVotingElt(0, 5, 0.46),
    ]


def test_topn_two_queries():
    v = TopNVoting(5, 0.32, 1)
    w = v.winners(
        [
            rec(0, 1, 0.2), rec(0, 1, 0.22),
            rec(0, 2, 0.21), rec(0, 2, 0.2),
            rec(0, 3, 0.22), rec(0, 3, 0.2),
            rec(7, 4, 0.23), rec(7, 4, 0.3),
            rec(7, 5, 0.24), rec(7, 5, 0.3),
            rec(7, 6, 0.25), rec(7, 6, 0.5),
        ]
    )
    got0 = sorted(w[0], key=lambda e: e.winner_track)
    got7 = sorted(w[7], key=lambda e: e.winner_track)
    assert got0 == [
        TopNVotingElt(0, 1, 0.58),
        TopNVotingElt(0, 2, 0.59),
        TopNVotingElt(0, 3, 0.58),
    ]
    assert got7 == [
        TopNVotingElt(7, 4, 0.47),
        TopNVotingElt(7, 5, 0.46),
        TopNVotingElt(7, 6, 0.25),
    ]


def test_best_fit_greedy_claim():
    v = BestFitVoting(1.0, 1)
    w = v.winners(
        [
            rec(10, 1, 0.1),  # weight 0.3
            rec(20, 1, 0.2),  # weight 0.2 -> loses track 1 -> self
            rec(20, 2, 0.4),  # weight 0.0
        ]
    )
    assert w[10][0].winner_track == 1
    # 20's best group (by weight) lost track 1 to 10 -> winner = self
    assert w[20][0].winner_track == 20


def test_batched_feature_sweep_matches_per_pair_metric():
    """A metric declaring `supports_batch_features` gets the store-precomputed
    euclidean matrix and must produce identical distances to the plain path."""
    from similari_tpu.core.examples import BatchedSimpleMetric

    rng = np.random.default_rng(3)

    def build(metric):
        store = (
            TrackStoreBuilder(2)
            .default_attributes(SimpleAttrs())
            .metric(metric)
            .notifier(NoopNotifier())
            .build()
        )
        rng2 = np.random.default_rng(7)
        for tid in range(1, 5):
            for k in range(3):
                store.add(tid, 0, float(tid) * 0.1,
                          rng2.normal(size=16).astype(np.float32),
                          SimpleAttributeUpdate() if k == 0 else None)
        cand = (
            store.new_track(99)
            .observation(
                ObservationBuilder(0)
                .observation_attributes(0.25)
                .observation(rng.normal(size=16).astype(np.float32))
                .track_attributes_update(SimpleAttributeUpdate())
                .build()
            )
            .build()
        )
        dists, errs = store.foreign_track_distances([cand], 0, False)
        assert not errs
        return dists

    rng = np.random.default_rng(3)
    plain = build(SimpleMetric())
    rng = np.random.default_rng(3)
    batched = build(BatchedSimpleMetric())
    assert len(plain) == len(batched) == 12
    for p, b in zip(plain, batched):
        assert (p.from_id, p.to_id) == (b.from_id, b.to_id)
        assert p.attribute_metric == b.attribute_metric
        np.testing.assert_allclose(
            p.feature_distance, b.feature_distance, rtol=1e-5, atol=1e-6)


def test_bulk_record_stream_parity_none_attrs_and_empty_class():
    """Round-5 review findings: the bulk `batch_records` path must match the
    per-pair stream when observation attributes are None (np.asarray
    silently coerces None -> nan, so the None positions must be detected
    explicitly) and when a track's observation list for the class exists
    but is EMPTY (the per-pair path emits neither records nor
    ObservationForClassNotFound for it)."""
    from similari_tpu.core.examples import BatchedSimpleMetric

    def build(metric):
        store = (
            TrackStoreBuilder(2)
            .default_attributes(SimpleAttrs())
            .metric(metric)
            .notifier(NoopNotifier())
            .build()
        )
        rng = np.random.default_rng(21)
        for tid in range(1, 6):
            for k in range(2):
                # tracks 2 and 4 carry None observation attrs
                attr = None if tid % 2 == 0 else float(tid) * 0.1
                store.add(tid, 0, attr,
                          rng.normal(size=16).astype(np.float32),
                          SimpleAttributeUpdate() if k == 0 else None)
        # track 6: class 0 present but EMPTY (direct mutation, the
        # reference allows it via optimize()-style pruning)
        b6 = store.new_track(6).observation(
            ObservationBuilder(0)
            .observation_attributes(0.6)
            .observation(rng.normal(size=16).astype(np.float32))
            .track_attributes_update(SimpleAttributeUpdate())
            .build())
        t6 = b6.build()
        t6.observations[0] = []
        store.add_track(t6)
        cand = (
            store.new_track(99)
            .observation(
                ObservationBuilder(0)
                .observation_attributes(0.25)
                .observation(rng.normal(size=16).astype(np.float32))
                .track_attributes_update(SimpleAttributeUpdate())
                .build()
            )
            .build()
        )
        return store.foreign_track_distances([cand], 0, False)

    plain, plain_errs = build(SimpleMetric())
    bulk, bulk_errs = build(BatchedSimpleMetric())
    assert len(plain) == len(bulk) == 10  # 5 tracks x 2 obs; track 6 silent
    assert len(plain_errs) == len(bulk_errs) == 0
    for p, b in zip(plain, bulk):
        assert (p.from_id, p.to_id) == (b.from_id, b.to_id)
        # None attrs must stay None (not nan) through the bulk build
        assert (p.attribute_metric is None) == (b.attribute_metric is None)
        if p.attribute_metric is not None:
            assert p.attribute_metric == pytest.approx(b.attribute_metric)
        np.testing.assert_allclose(
            p.feature_distance, b.feature_distance, rtol=1e-5, atol=1e-6)
    none_count = sum(1 for r in bulk if r.attribute_metric is None)
    assert none_count == 4  # tracks 2 and 4, two observations each


def test_bulk_record_stream_falls_back_when_compatible_raises():
    """A user `attributes.compatible()` that raises must not crash the bulk
    query: the store falls back to the per-pair loop, which records the
    exception in the error stream (round-5 review finding)."""
    from similari_tpu.core.examples import BatchedSimpleMetric

    class ExplodingAttrs(SimpleAttrs):
        def compatible(self, other) -> bool:
            raise RuntimeError("boom")

    store = (
        TrackStoreBuilder(2)
        .default_attributes(SimpleAttrs())
        .metric(BatchedSimpleMetric())
        .notifier(NoopNotifier())
        .build()
    )
    rng = np.random.default_rng(22)
    for tid in (1, 2):
        store.add(tid, 0, 0.5, rng.normal(size=8).astype(np.float32),
                  SimpleAttributeUpdate())
    cand = (
        store.new_track(99)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(0.5)
            .observation(rng.normal(size=8).astype(np.float32))
            .build()
        )
        .build()
    )
    cand.attributes = ExplodingAttrs()
    dists, errs = store.foreign_track_distances([cand], 0, False)
    assert dists == []
    assert len(errs) == 2 and all("boom" in str(e) for e in errs)


def test_store_arrays_query_matches_record_api():
    """Round-4 VERDICT item 7: the one-sgemm arrays query must agree with
    the record API (same pairs, same distances), including only_baked and
    the index invalidation on store mutation."""
    from similari_tpu.core.examples import (
        BatchedSimpleMetric,
        SimpleAttributeUpdate,
        SimpleAttrs,
    )

    rng = np.random.default_rng(11)
    store = (
        TrackStoreBuilder(2)
        .default_attributes(SimpleAttrs())
        .metric(BatchedSimpleMetric())
        .notifier(NoopNotifier())
        .build()
    )
    for tid in range(1, 8):
        for k in range(2):
            store.add(tid, 0, float(tid) * 0.1,
                      rng.normal(size=32).astype(np.float32),
                      SimpleAttributeUpdate() if k == 0 else None)
    cand = (
        store.new_track(99)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(0.5)
            .observation(rng.normal(size=32).astype(np.float32))
            .track_attributes_update(SimpleAttributeUpdate())
            .build()
        )
        .build()
    )
    recs, errs = store.foreign_track_distances([cand], 0, False)
    assert not errs
    to_id, obs_ix, dist = store.foreign_track_distances_arrays(cand, 0)
    assert dist.shape == (1, len(recs))
    by_pair = {}
    for tid, j, dv in zip(to_id.tolist(), obs_ix.tolist(), dist[0].tolist()):
        by_pair.setdefault(tid, []).append(dv)
    for r in recs:
        assert any(
            abs(v - r.feature_distance) < 1e-5 for v in by_pair[r.to_id]
        ), (r.to_id, r.feature_distance, by_pair[r.to_id])

    # mutation invalidates the index: a new track appears in the next query
    store.add(50, 0, 1.0, rng.normal(size=32).astype(np.float32),
              SimpleAttributeUpdate())
    to_id2, _, dist2 = store.foreign_track_distances_arrays(cand, 0)
    assert 50 in to_id2.tolist()
    assert dist2.shape[1] == dist.shape[1] + 1
