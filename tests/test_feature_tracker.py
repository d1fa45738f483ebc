"""FeatureTracker (vectorized generic-engine workload) vs the core engine.

Oracle: the object-for-object generic `core/` engine driven exactly like the
reference's feature-tracker bench (`/root/reference/benches/feature_tracker.rs`):
fresh candidate per feature, euclidean metric over <=3-observation galleries,
TopNVoting(1, 100, 1), merge winners / add losers.
"""

import numpy as np
import pytest

from similari_tpu.core import ObservationBuilder, TopNVoting, TrackStoreBuilder
from similari_tpu.core.examples import UnboundAttributeUpdate, UnboundAttrs
from similari_tpu.core.track import MetricQuery, ObservationMetric
from similari_tpu.trackers.feature import FeatureTracker


class EuclidMetric(ObservationMetric):
    """The bench's TrackMetric (`feature_tracker.rs:49-93`)."""

    def metric(self, mq: MetricQuery):
        a = mq.candidate_observation.feature()
        b = mq.track_observation.feature()
        if a is None or b is None:
            return None
        d = float(np.linalg.norm(np.asarray(a) - np.asarray(b)))
        return (None, d)

    def optimize(self, feature_class, merge_history, attrs, observations,
                 prev_length, is_merge):
        del observations[:-3]  # keep the newest 3

    def postprocess_distances(self, unfiltered):
        return [x for x in unfiltered
                if x.feature_distance is not None and x.feature_distance < 100.0]


class CoreOracle:
    def __init__(self):
        self.store = (
            TrackStoreBuilder(1)
            .default_attributes(UnboundAttrs())
            .metric(EuclidMetric())
            .build()
        )
        self.voting = TopNVoting(1, 100.0, 1)
        self.seq = 1_000_000  # candidate ids, disjoint from store ids
        self.next_store_id = 0
        self.alias = {}  # store id -> oracle-visible sequential id

    def predict(self, feats):
        tracks = []
        for f in feats:
            self.seq += 1
            t = (
                self.store.new_track(self.seq)
                .observation(
                    ObservationBuilder(0).observation(list(map(float, f)))
                    .track_attributes_update(UnboundAttributeUpdate())
                    .build()
                )
                .build()
            )
            tracks.append(t)
        dists, errs = self.store.foreign_track_distances(tracks, 0, False)
        assert not errs
        winners = self.voting.winners(dists)
        out = []
        for t in tracks:
            w = winners.get(t.track_id)
            if w:
                dest = w[0].winner_track
                self.store.merge_external(dest, t, None, True)
                out.append(self.alias[dest])
            else:
                self.store.add_track(t)
                self.next_store_id += 1
                self.alias[t.track_id] = self.next_store_id
                out.append(self.next_store_id)
        return np.asarray(out)


def drifting_features(seed, epochs, n, f, drift=0.1, spacing=1000.0):
    """FeatGen-like per-object drifting features (`examples.rs:266-293`)."""
    rng = np.random.default_rng(seed)
    base = np.zeros((n, f), np.float32)
    base[:, 0] = spacing * np.arange(n)
    out = []
    for _ in range(epochs):
        base = base + rng.uniform(-drift, drift, (n, f)).astype(np.float32)
        out.append(base.copy())
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_feature_tracker_matches_core_engine(seed):
    n, f = 8, 32
    stream = drifting_features(seed, epochs=6, n=n, f=f)
    fast = FeatureTracker(f, gallery=3, max_distance=100.0, min_votes=1)
    oracle = CoreOracle()
    for feats in stream:
        ids_fast = fast.predict(feats)
        ids_ref = oracle.predict(feats)
        np.testing.assert_array_equal(ids_fast, ids_ref)
    assert len(fast) == n


def test_feature_tracker_multi_merge_per_track():
    """Two near-identical candidates may both merge into the same track per
    epoch (TopN has no exclusivity) — sequential-append parity."""
    f = 8
    tracker = FeatureTracker(f, gallery=3)
    a = np.zeros((1, f), np.float32)
    tracker.predict(a)
    two = np.stack([a[0] + 0.01, a[0] + 0.02])
    ids = tracker.predict(two)
    np.testing.assert_array_equal(ids, [1, 1])
    assert len(tracker) == 1
    g = tracker.gallery_of(1)
    assert g.shape == (3, f)  # 3 observations: initial + both merges
    # ring keeps the newest 3; next append evicts the oldest
    tracker.predict(a)
    g2 = tracker.gallery_of(1)
    np.testing.assert_allclose(g2[0], two[0])  # oldest surviving


@pytest.mark.parametrize("mag", [3e5, 4e5, 5e5])
def test_feature_tracker_large_norm_identity(mag):
    """Round-5 regression: the all-lanes gram expansion cancels in f32 at
    large feature norms (error floor ~ sqrt(eps)*|q| — 100+ units at
    |q| ~ 4e5), which fragmented a single drifting object into several
    tracks.  The norm-windowed pair path computes the surviving pairs with
    the reference's own pairwise difference; one object must stay one
    track at any magnitude."""
    tracker = FeatureTracker(256, gallery=3, max_distance=100.0, min_votes=1)
    rng = np.random.default_rng(0)
    f = np.zeros((1, 256), np.float32)
    f[0, 0] = mag
    ids = set()
    for _ in range(10):
        drifted = (f + rng.uniform(-0.1, 0.1, f.shape)).astype(np.float32)
        ids.add(int(tracker.predict(drifted)[0]))
    assert len(tracker) == 1 and ids == {1}


def test_feature_tracker_large_norm_identity_dense_route():
    """Same regression through the dense route (d*lanes under the window
    gate goes straight to the centered sgemm): candidates at a huge common
    offset must still match their own tracks."""
    n, f = 36, 32
    tracker = FeatureTracker(f, gallery=3, max_distance=100.0, min_votes=1)
    rng = np.random.default_rng(1)
    base = np.zeros((n, f), np.float32)
    base[:, 0] = 4e5  # identical norms -> windows all overlap
    base[:, 1] = 500.0 * np.arange(n)  # distinct along a second axis
    first = tracker.predict(base)
    for _ in range(4):
        drifted = (base + rng.uniform(-0.1, 0.1, base.shape)
                   ).astype(np.float32)
        np.testing.assert_array_equal(tracker.predict(drifted), first)
    assert len(tracker) == n


def test_feature_tracker_growth_and_cosine():
    f = 16
    tracker = FeatureTracker(f, metric="cosine", max_distance=0.2,
                             initial_capacity=4)
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(40, f)).astype(np.float32)
    ids = tracker.predict(feats)
    assert len(np.unique(ids)) >= 30  # random directions rarely match
    ids2 = tracker.predict(feats * 2.0)  # same directions -> same tracks
    np.testing.assert_array_equal(ids2, ids)
