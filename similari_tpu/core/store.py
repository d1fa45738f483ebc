"""Generic track store — the batched replacement for sharded executor threads.

Re-design of `/root/reference/src/track/store.rs`: the reference fans
candidates out to thread-per-shard executors over crossbeam channels; here the
store is a flat dict and `foreign_track_distances` is a single batched sweep.
For metrics that expose no batch path the sweep calls the Python metric per
pair (extensibility parity); feature-heavy workloads can opt in by declaring
`supports_batch_features = "euclidean" | "cosine"` on the metric — the store
then computes each candidate×track feature-distance matrix as one vectorized
sgemm sweep and hands every `MetricQuery` its pair's value in
`precomputed_distance` (see `_distances_batched`).
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .track import (
    IncompatibleAttributes,
    MetricQuery,
    NoopNotifier,
    Observation,
    ObservationForClassNotFound,
    ObservationMetricOk,
    Track,
    TrackBuilder,
    TrackStatus,
)


class DuplicateTrackId(Exception):
    pass


class TrackNotFound(Exception):
    pass


class SameTrackCalculation(Exception):
    pass


class TrackStore:
    def __init__(self, shards: int, default_attributes, metric, notifier=None):
        self.num_shards = max(1, shards)
        self.default_attributes = default_attributes
        self.metric = metric
        self.notifier = notifier or NoopNotifier()
        self.tracks: Dict[int, Track] = {}

    # ------------------------------------------------------------- creation
    def new_track(self, track_id: Optional[int] = None) -> TrackBuilder:
        b = TrackBuilder(track_id)
        b.attributes(copy.deepcopy(self.default_attributes))
        b.metric(copy.deepcopy(self.metric))
        b.notifier(self.notifier)
        return b

    def add_track(self, track: Track):
        """`store.rs:510-519`."""
        if track.track_id in self.tracks:
            raise DuplicateTrackId(track.track_id)
        self.tracks[track.track_id] = track

    def add(
        self,
        track_id: int,
        feature_class: int,
        feature_attribute=None,
        feature=None,
        attributes_update=None,
    ):
        """`store.rs:530-569`: appends to an existing track or creates one
        directly (no optimize on creation)."""
        track = self.tracks.get(track_id)
        if track is None:
            t = Track(
                attributes=copy.deepcopy(self.default_attributes),
                metric=copy.deepcopy(self.metric),
                notifier=self.notifier,
                track_id=track_id,
            )
            t.observations[feature_class] = [
                Observation(feature_attribute, feature)
            ]
            if attributes_update is not None:
                attributes_update.apply(t.attributes)
            self.tracks[track_id] = t
        else:
            track.add_observation(
                feature_class, feature_attribute, feature, attributes_update
            )

    # ------------------------------------------------------------ distances
    def foreign_track_distances(
        self,
        tracks: Sequence[Track],
        feature_class: int,
        only_baked: bool,
    ) -> Tuple[List[ObservationMetricOk], List[Exception]]:
        """`store.rs:429-460` + executor branch `store.rs:199-264`.

        IncompatibleAttributes pairs are silently skipped; other metric errors
        are returned in the error list.  `postprocess_distances` runs per
        candidate-vs-track batch like the per-shard batches of the reference.
        """
        batch_kind = getattr(self.metric, "supports_batch_features", None)
        distances: List[ObservationMetricOk] = []
        errors: List[Exception] = []
        for cand in tracks:
            for other_id, other in self.tracks.items():
                if cand.track_id == other_id:
                    continue
                if only_baked:
                    try:
                        status = other.get_attributes().baked(other.observations)
                    except Exception:
                        continue
                    if status != TrackStatus.Ready:
                        continue
                try:
                    if batch_kind:
                        dists = self._distances_batched(
                            cand, other, feature_class, batch_kind
                        )
                    else:
                        dists = cand.distances(other, feature_class)
                    distances.extend(cand.metric.postprocess_distances(dists))
                except IncompatibleAttributes:
                    continue
                except Exception as e:  # noqa: BLE001 - error stream parity
                    errors.append(e)
        return distances, errors

    def _distances_batched(
        self, cand: Track, other: Track, feature_class: int, kind: str
    ) -> List[ObservationMetricOk]:
        """`Track.distances` with the feature part precomputed as one matrix.

        The reference's per-pair SIMD loops (`src/distance.rs:9-47`) become a
        single vectorized sweep over all left×right observations; each
        `MetricQuery` then carries its pair's value in `precomputed_distance`
        so the metric only evaluates the attribute part.  Falls back to plain
        per-pair queries when any observation lacks a feature or dims differ.
        """
        if not cand.attributes.compatible(other.attributes):
            raise IncompatibleAttributes(
                f"{cand.track_id} incompatible with {other.track_id}"
            )
        left = cand.observations.get(feature_class)
        right = other.observations.get(feature_class)
        if left is None or right is None:
            raise ObservationForClassNotFound(
                f"class {feature_class} for {cand.track_id}/{other.track_id}"
            )
        lf = [o.feature() for o in left]
        rf = [o.feature() for o in right]
        pre = None
        dims = {f.shape[0] for f in lf + rf if f is not None}
        if all(f is not None for f in lf + rf) and len(dims) == 1:
            q = np.stack(lf).astype(np.float32)
            g = np.stack(rf).astype(np.float32)
            if kind == "cosine":
                qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
                gn = g / np.maximum(np.linalg.norm(g, axis=1, keepdims=True), 1e-12)
                pre = qn @ gn.T
            else:  # euclidean via the sgemm expansion |q|^2 - 2qg + |g|^2
                qq = (q * q).sum(1)[:, None]
                gg = (g * g).sum(1)[None, :]
                pre = np.sqrt(np.maximum(qq - 2.0 * (q @ g.T) + gg, 0.0))
        out = []
        for i, l in enumerate(left):
            for j, r in enumerate(right):
                mq = MetricQuery(
                    feature_class=feature_class,
                    candidate_attrs=cand.attributes,
                    candidate_observation=l,
                    track_attrs=other.attributes,
                    track_observation=r,
                    precomputed_distance=(
                        float(pre[i, j]) if pre is not None else None
                    ),
                )
                res = cand.metric.metric(mq)
                if res is None:
                    continue
                attribute_metric, feature_distance = res
                out.append(
                    ObservationMetricOk(
                        from_id=cand.track_id,
                        to_id=other.track_id,
                        attribute_metric=attribute_metric,
                        feature_distance=feature_distance,
                    )
                )
        return out

    def owned_track_distances(
        self, track_ids: Sequence[int], feature_class: int, only_baked: bool
    ) -> Tuple[List[ObservationMetricOk], List[Exception]]:
        """`store.rs:471-486`: pull tracks out, compare, re-insert."""
        pulled = self.fetch_tracks(track_ids)
        try:
            return self.foreign_track_distances(pulled, feature_class, only_baked)
        finally:
            for t in pulled:
                self.tracks[t.track_id] = t

    # ------------------------------------------------------------- lifecycle
    def find_usable(self) -> List[Tuple[int, object]]:
        """(track_id, TrackStatus | Exception) for non-Pending tracks,
        `store.rs:179-198,355-374`."""
        out = []
        for track_id, track in self.tracks.items():
            try:
                status = track.get_attributes().baked(track.observations)
            except Exception as e:  # noqa: BLE001
                out.append((track_id, e))
                continue
            if status != TrackStatus.Pending:
                out.append((track_id, status))
        return out

    def fetch_tracks(self, track_ids: Sequence[int]) -> List[Track]:
        res = []
        for tid in track_ids:
            t = self.tracks.pop(tid, None)
            if t is not None:
                res.append(t)
        return res

    def get(self, track_id: int) -> Optional[Track]:
        return self.tracks.get(track_id)

    def merge_external(
        self,
        dest_id: int,
        src: Track,
        classes: Optional[Sequence[int]] = None,
        merge_history: bool = False,
    ):
        """`store.rs:265-288,677-691`."""
        dest = self.tracks.get(dest_id)
        if dest is None:
            raise TrackNotFound(dest_id)
        if dest_id == src.track_id:
            raise SameTrackCalculation(dest_id)
        use_classes = classes if classes else src.get_feature_classes()
        dest.merge(src, use_classes, merge_history)

    def merge_owned(
        self,
        dest_id: int,
        src_id: int,
        classes: Optional[Sequence[int]] = None,
        merge_history: bool = False,
    ):
        """`store.rs:584-611`: merge a stored track into another stored one;
        the source is removed on success."""
        src_list = self.fetch_tracks([src_id])
        if not src_list:
            raise TrackNotFound(src_id)
        src = src_list[0]
        try:
            self.merge_external(dest_id, src, classes, merge_history)
        except Exception:
            self.tracks[src_id] = src
            raise

    def lookup(self, query) -> List[Tuple[int, object]]:
        """`store.rs:697-716`."""
        out = []
        for track_id, track in self.tracks.items():
            if track.lookup(query):
                try:
                    status = track.get_attributes().baked(track.observations)
                except Exception as e:  # noqa: BLE001
                    status = e
                out.append((track_id, status))
        return out

    def shard_stats(self) -> List[int]:
        """Track counts per logical shard (id % num_shards), `store.rs:378-384`."""
        stats = [0] * self.num_shards
        for tid in self.tracks:
            stats[tid % self.num_shards] += 1
        return stats

    def clear(self):
        self.tracks.clear()

    def __len__(self):
        return len(self.tracks)


class TrackStoreBuilder:
    """`store/builder.rs:10-102`."""

    def __init__(self, shards: int = 0):
        import os

        self._shards = shards if shards > 0 else (os.cpu_count() or 1)
        self._default_attributes = None
        self._metric = None
        self._notifier = NoopNotifier()

    def default_attributes(self, attrs):
        self._default_attributes = attrs
        return self

    def metric(self, metric):
        self._metric = metric
        return self

    def notifier(self, notifier):
        self._notifier = notifier
        return self

    def build(self) -> TrackStore:
        return TrackStore(
            self._shards, self._default_attributes, self._metric, self._notifier
        )
