"""Batch tracker APIs: BatchSort / BatchVisualSort + request/result types.

API parity with `/root/reference/src/trackers/batch.rs` and the batch
trackers (`sort/batch_api.rs`, `visual_sort/batch_api.rs`).  The reference
overlaps per-scene voting with the next scene's distance computation using
worker threads; on TPU the equivalent concurrency is the device pipeline — all
scenes of a batch are dispatched as asynchronous jitted steps and the result
object drains them in completion order.  For maximum throughput over many
scenes use the scene-batched scan path (`similari_tpu.parallel`), which fuses
the whole batch into one device program.

`distance_shards` / `voting_shards` are accepted for API compatibility.
"""

from __future__ import annotations

from collections import deque
from typing import Dict, List, Optional, Tuple

from ..utils.bbox import Universal2DBox
from .constraints import SpatioTemporalConstraints
from .sort import PositionalMetricType, Sort, SortTrack, WastedSortTrack
from .visual import (
    VisualSort,
    VisualSortObservation,
    VisualSortObservationSet,
    VisualSortOptions,
    WastedVisualSortTrack,
)

SceneTracks = Tuple[int, List[SortTrack]]


class _HostBatchEngine:
    """Host (per-call) backend for the batch APIs.

    The reference's BatchSort bench is a *per-call* workload — one scene of N
    boxes per request (`/root/reference/benches/batch_sort_iou_tracker.rs:65-78`,
    618 FPS at 100 objects) — where a vmapped device dispatch pays the ~1.5 ms
    per-call floor (ARCHITECTURE.md §4b).  This engine runs each scene of the
    request through the host Sort/VisualSort engine instead (native C++ step,
    exact JV voting), exposing the same internal surface as the device
    `SceneBatchEngine` (`epochs`, `predict_scenes`, `collect_wasted`,
    `idle_tracks`, `total_active`).  Semantics match: the reference's batch
    trackers are per-scene Sort epochs behind worker threads
    (`sort/batch_api.rs:68-153`).
    """

    def __init__(self, tracker):
        self._tracker = tracker  # Sort or VisualSort with engine="host"

    @property
    def epochs(self):
        return self._tracker._epochs

    def predict_scenes(self, batch):
        out = {}
        for scene_id, items in batch.items():
            out[scene_id] = self._predict_one(scene_id, items)
        return out

    def _predict_one(self, scene_id, items):
        return self._tracker.predict_with_scene(scene_id, items)

    def collect_wasted(self):
        return self._tracker.wasted()

    def idle_tracks(self, scene_id):
        return self._tracker.idle_tracks_with_scene(scene_id)

    def total_active(self):
        return self._tracker.shard_stats()[0]


class _HostVisualBatchEngine(_HostBatchEngine):
    def _predict_one(self, scene_id, items):
        obs_set = VisualSortObservationSet()
        for o in items:
            obs_set.add(o)
        return self._tracker.predict_with_scene(scene_id, obs_set)


class PredictionBatchResult:
    """Per-scene result stream (`batch.rs:18-38`)."""

    def __init__(self):
        self._queue: deque = deque()
        self._batch_size = 0

    def ready(self) -> bool:
        return len(self._queue) > 0

    def get(self) -> SceneTracks:
        if not self._queue:
            raise RuntimeError("no more batch results pending")
        return self._queue.popleft()

    def batch_size(self) -> int:
        return self._batch_size

    def _push(self, scene_tracks: SceneTracks):
        self._queue.append(scene_tracks)


class SortPredictionBatchRequest:
    """`sort/batch_api.rs:339-358`."""

    def __init__(self):
        self.batch: Dict[int, List[Tuple[Universal2DBox, Optional[int]]]] = {}
        self.result: Optional[PredictionBatchResult] = PredictionBatchResult()

    def add(
        self,
        scene_id: int,
        bbox: Universal2DBox,
        custom_object_id: Optional[int] = None,
    ):
        if self.result is None:
            raise RuntimeError(
                "this batch request was already consumed by predict(); "
                "build a fresh SortPredictionBatchRequest per batch "
                "(`batch.rs` requests are single-use)")
        self.batch.setdefault(scene_id, []).append((bbox, custom_object_id))
        self.result._batch_size = len(self.batch)

    def batch_size(self) -> int:
        return len(self.batch)


class BatchSort:
    """Multi-scene SORT (`sort/batch_api.rs:35-317`).

    Backed by the persistent device-batched engine: every scene is a row of
    one batched SoA state, and a whole request dispatches as a single
    vmapped device step (the TPU equivalent of the reference's voting worker
    threads).
    """

    def __init__(
        self,
        distance_shards: int = 4,
        voting_shards: int = 4,
        bbox_history: int = 1,
        max_idle_epochs: int = 5,
        method: Optional[PositionalMetricType] = None,
        min_confidence: float = 0.05,
        spatio_temporal_constraints: Optional[SpatioTemporalConstraints] = None,
        kalman_position_weight: float = 1.0 / 20.0,
        kalman_velocity_weight: float = 1.0 / 160.0,
        *,
        initial_capacity: int = 128,
        assignment_backend: str = "auto",
        engine: str = "auto",
    ):
        """engine: "auto"/"host" = per-scene host engine (the right backend
        for the per-call request shape the reference's batch benches
        measure); "device" = the persistent vmapped device-batched engine
        (bulk multi-scene dispatch; for saturation throughput prefer the
        `similari_tpu.parallel` scan pipelines)."""
        assert bbox_history > 0
        assert engine in ("auto", "host", "device")
        method = method or PositionalMetricType.maha()
        stc = spatio_temporal_constraints or SpatioTemporalConstraints()
        if engine in ("auto", "host"):
            self._engine = _HostBatchEngine(Sort(
                shards=distance_shards,
                bbox_history=bbox_history,
                max_idle_epochs=max_idle_epochs,
                method=method,
                min_confidence=min_confidence,
                spatio_temporal_constraints=stc,
                kalman_position_weight=kalman_position_weight,
                kalman_velocity_weight=kalman_velocity_weight,
                initial_capacity=initial_capacity,
                assignment_backend=assignment_backend,
                engine="host",
            ))
        else:
            from .batch_device import SceneBatchEngine
            from .sort_step import SortConfig

            cfg = SortConfig(
                method=method.kind,
                iou_threshold=method.threshold or 0.3,
                min_confidence=min_confidence,
                max_idle_epochs=max_idle_epochs,
                constraints=stc.as_tuple(),
                position_weight=kalman_position_weight,
                velocity_weight=kalman_velocity_weight,
                assignment=assignment_backend,
            )
            self._engine = SceneBatchEngine(
                cfg, bbox_history, capacity=initial_capacity
            )
        self._wasted_bin: List[WastedSortTrack] = []
        self._auto_waste_counter = 100

    def predict(self, batch_request: SortPredictionBatchRequest) -> PredictionBatchResult:
        if self._auto_waste_counter == 0:
            self._auto_waste()
            self._auto_waste_counter = 100
        else:
            self._auto_waste_counter -= 1
        if batch_request.result is None:
            raise RuntimeError(
                "batch request already consumed by a previous predict(); "
                "build a fresh request per batch")
        result = batch_request.result
        batch_request.result = None
        result._batch_size = len(batch_request.batch)
        for scene_id, tracks in self._engine.predict_scenes(
            batch_request.batch
        ).items():
            result._push((scene_id, tracks))
        return result

    # lifecycle -------------------------------------------------------------
    def _auto_waste(self):
        self._wasted_bin.extend(self._engine.collect_wasted())

    def skip_epochs(self, n: int):
        self.skip_epochs_for_scene(0, n)

    def skip_epochs_for_scene(self, scene_id: int, n: int):
        self._engine.epochs[scene_id] = (
            self._engine.epochs.get(scene_id, 0) + n
        )
        self._auto_waste()

    def current_epoch(self) -> int:
        return self.current_epoch_with_scene(0)

    def current_epoch_with_scene(self, scene_id: int) -> int:
        return self._engine.epochs.get(scene_id, 0)

    def wasted(self) -> List[WastedSortTrack]:
        self._auto_waste()
        out = self._wasted_bin
        self._wasted_bin = []
        return out

    def clear_wasted(self):
        self._wasted_bin = []

    def idle_tracks(self, scene_id: int = 0) -> List[SortTrack]:
        return self._engine.idle_tracks(scene_id)

    def idle_tracks_with_scene(self, scene_id: int) -> List[SortTrack]:
        return self._engine.idle_tracks(scene_id)

    def shard_stats(self) -> List[int]:
        return [self._engine.total_active()]


class VisualSortPredictionBatchRequest:
    """`visual_sort/batch_api.rs` request flavor."""

    def __init__(self):
        self.batch: Dict[int, List[VisualSortObservation]] = {}
        self.result: Optional[PredictionBatchResult] = PredictionBatchResult()

    def add(self, scene_id: int, observation: VisualSortObservation):
        if self.result is None:
            raise RuntimeError(
                "this batch request was already consumed by predict(); "
                "build a fresh VisualSortPredictionBatchRequest per batch")
        self.batch.setdefault(scene_id, []).append(observation)
        self.result._batch_size = len(self.batch)

    def batch_size(self) -> int:
        return len(self.batch)


class BatchVisualSort:
    """Multi-scene VisualSORT (`visual_sort/batch_api.rs:54-335`).

    Backed by the persistent device-batched visual engine: every scene is a
    row of one batched VisualState and a whole request dispatches as a single
    vmapped visual step.
    """

    def __init__(
        self,
        distance_shards: int = 4,
        voting_shards: int = 4,
        opts: Optional[VisualSortOptions] = None,
        *,
        initial_capacity: int = 128,
        assignment_backend: str = "auto",
        engine: str = "auto",
    ):
        """engine: "auto"/"host" = per-scene host engine (right for the
        per-call request shape); "device" = persistent vmapped device
        engine (bulk dispatch; for saturation throughput prefer the
        `similari_tpu.parallel` scan pipelines)."""
        assert engine in ("auto", "host", "device")
        opts = opts or VisualSortOptions()
        if engine in ("auto", "host"):
            self._engine = _HostVisualBatchEngine(VisualSort(
                distance_shards, opts,
                initial_capacity=initial_capacity,
                assignment_backend=assignment_backend,
                engine="host",
            ))
        else:
            import dataclasses

            from .batch_visual_device import VisualSceneBatchEngine

            cfg = dataclasses.replace(
                opts._build_config(), assignment=assignment_backend
            )
            self._engine = VisualSceneBatchEngine(
                cfg,
                history=opts._kept_history_length,
                gallery=opts._visual_max_observations,
                capacity=initial_capacity,
            )
        self._wasted_bin: List[WastedVisualSortTrack] = []
        self._auto_waste_counter = 100

    def predict(
        self, batch_request: VisualSortPredictionBatchRequest
    ) -> PredictionBatchResult:
        if self._auto_waste_counter == 0:
            self._auto_waste()
            self._auto_waste_counter = 100
        else:
            self._auto_waste_counter -= 1
        if batch_request.result is None:
            raise RuntimeError(
                "batch request already consumed by a previous predict(); "
                "build a fresh request per batch")
        result = batch_request.result
        batch_request.result = None
        result._batch_size = len(batch_request.batch)
        for scene_id, tracks in self._engine.predict_scenes(
            batch_request.batch
        ).items():
            result._push((scene_id, tracks))
        return result

    def _auto_waste(self):
        self._wasted_bin.extend(self._engine.collect_wasted())

    def skip_epochs(self, n: int):
        self.skip_epochs_for_scene(0, n)

    def skip_epochs_for_scene(self, scene_id: int, n: int):
        self._engine.epochs[scene_id] = self._engine.epochs.get(scene_id, 0) + n
        self._auto_waste()

    def current_epoch(self) -> int:
        return self.current_epoch_with_scene(0)

    def current_epoch_with_scene(self, scene_id: int) -> int:
        return self._engine.epochs.get(scene_id, 0)

    def wasted(self) -> List[WastedVisualSortTrack]:
        self._auto_waste()
        out = self._wasted_bin
        self._wasted_bin = []
        return out

    def clear_wasted(self):
        self._wasted_bin = []

    def idle_tracks(self, scene_id: int = 0) -> List[SortTrack]:
        return self._engine.idle_tracks(scene_id)

    def idle_tracks_with_scene(self, scene_id: int) -> List[SortTrack]:
        return self._engine.idle_tracks(scene_id)

    def shard_stats(self) -> List[int]:
        return [self._engine.total_active()]
