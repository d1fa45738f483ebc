"""Sort — the easy-to-use SORT tracker (API parity with the reference).

Mirrors `/root/reference/src/trackers/sort/simple_api.rs` and its pyo3 surface:
`predict[_with_scene]`, `wasted`, `clear_wasted`, `idle_tracks[_with_scene]`,
`skip_epochs[_for_scene]`, `current_epoch[_with_scene]`, `shard_stats`.

Architecture: each scene owns a fixed-capacity SoA `SortState`; per predict
call either the native/NumPy host engine runs (interactive default —
per-call device dispatch dwarfs the math, ARCHITECTURE.md §4b) or the
jitted device step (oriented boxes, engine="device").  Epochs, custom
object ids and the wasted-track bin are host-side bookkeeping.  The
`shards` argument is accepted for API compatibility but parallelism comes
from vectorized engines, not threads.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.bbox import Universal2DBox
from .constraints import SpatioTemporalConstraints
from .sort_step import (
    DEFAULT_MINIMAL_SORT_CONFIDENCE,
    SortConfig,
    compiled_sort_step,
)
from .state import SortState, grow_state, new_sort_state
from .waste import build_wasted_records

DEFAULT_AUTO_WASTE_PERIODICITY = 100  # `src/trackers/sort.rs:378`


class VotingType(Enum):
    Visual = 0
    Positional = 1


class PositionalMetricType:
    """`PositionalMetricType.iou(threshold)` / `.maha()` (pyo3 parity)."""

    def __init__(self, kind: str, threshold: Optional[float] = None):
        self.kind = kind
        self.threshold = threshold

    @staticmethod
    def iou(threshold: float = 0.3) -> "PositionalMetricType":
        assert 0.0 < threshold < 1.0, "Threshold must lay between (0.0 and 1.0)"
        return PositionalMetricType("iou", threshold)

    @staticmethod
    def maha() -> "PositionalMetricType":
        return PositionalMetricType("maha")

    def __repr__(self):
        return (
            f"PositionalMetricType.iou({self.threshold})"
            if self.kind == "iou"
            else "PositionalMetricType.maha()"
        )


@dataclasses.dataclass
class SortTrack:
    """Per-epoch track snapshot, `src/trackers/sort.rs:285-311`."""

    id: int
    epoch: int
    predicted_bbox: Universal2DBox
    observed_bbox: Universal2DBox
    scene_id: int
    length: int
    voting_type: VotingType
    custom_object_id: Optional[int]

    def __repr__(self):
        return (
            f"SortTrack(id={self.id}, epoch={self.epoch}, scene_id={self.scene_id},"
            f" length={self.length}, voting_type={self.voting_type.name},"
            f" custom_object_id={self.custom_object_id},"
            f" predicted_bbox={self.predicted_bbox}, observed_bbox={self.observed_bbox})"
        )


@dataclasses.dataclass
class WastedSortTrack:
    """Dead-track export with histories, `src/trackers/sort.rs:313-341`."""

    id: int
    epoch: int
    predicted_bbox: Universal2DBox
    observed_bbox: Universal2DBox
    scene_id: int
    length: int
    predicted_boxes: List[Universal2DBox]
    observed_boxes: List[Universal2DBox]

    def __repr__(self):
        return (
            f"WastedSortTrack(id={self.id}, epoch={self.epoch},"
            f" scene_id={self.scene_id}, length={self.length},"
            f" predicted_bbox={self.predicted_bbox}, observed_bbox={self.observed_bbox},"
            f" history={len(self.observed_boxes)})"
        )


class _SceneStore:
    """Device state + host aux for one scene."""

    def __init__(self, capacity: int, history: int):
        self.state: SortState = new_sort_state(capacity, history)
        self.custom_ids = np.full((capacity,), -1, np.int64)
        self.has_custom = np.zeros((capacity,), bool)
        self.active_count = 0
        self.oriented = False  # sticky: flips when a rotated box is seen
        self.host = False  # True while state leaves are np.ndarrays
        self.session = None  # cached native step (rebuilt when buffers move)

    def grow(self, min_capacity: int):
        cap = self.state.capacity
        new_cap = cap
        while new_cap < min_capacity:
            new_cap *= 2
        if new_cap != cap:
            if self.host:
                from .host_sort import host_grow

                self.state = host_grow(self.state, new_cap)
            else:
                self.state = grow_state(self.state, new_cap)
            self.session = None  # state buffers moved
            self.custom_ids = np.concatenate(
                [self.custom_ids, np.full((new_cap - cap,), -1, np.int64)]
            )
            self.has_custom = np.concatenate(
                [self.has_custom, np.zeros((new_cap - cap,), bool)]
            )


from ..utils.pad import pad_pow2 as _pad_pow2  # single shared helper


def _box_from_row(row: np.ndarray, conf: float) -> Universal2DBox:
    return Universal2DBox.from_vec5(row, conf)


class Sort:
    def __init__(
        self,
        shards: int = 4,
        bbox_history: int = 1,
        max_idle_epochs: int = 5,
        method: Optional[PositionalMetricType] = None,
        min_confidence: float = DEFAULT_MINIMAL_SORT_CONFIDENCE,
        spatio_temporal_constraints: Optional[SpatioTemporalConstraints] = None,
        kalman_position_weight: float = 1.0 / 20.0,
        kalman_velocity_weight: float = 1.0 / 160.0,
        *,
        initial_capacity: int = 128,
        assignment_backend: str = "auto",
        engine: str = "auto",
    ):
        """engine: "host" / "auto" = native-or-NumPy per-call fast path
        (per-call dispatch overhead dwarfs the math there —
        trackers/host_sort.py), covering aligned AND oriented boxes (the
        host clip mirrors the device kernel's f32 op order); "device" =
        always the jitted step."""
        assert bbox_history > 0
        assert engine in ("auto", "host", "device")
        self._engine = engine
        method = method or PositionalMetricType.maha()
        stc = spatio_temporal_constraints or SpatioTemporalConstraints()
        self._cfg = SortConfig(
            method=method.kind,
            iou_threshold=method.threshold or 0.3,
            min_confidence=min_confidence,
            max_idle_epochs=max_idle_epochs,
            constraints=stc.as_tuple(),
            position_weight=kalman_position_weight,
            velocity_weight=kalman_velocity_weight,
            assignment=assignment_backend,
        )
        self._history = bbox_history
        self._capacity0 = initial_capacity
        self._scenes: Dict[int, _SceneStore] = {}
        self._epochs: Dict[int, int] = {}
        self._wasted_bin: List[WastedSortTrack] = []
        self._auto_waste_counter = DEFAULT_AUTO_WASTE_PERIODICITY
        self._next_track_id = 0  # global like the reference's Sort.track_id
        self._host_cfgs = {
            False: dataclasses.replace(self._cfg, oriented=False),
            True: dataclasses.replace(self._cfg, oriented=True),
        }

    def _step_for(self, oriented: bool):
        return compiled_sort_step(
            dataclasses.replace(self._cfg, oriented=oriented)
        )

    # ------------------------------------------------------------------ epochs
    def _next_epoch(self, scene_id: int) -> int:
        e = self._epochs.get(scene_id, 0) + 1
        self._epochs[scene_id] = e
        return e

    def skip_epochs(self, n: int):
        self.skip_epochs_for_scene(0, n)

    def skip_epochs_for_scene(self, scene_id: int, n: int):
        """`epoch_db.rs:10-19` + auto-waste (`tracker_api.rs:48-51`)."""
        self._epochs[scene_id] = self._epochs.get(scene_id, 0) + n
        self._auto_waste()

    def current_epoch(self) -> int:
        return self.current_epoch_with_scene(0)

    def current_epoch_with_scene(self, scene_id: int) -> int:
        return self._epochs.get(scene_id, 0)

    # ----------------------------------------------------------------- predict
    def predict(
        self, bboxes: Sequence[Tuple[Universal2DBox, Optional[int]]]
    ) -> List[SortTrack]:
        return self.predict_with_scene(0, bboxes)

    def predict_with_scene(
        self,
        scene_id: int,
        bboxes: Sequence[Tuple[Universal2DBox, Optional[int]]],
    ) -> List[SortTrack]:
        if not bboxes:
            self._tick_auto_waste()
            self._next_epoch(scene_id)
            return []
        d = len(bboxes)
        # list-of-lists -> one np.asarray beats d separate to_vec5() arrays
        det_box = np.asarray(
            [[bb.xc, bb.yc, bb.angle or 0.0, bb.aspect, bb.height]
             for bb, _ in bboxes], np.float32)
        det_conf = np.asarray([bb.confidence for bb, _ in bboxes], np.float32)
        customs: List[Optional[int]] = [cid for _, cid in bboxes]

        epoch, track_id, pred_box, length, slot = self.predict_arrays(
            scene_id, det_box, det_conf, customs
        )

        # tolist() batches the ndarray->Python conversion (one C call per
        # column instead of 6 scalar float() casts per output box)
        pb = pred_box.tolist()
        ob = det_box.tolist()
        cf = det_conf.tolist()
        tid = track_id.tolist()
        ln = length.tolist()
        res: List[SortTrack] = []
        for i in range(d):
            res.append(
                SortTrack(
                    id=tid[i],
                    epoch=epoch,
                    predicted_bbox=Universal2DBox.from_vec5(pb[i], cf[i]),
                    observed_bbox=Universal2DBox.from_vec5(ob[i], cf[i]),
                    scene_id=scene_id,
                    length=ln[i],
                    voting_type=VotingType.Positional,
                    custom_object_id=customs[i],
                )
            )
        return res

    def _tick_auto_waste(self):
        if self._auto_waste_counter == 0:
            self._auto_waste()
            self._auto_waste_counter = getattr(
                self, "_auto_waste_periodicity", DEFAULT_AUTO_WASTE_PERIODICITY
            )
        else:
            self._auto_waste_counter -= 1

    def predict_arrays(
        self,
        scene_id: int,
        det_box: np.ndarray,
        det_conf: np.ndarray,
        customs: Optional[Sequence[Optional[int]]] = None,
    ):
        """Array fast path: boxes[N,5] (xc,yc,angle,aspect,height) + conf[N].

        Returns (epoch, track_id[N], pred_box[N,5], length[N], slot[N]).
        This skips per-box Python objects — use for throughput-critical loops.
        """
        self._tick_auto_waste()
        epoch = self._next_epoch(scene_id)
        d = det_box.shape[0]
        store = self._get_store(scene_id)
        store.grow(store.active_count + d)
        was_oriented = store.oriented
        store.oriented = was_oriented or bool((det_box[:, 2] != 0).any())
        if store.oriented != was_oriented:
            store.session = None  # sessions bake the oriented flag

        # the host engine covers oriented boxes too (scalar f32 clip with
        # the device kernel's exact op order — native/clip.h,
        # trackers/host_geometry.py), so "auto" never pays the per-call
        # device dispatch floor
        use_host = self._engine in ("host", "auto")
        if use_host:
            from .. import native
            from . import host_sort

            hcfg = self._host_cfgs[store.oriented]
            if not store.host:
                store.state = host_sort.state_to_host(store.state)
                store.host = True
                store.session = None
            if native.sort_step_available():
                if store.session is None:
                    store.session = native.SortStepSession(
                        hcfg, store.state)
                nid, slot, track_id, is_new, pred_box, length = \
                    store.session.step(
                        det_box, det_conf, epoch, self._next_track_id)
                store.state.next_id[...] = nid
            else:
                state = dataclasses.replace(
                    store.state, next_id=np.int32(self._next_track_id)
                )
                state, hout = host_sort.host_sort_step(
                    hcfg, state, det_box, det_conf, epoch
                )
                store.state = state
                slot = hout["slot"]
                track_id = hout["track_id"]
                is_new = hout["is_new"]
                pred_box = hout["pred_box"]
                length = hout["length"]
                nid = int(state.next_id)
            self._next_track_id = nid
            store.active_count += int(is_new.sum())
            if customs is not None:
                sl = slot.tolist()
                for i in range(d):
                    s = sl[i]
                    cid = customs[i]
                    store.custom_ids[s] = -1 if cid is None else cid
                    store.has_custom[s] = cid is not None
            return epoch, track_id, pred_box, length, slot

        if store.host:
            from . import host_sort

            store.state = host_sort.state_to_device(store.state)
            store.host = False
            store.session = None

        dpad = _pad_pow2(d)
        box = np.zeros((dpad, 5), np.float32)
        conf = np.zeros((dpad,), np.float32)
        valid = np.zeros((dpad,), bool)
        box[:d] = det_box
        conf[:d] = det_conf
        valid[:d] = True

        store.state = dataclasses.replace(
            store.state, next_id=jnp.int32(self._next_track_id)
        )

        state, out = self._step_for(store.oriented)(
            store.state,
            jnp.asarray(box),
            jnp.asarray(conf),
            jnp.asarray(valid),
            jnp.int32(epoch),
        )
        store.state = state

        slot = np.asarray(out.slot)[:d]
        track_id = np.asarray(out.track_id)[:d]
        is_new = np.asarray(out.is_new)[:d]
        pred_box = np.asarray(out.pred_box)[:d]
        length = np.asarray(out.length)[:d]
        if bool(np.asarray(out.overflow)):
            raise RuntimeError(
                f"track store overflow (capacity {store.state.capacity})")

        self._next_track_id = int(np.asarray(state.next_id))
        store.active_count += int(is_new.sum())
        if customs is not None:
            sl = slot.tolist()
            for i in range(d):
                s = sl[i]
                cid = customs[i]
                store.custom_ids[s] = -1 if cid is None else cid
                store.has_custom[s] = cid is not None
        return epoch, track_id, pred_box, length, slot

    def _get_store(self, scene_id: int) -> _SceneStore:
        if scene_id not in self._scenes:
            self._scenes[scene_id] = _SceneStore(
                self._capacity0, self._history
            )
        return self._scenes[scene_id]

    # ------------------------------------------------------------------- waste
    def _auto_waste(self):
        """Move dead tracks to the wasted bin, `tracker_api.rs:81-88`."""
        for scene_id, store in self._scenes.items():
            cur = self._epochs.get(scene_id, 0)
            active = np.asarray(store.state.active)
            last = np.asarray(store.state.last_epoch)
            mask = active & (last + self._cfg.max_idle_epochs < cur)
            if not mask.any():
                continue
            slots = np.nonzero(mask)[0]
            self._export_wasted(scene_id, store, slots)

    def _export_wasted(self, scene_id: int, store: _SceneStore, slots: np.ndarray):
        st = store.state
        self._wasted_bin.extend(
            build_wasted_records(
                WastedSortTrack, scene_id, st.history,
                np.asarray(st.hist_obs[slots]), np.asarray(st.hist_pred[slots]),
                np.asarray(st.hist_conf[slots]), np.asarray(st.length[slots]),
                np.asarray(st.track_id[slots]),
                np.asarray(st.last_epoch[slots]),
            )
        )
        # deactivate the slots (in place on host, .at[] on device)
        if isinstance(store.state.active, np.ndarray):
            store.state.active[slots] = False
        else:
            sl = jnp.asarray(slots)
            store.state = dataclasses.replace(
                store.state, active=store.state.active.at[sl].set(False)
            )
        store.active_count -= len(slots)
        store.has_custom[slots] = False

    def wasted(self) -> List[WastedSortTrack]:
        self._auto_waste()
        out = self._wasted_bin
        self._wasted_bin = []
        return out

    def clear_wasted(self):
        """Drops the wasted bin only (`tracker_api.rs:116-118` clears the
        wasted store without moving eligible tracks out of the main store)."""
        self._wasted_bin = []

    # -------------------------------------------------------------------- idle
    def idle_tracks(self) -> List[SortTrack]:
        return self.idle_tracks_with_scene(0)

    def idle_tracks_with_scene(self, scene_id: int) -> List[SortTrack]:
        """Active tracks not updated at the current epoch, `sort.rs:185-208`."""
        store = self._scenes.get(scene_id)
        if store is None:
            return []
        cur = self._epochs.get(scene_id, 0)
        st = store.state
        active = np.asarray(st.active)
        last = np.asarray(st.last_epoch)
        mask = active & (last != cur)
        slots = np.nonzero(mask)[0]
        if len(slots) == 0:
            return []
        pred = np.asarray(st.pred_box[slots])
        obs = np.asarray(st.obs_box[slots])
        conf = np.asarray(st.conf[slots])
        tid = np.asarray(st.track_id[slots])
        length = np.asarray(st.length[slots])
        res = []
        for k, s in enumerate(slots):
            cid = int(store.custom_ids[s]) if store.has_custom[s] else None
            res.append(
                SortTrack(
                    id=int(tid[k]),
                    epoch=int(last[s]),
                    predicted_bbox=_box_from_row(pred[k], float(conf[k])),
                    observed_bbox=_box_from_row(obs[k], float(conf[k])),
                    scene_id=scene_id,
                    length=int(length[k]),
                    voting_type=VotingType.Positional,
                    custom_object_id=cid,
                )
            )
        return res

    # ------------------------------------------------------------------- stats
    def shard_stats(self) -> List[int]:
        """Active track count (single logical shard on device)."""
        return [sum(s.active_count for s in self._scenes.values())]

    def active_shard_stats(self) -> List[int]:
        return self.shard_stats()

    def wasted_shard_stats(self) -> List[int]:
        return [len(self._wasted_bin)]

    def set_auto_waste(self, periodicity: int):
        """`tracker_api.rs:26-31`: change periodicity, trigger on next predict."""
        self._auto_waste_periodicity = periodicity
        self._auto_waste_counter = 0
