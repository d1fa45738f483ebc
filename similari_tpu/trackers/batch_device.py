"""Device-batched multi-scene SORT engine.

The TPU-native realization of the reference's BatchSort: all scenes of the
tracker live as rows of ONE batched SoA state on device, and every
`predict(request)` dispatches a single vmapped step over the scene axis —
the device-parallel replacement for the reference's voting worker threads
(`/root/reference/src/trackers/sort/batch_api.rs:35-317`).

Scenes not present in a request participate as masked no-ops (no writes).
Track ids are allocated from a global counter with per-scene bases computed
on the host from detection counts; unmatched reservations leave gaps in the
id space (the reference's ids are also not densely sequential across scenes
— HashMap iteration order decides them).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import batched_sort_step
from ..utils.bbox import Universal2DBox
from .sort import (
    DEFAULT_AUTO_WASTE_PERIODICITY,
    SortTrack,
    VotingType,
    WastedSortTrack,
    _box_from_row,
    _pad_pow2,
)
from .sort_step import SortConfig
from .state import SortState, new_sort_state
from .waste import build_wasted_records

from functools import lru_cache, partial


@lru_cache(maxsize=None)
def _compiled_batch_step(cfg: SortConfig):
    return jax.jit(batched_sort_step(cfg), donate_argnums=(0,))


class SceneBatchEngine:
    """Persistent batched store + single-dispatch multi-scene predict."""

    def __init__(self, cfg: SortConfig, history: int, capacity: int = 128,
                 scene_capacity: int = 8):
        self.cfg = cfg
        self.history = history
        self.T = capacity
        self.S = scene_capacity
        self.state: SortState = self._new_states(self.S, self.T)
        self.row_of_scene: Dict[int, int] = {}
        self.scene_of_row: List[Optional[int]] = [None] * self.S
        self.custom_ids = np.full((self.S, self.T), -1, np.int64)
        self.has_custom = np.zeros((self.S, self.T), bool)
        self.active_count = np.zeros((self.S,), np.int64)
        self.epochs: Dict[int, int] = {}
        self.next_track_id = 0
        self.oriented = False

    def _new_states(self, s, t) -> SortState:
        one = new_sort_state(t, self.history)
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (s,) + a.shape).copy(), one
        )

    # ------------------------------------------------------------ capacity
    def _ensure_scene(self, scene_id: int) -> int:
        row = self.row_of_scene.get(scene_id)
        if row is not None:
            return row
        row = len(self.row_of_scene)
        if row >= self.S:
            new_s = self.S * 2
            pad = lambda a: jnp.pad(
                a, [(0, new_s - self.S)] + [(0, 0)] * (a.ndim - 1)
            ) if a.ndim else a
            self.state = jax.tree.map(pad, self.state)
            self.custom_ids = np.pad(
                self.custom_ids, ((0, new_s - self.S), (0, 0)),
                constant_values=-1,
            )
            self.has_custom = np.pad(
                self.has_custom, ((0, new_s - self.S), (0, 0))
            )
            self.active_count = np.pad(
                self.active_count, (0, new_s - self.S)
            )
            self.scene_of_row += [None] * (new_s - self.S)
            self.S = new_s
        self.row_of_scene[scene_id] = row
        self.scene_of_row[row] = scene_id
        return row

    def _ensure_capacity(self, min_t: int):
        if min_t <= self.T:
            return
        new_t = self.T
        while new_t < min_t:
            new_t *= 2
        pad = lambda a: jnp.pad(
            a, [(0, 0), (0, new_t - self.T)] + [(0, 0)] * (a.ndim - 2)
        ) if a.ndim >= 2 else a
        self.state = jax.tree.map(pad, self.state)
        self.custom_ids = np.pad(
            self.custom_ids, ((0, 0), (0, new_t - self.T)), constant_values=-1
        )
        self.has_custom = np.pad(self.has_custom, ((0, 0), (0, new_t - self.T)))
        self.T = new_t

    # -------------------------------------------------------------- predict
    def predict_scenes(
        self,
        batch: Dict[int, List[Tuple[Universal2DBox, Optional[int]]]],
    ) -> Dict[int, List[SortTrack]]:
        scenes = list(batch.keys())
        for sid in scenes:
            self._ensure_scene(sid)
        dmax = max((len(v) for v in batch.values()), default=0)
        if dmax == 0:
            for sid in scenes:
                self.epochs[sid] = self.epochs.get(sid, 0) + 1
            return {sid: [] for sid in scenes}
        dpad = _pad_pow2(dmax)
        self._ensure_capacity(int(self.active_count.max(initial=0)) + dmax)

        s = self.S
        box = np.zeros((s, dpad, 5), np.float32)
        conf = np.zeros((s, dpad), np.float32)
        valid = np.zeros((s, dpad), bool)
        epochs_vec = np.zeros((s,), np.int32)
        next_ids = np.zeros((s,), np.int32)
        customs: Dict[int, List[Optional[int]]] = {}

        base = self.next_track_id
        for sid in scenes:
            row = self.row_of_scene[sid]
            e = self.epochs.get(sid, 0) + 1
            self.epochs[sid] = e
            epochs_vec[row] = e
            dets = batch[sid]
            cl = []
            for i, (bb, cid) in enumerate(dets):
                box[row, i] = bb.to_vec5()
                conf[row, i] = bb.confidence
                valid[row, i] = True
                cl.append(cid)
            customs[sid] = cl
            next_ids[row] = base
            base += len(dets)  # reserve one id per detection (upper bound)
        self.next_track_id = base
        self.oriented = self.oriented or bool((box[..., 2] != 0).any())

        cfg = dataclasses.replace(self.cfg, oriented=self.oriented)
        step = _compiled_batch_step(cfg)
        state = dataclasses.replace(self.state, next_id=jnp.asarray(next_ids))
        state, out = step(
            state,
            jnp.asarray(box),
            jnp.asarray(conf),
            jnp.asarray(valid),
            jnp.asarray(epochs_vec),
        )
        self.state = state

        slot = np.asarray(out.slot)
        track_id = np.asarray(out.track_id)
        is_new = np.asarray(out.is_new)
        pred_box = np.asarray(out.pred_box)
        length = np.asarray(out.length)
        if bool(np.asarray(out.overflow).any()):
            raise RuntimeError("track store overflow (grow capacity)")

        results: Dict[int, List[SortTrack]] = {}
        for sid in scenes:
            row = self.row_of_scene[sid]
            dets = batch[sid]
            cl = customs[sid]
            self.active_count[row] += int(is_new[row, : len(dets)].sum())
            tracks = []
            for i in range(len(dets)):
                sl = int(slot[row, i])
                cid = cl[i]
                self.custom_ids[row, sl] = -1 if cid is None else cid
                self.has_custom[row, sl] = cid is not None
                tracks.append(
                    SortTrack(
                        id=int(track_id[row, i]),
                        epoch=int(epochs_vec[row]),
                        predicted_bbox=_box_from_row(
                            pred_box[row, i], float(conf[row, i])
                        ),
                        observed_bbox=_box_from_row(
                            box[row, i], float(conf[row, i])
                        ),
                        scene_id=sid,
                        length=int(length[row, i]),
                        voting_type=VotingType.Positional,
                        custom_object_id=cid,
                    )
                )
            results[sid] = tracks
        return results

    # --------------------------------------------------------------- waste
    def collect_wasted(self) -> List[WastedSortTrack]:
        active = np.asarray(self.state.active)
        last = np.asarray(self.state.last_epoch)
        out: List[WastedSortTrack] = []
        dead_rows = []
        dead_slots = []
        for sid, row in self.row_of_scene.items():
            cur = self.epochs.get(sid, 0)
            mask = active[row] & (last[row] + self.cfg.max_idle_epochs < cur)
            if not mask.any():
                continue
            slots = np.nonzero(mask)[0]
            out.extend(self._export(sid, row, slots))
            dead_rows.extend([row] * len(slots))
            dead_slots.extend(slots.tolist())
        if dead_rows:
            self.state = dataclasses.replace(
                self.state,
                active=self.state.active.at[
                    jnp.asarray(dead_rows), jnp.asarray(dead_slots)
                ].set(False),
            )
            for r, sl in zip(dead_rows, dead_slots):
                self.active_count[r] -= 1
                self.has_custom[r, sl] = False
        return out

    def _export(self, sid, row, slots) -> List[WastedSortTrack]:
        st = self.state
        return build_wasted_records(
            WastedSortTrack, sid, self.history,
            np.asarray(st.hist_obs[row, slots]),
            np.asarray(st.hist_pred[row, slots]),
            np.asarray(st.hist_conf[row, slots]),
            np.asarray(st.length[row, slots]),
            np.asarray(st.track_id[row, slots]),
            np.asarray(st.last_epoch[row, slots]),
        )

    def idle_tracks(self, scene_id: int) -> List[SortTrack]:
        row = self.row_of_scene.get(scene_id)
        if row is None:
            return []
        cur = self.epochs.get(scene_id, 0)
        st = self.state
        active = np.asarray(st.active[row])
        last = np.asarray(st.last_epoch[row])
        mask = active & (last != cur)
        slots = np.nonzero(mask)[0]
        if len(slots) == 0:
            return []
        pred = np.asarray(st.pred_box[row, slots])
        obs = np.asarray(st.obs_box[row, slots])
        conf = np.asarray(st.conf[row, slots])
        tid = np.asarray(st.track_id[row, slots])
        length = np.asarray(st.length[row, slots])
        res = []
        for k, sl in enumerate(slots):
            cid = (
                int(self.custom_ids[row, sl])
                if self.has_custom[row, sl]
                else None
            )
            res.append(
                SortTrack(
                    id=int(tid[k]),
                    epoch=int(last[sl]),
                    predicted_bbox=_box_from_row(pred[k], float(conf[k])),
                    observed_bbox=_box_from_row(obs[k], float(conf[k])),
                    scene_id=scene_id,
                    length=int(length[k]),
                    voting_type=VotingType.Positional,
                    custom_object_id=cid,
                )
            )
        return res

    def total_active(self) -> int:
        return int(self.active_count.sum())
