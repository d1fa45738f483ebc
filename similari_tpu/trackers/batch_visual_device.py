"""Device-batched multi-scene VisualSORT engine.

Visual analog of `batch_device.SceneBatchEngine`: all scenes of a
BatchVisualSort live as rows of one batched VisualState, and each prediction
request dispatches a single vmapped visual step (the reference's voting
worker threads, `visual_sort/batch_api.rs:54-335`, become the vmap axis).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import batched_visual_step
from ..utils.clipping import exclusively_owned_areas_normalized_shares
from .sort import SortTrack, VotingType, WastedSortTrack, _box_from_row, _pad_pow2
from .waste import build_wasted_records
from .visual import VisualSortObservation, WastedVisualSortTrack
from .visual_state import VisualState, new_visual_state
from .visual_step import VisualConfig


@lru_cache(maxsize=None)
def _compiled_batch_visual_step(cfg: VisualConfig):
    return jax.jit(batched_visual_step(cfg), donate_argnums=(0,))


class VisualSceneBatchEngine:
    def __init__(self, cfg: VisualConfig, history: int, gallery: int,
                 capacity: int = 128, scene_capacity: int = 8):
        self.cfg = cfg
        self.history = history
        self.gallery = gallery
        self.T = capacity
        self.S = scene_capacity
        self.F = 1  # grows on first features
        self.state: VisualState = self._new_states(self.S, self.T, self.F)
        self.row_of_scene: Dict[int, int] = {}
        self.custom_ids = np.full((self.S, self.T), -1, np.int64)
        self.has_custom = np.zeros((self.S, self.T), bool)
        self.active_count = np.zeros((self.S,), np.int64)
        self.epochs: Dict[int, int] = {}
        self.next_track_id = 0
        self.oriented = False

    def _new_states(self, s, t, f) -> VisualState:
        one = new_visual_state(t, self.history, self.gallery, f)
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (s,) + a.shape).copy(), one
        )

    # ------------------------------------------------------------ capacity
    def _ensure_scene(self, scene_id: int):
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
            self.has_custom = np.pad(self.has_custom, ((0, new_s - self.S), (0, 0)))
            self.active_count = np.pad(self.active_count, (0, new_s - self.S))
            self.S = new_s
        self.row_of_scene[scene_id] = row
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

    def _ensure_feature_dim(self, min_f: int):
        if min_f <= self.F:
            return
        self.state = dataclasses.replace(
            self.state,
            feats=jnp.pad(self.state.feats, ((0, 0), (0, 0), (0, 0), (0, min_f - self.F))),
            hist_feat=jnp.pad(
                self.state.hist_feat, ((0, 0), (0, 0), (0, 0), (0, min_f - self.F))
            ),
        )
        self.F = min_f

    # -------------------------------------------------------------- predict
    def predict_scenes(
        self, batch: Dict[int, List[VisualSortObservation]]
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
        fdim = max(
            [self.F]
            + [
                len(o.feature)
                for obs in batch.values()
                for o in obs
                if o.feature is not None
            ]
        )
        self._ensure_feature_dim(fdim)

        # device own-area backend computes shares inside the vmapped step
        use_own_area = (
            self.cfg.own_area_use + self.cfg.own_area_collect > 0.0
        ) and self.cfg.own_area_backend == "host"
        s = self.S
        box = np.zeros((s, dpad, 5), np.float32)
        conf = np.zeros((s, dpad), np.float32)
        valid = np.zeros((s, dpad), bool)
        feat = np.zeros((s, dpad, self.F), np.float32)
        fvalid = np.zeros((s, dpad), bool)
        qual = np.zeros((s, dpad), np.float32)
        oa = np.ones((s, dpad), np.float32)
        epochs_vec = np.zeros((s,), np.int32)
        next_ids = np.zeros((s,), np.int32)

        base = self.next_track_id
        for sid in scenes:
            row = self.row_of_scene[sid]
            e = self.epochs.get(sid, 0) + 1
            self.epochs[sid] = e
            epochs_vec[row] = e
            obs = batch[sid]
            if use_own_area:
                shares = exclusively_owned_areas_normalized_shares(
                    [o.bounding_box for o in obs]
                )
            for i, o in enumerate(obs):
                box[row, i] = o.bounding_box.to_vec5()
                conf[row, i] = o.bounding_box.confidence
                valid[row, i] = True
                qual[row, i] = 1.0 if o.feature_quality is None else o.feature_quality
                if use_own_area:
                    oa[row, i] = shares[i]
                if o.feature is not None:
                    feat[row, i, : len(o.feature)] = o.feature
                    fvalid[row, i] = True
            next_ids[row] = base
            base += len(obs)
        self.next_track_id = base
        self.oriented = self.oriented or bool((box[..., 2] != 0).any())

        cfg = dataclasses.replace(self.cfg, oriented=self.oriented)
        step = _compiled_batch_visual_step(cfg)
        state = dataclasses.replace(self.state, next_id=jnp.asarray(next_ids))
        state, out = step(
            state,
            jnp.asarray(box), jnp.asarray(conf), jnp.asarray(valid),
            jnp.asarray(feat), jnp.asarray(fvalid), jnp.asarray(qual),
            jnp.asarray(oa), jnp.asarray(epochs_vec),
        )
        self.state = state

        slot = np.asarray(out.slot)
        track_id = np.asarray(out.track_id)
        is_new = np.asarray(out.is_new)
        pred_box = np.asarray(out.pred_box)
        length = np.asarray(out.length)
        vt = np.asarray(out.voting_type)
        if bool(np.asarray(out.overflow).any()):
            raise RuntimeError("track store overflow (grow capacity)")

        results: Dict[int, List[SortTrack]] = {}
        for sid in scenes:
            row = self.row_of_scene[sid]
            obs = batch[sid]
            self.active_count[row] += int(is_new[row, : len(obs)].sum())
            tracks = []
            for i, o in enumerate(obs):
                sl = int(slot[row, i])
                cid = o.custom_object_id
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
                        voting_type=(
                            VotingType.Positional
                            if is_new[row, i]
                            else (
                                VotingType.Visual
                                if vt[row, i] == 0
                                else VotingType.Positional
                            )
                        ),
                        custom_object_id=cid,
                    )
                )
            results[sid] = tracks
        return results

    # --------------------------------------------------------------- waste
    def collect_wasted(self) -> List[WastedVisualSortTrack]:
        active = np.asarray(self.state.active)
        last = np.asarray(self.state.last_epoch)
        out: List[WastedVisualSortTrack] = []
        dead_rows, dead_slots = [], []
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

    def _export(self, sid, row, slots) -> List[WastedVisualSortTrack]:
        st = self.state
        return build_wasted_records(
            WastedVisualSortTrack, sid, self.history,
            np.asarray(st.hist_obs[row, slots]),
            np.asarray(st.hist_pred[row, slots]),
            np.asarray(st.hist_conf[row, slots]),
            np.asarray(st.length[row, slots]),
            np.asarray(st.track_id[row, slots]),
            np.asarray(st.last_epoch[row, slots]),
            hist_feat=np.asarray(st.hist_feat[row, slots]),
            hist_feat_valid=np.asarray(st.hist_feat_valid[row, slots]),
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
        vt = np.asarray(st.voting_type[row, slots])
        res = []
        for k, sl in enumerate(slots):
            cid = (
                int(self.custom_ids[row, sl]) if self.has_custom[row, sl] else None
            )
            res.append(
                SortTrack(
                    id=int(tid[k]),
                    epoch=int(last[sl]),
                    predicted_bbox=_box_from_row(pred[k], float(conf[k])),
                    observed_bbox=_box_from_row(obs[k], float(conf[k])),
                    scene_id=scene_id,
                    length=int(length[k]),
                    voting_type=(
                        VotingType.Visual if vt[k] == 0 else VotingType.Positional
                    ),
                    custom_object_id=cid,
                )
            )
        return res

    def total_active(self) -> int:
        return int(self.active_count.sum())
