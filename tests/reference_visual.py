"""Literal NumPy implementation of the reference VisualSORT pipeline.

Test oracle following the reference semantics object-for-object: per-track
Kalman + gallery lists, per-pair metric with use/collect gates, BestFit greedy
claim on feature votes, Hungarian on the positional remainder
(`/root/reference/src/trackers/visual_sort/{metric,voting,simple_api}.rs`).
Axis-aligned IoU positional flavor.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

from reference_sort import CHI2_GATE, CHI2_UPPER, RefKF, rect_iou, too_far


class RefVisualTrack:
    def __init__(self, tid, kf, z, conf, feat, quality, epoch, max_obs):
        self.id = tid
        self.kf = kf
        self.mean, self.cov = kf.initiate(z)
        self.mean, self.cov = kf.predict(self.mean, self.cov)
        self.mean, self.cov = kf.update(self.mean, self.cov, z)
        self.pred = self.mean[:5].copy()
        self.conf = conf
        self.last_epoch = epoch
        self.length = 1
        self.max_obs = max_obs
        # gallery: list of (feature, quality); new-track feature bypasses gates
        self.gallery = [] if feat is None else [(feat.copy(), quality)]

    @property
    def collected(self):
        return len(self.gallery)

    def step(self, z, conf, feat, quality, collect_ok, epoch):
        self.mean, self.cov = self.kf.predict(self.mean, self.cov)
        self.mean, self.cov = self.kf.update(self.mean, self.cov, z)
        self.pred = self.mean[:5].copy()
        self.conf = conf
        self.last_epoch = epoch
        self.length += 1
        # optimize_observations semantics: evict lowest quality iff full
        if len(self.gallery) >= self.max_obs:
            drop = int(np.argmin([q for _, q in self.gallery]))
            del self.gallery[drop]
        if feat is not None and collect_ok:
            self.gallery.append((feat.copy(), quality))


class RefVisualSort:
    def __init__(
        self,
        iou_threshold=0.3,
        positional_kind="iou",
        positional_min_confidence=0.1,
        visual_kind="euclidean",
        visual_threshold=1e30,
        minimal_track_length=1,
        minimal_area=0.0,
        quality_use=0.0,
        quality_collect=0.0,
        max_observations=5,
        min_votes=1,
        max_idle_epochs=5,
    ):
        self.pkind = positional_kind
        self.thr = iou_threshold if positional_kind == "iou" else 1.0
        self.pmc = positional_min_confidence
        self.vkind = visual_kind
        self.vthr = visual_threshold
        self.mtl = minimal_track_length
        self.min_area = minimal_area
        self.q_use = quality_use
        self.q_collect = quality_collect
        self.max_obs = max_observations
        self.min_votes = min_votes
        self.max_idle = max_idle_epochs
        self.kf = RefKF()
        self.tracks: list[RefVisualTrack] = []
        self.epoch = 0
        self.next_id = 0

    def _use_ok(self, z, quality):
        area = z[3] * z[4] * z[4]
        return quality >= self.q_use and area >= self.min_area

    def _collect_ok(self, z, quality):
        area = z[3] * z[4] * z[4]
        return quality >= self.q_collect and area >= self.min_area

    def _vdist(self, a, b):
        if self.vkind == "euclidean":
            return float(np.linalg.norm(a - b))
        return float(a @ b / np.sqrt((a @ a) * (b @ b)))

    def predict(self, boxes, confs, feats, qualities):
        self.epoch += 1
        epoch = self.epoch
        self.tracks = [
            t for t in self.tracks if t.last_epoch + self.max_idle >= epoch
        ]
        d = len(boxes)
        tr = self.tracks
        t = len(tr)

        # feature distances -> votes/weights (BestFit grouping)
        records = []  # (i, j, dist)
        for i in range(d):
            if feats[i] is None or not self._use_ok(boxes[i], qualities[i]):
                continue
            for j, track in enumerate(tr):
                if track.collected < self.mtl:
                    continue
                for gfeat, _gq in track.gallery:
                    dd = self._vdist(feats[i], gfeat)
                    ok = (
                        dd <= self.vthr
                        if self.vkind == "euclidean"
                        else dd >= self.vthr
                    )
                    if ok:
                        w = dd if self.vkind == "euclidean" else 1.0 - dd
                        records.append((i, j, w))
        max_dist = max((w for (_, _, w) in records), default=-1.0)
        groups = {}
        for i, j, w in records:
            groups.setdefault((i, j), []).append(w)
        elts = [
            (i, j, sum(max_dist - w for w in ws))
            for (i, j), ws in groups.items()
            if len(ws) >= self.min_votes
        ]
        elts.sort(key=lambda e: -e[2])
        claimed = set()
        winner_of = {}  # candidate -> (track_idx or None(self))
        best_of = {}
        for i, j, w in elts:
            stolen = j in claimed
            if not stolen:
                claimed.add(j)
            if i not in best_of:
                best_of[i] = (j, stolen)
        visual_decided = set(best_of)
        vis_match = {i: j for i, (j, stolen) in best_of.items() if not stolen}

        # positional Hungarian over the remainder
        rows = [i for i in range(d) if i not in visual_decided]
        cols = [j for j in range(t) if j not in claimed]
        W = np.zeros((d, d + t), np.float32)
        for i in range(d):
            W[i, i] = self.thr
        for i in rows:
            conf = max(confs[i], self.pmc)
            for j in cols:
                track = tr[j]
                if epoch - track.last_epoch > self.max_idle:
                    continue
                if too_far(boxes[i], track.pred):
                    continue
                if self.pkind == "iou":
                    iou = rect_iou(boxes[i], track.pred)
                    if iou <= 0.0:
                        continue
                    m = iou * conf
                    if m < self.thr:
                        m = 0.0
                    W[i, d + j] = m
                else:
                    dist = self.kf.distance(track.mean, track.cov, boxes[i])
                    cost = 0.0 if dist > CHI2_GATE else CHI2_UPPER - dist
                    W[i, d + j] = cost / conf
        rr, cc = linear_sum_assignment(W, maximize=True)
        assign = dict(zip(rr.tolist(), cc.tolist()))

        out_ids = np.zeros(d, np.int64)
        out_vt = [None] * d  # 'visual' | 'positional' | 'new'
        for i in range(d):
            j = vis_match.get(i)
            if j is not None:
                track = tr[j]
                track.step(
                    boxes[i], confs[i], feats[i], qualities[i],
                    feats[i] is not None
                    and self._collect_ok(boxes[i], qualities[i]),
                    epoch,
                )
                out_ids[i] = track.id
                out_vt[i] = "visual"
                continue
            c = assign.get(i, i)
            if i not in visual_decided and c >= d and W[i, c] >= self.thr:
                track = tr[c - d]
                track.step(
                    boxes[i], confs[i], feats[i], qualities[i],
                    feats[i] is not None
                    and self._collect_ok(boxes[i], qualities[i]),
                    epoch,
                )
                out_ids[i] = track.id
                out_vt[i] = "positional"
            else:
                self.next_id += 1
                nt = RefVisualTrack(
                    self.next_id, self.kf, boxes[i], confs[i],
                    feats[i] if feats[i] is not None else None,
                    qualities[i], epoch, self.max_obs,
                )
                self.tracks.append(nt)
                out_ids[i] = nt.id
                out_vt[i] = "new"
        return out_ids, out_vt
