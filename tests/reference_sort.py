"""Straightforward NumPy implementation of the reference SORT semantics.

Used as a test oracle: follows the reference pipeline literally (per-track
Kalman objects, per-pair metric, scipy Hungarian on the augmented matrix) so
the fused device tracker can be property-tested for exact agreement.
Mirrors `/root/reference/src/trackers/sort/simple_api.rs:110-196` +
`sort/metric.rs` + `sort/voting.rs` + `utils/kalman/kalman_2d_box.rs`.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

CHI2_GATE = 11.070  # CHI2INV95[4] (0-based) for dof 5
CHI2_UPPER = 100.0


class RefKF:
    def __init__(self, pw=1.0 / 20.0, vw=1.0 / 160.0):
        self.pw, self.vw = pw, vw
        self.F = np.eye(10, dtype=np.float32)
        for i in range(5):
            self.F[i, 5 + i] = 1.0
        self.H = np.eye(5, 10, dtype=np.float32)

    def _stds(self, k, cnst, p, w):
        s = k * w * p
        return np.array([s, s, s, cnst, s], np.float32)

    def initiate(self, z):
        mean = np.concatenate([z, np.zeros(5, np.float32)])
        std = np.concatenate(
            [self._stds(2, 1e-2, z[4], self.pw), self._stds(10, 1e-5, z[4], self.vw)]
        )
        return mean, np.diag(std * std).astype(np.float32)

    def predict(self, mean, cov):
        q = np.concatenate(
            [self._stds(1, 1e-2, mean[4], self.pw), self._stds(1, 1e-5, mean[4], self.vw)]
        )
        return self.F @ mean, self.F @ cov @ self.F.T + np.diag(q * q)

    def project(self, mean, cov):
        r = self._stds(1, 1e-1, mean[4], self.pw)
        return self.H @ mean, self.H @ cov @ self.H.T + np.diag(r * r)

    def update(self, mean, cov, z):
        pm, S = self.project(mean, cov)
        b = (cov @ self.H.T).T
        gain = np.linalg.solve(np.tril(S), b)
        innov = (z - pm)[None, :]
        mean2 = mean + (innov @ gain)[0]
        cov2 = cov - gain.T @ S @ gain
        return mean2, cov2

    def distance(self, mean, cov, z):
        pm, S = self.project(mean, cov)
        L = np.linalg.cholesky(S)
        nu = np.linalg.solve(L, z - pm)
        return float(nu @ nu)


def radius(z):
    hw = z[3] * z[4] / 2.0
    hh = z[4] / 2.0
    return np.hypot(hw, hh)


def too_far(a, b):
    md = radius(a) + radius(b)
    return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 > md * md


def box_vertices(z):
    """Rotated-rect corners, f64, reference order (`bbox.rs:287-330`)."""
    c, s = np.cos(float(z[2])), np.sin(float(z[2]))
    hw = float(z[3]) * float(z[4]) * 0.5
    hh = float(z[4]) * 0.5
    r1 = (-hw * c - hh * s, -hw * s + hh * c)
    r2 = (hw * c - hh * s, hw * s + hh * c)
    x, y = float(z[0]), float(z[1])
    return [
        (x + r1[0], y + r1[1]),
        (x + r2[0], y + r2[1]),
        (x - r1[0], y - r1[1]),
        (x - r2[0], y - r2[1]),
    ]


def _sh_clip(subject, clip):
    """Sutherland–Hodgman polygon clipping in f64 (`clipping.rs:12-91`)."""
    def inside(p, a, b):
        # Clockwise vertex order (box_vertices matches `bbox.rs:287-330`), so a
        # point is inside the clip edge when the cross product is <= 0 — the
        # reference's exact test (`clipping.rs:12-15`).  Round 1 shipped this
        # with the sign flipped, which clipped every polygon to empty.
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) <= 0

    def isect(p1, p2, a, b):
        dc = (a[0] - b[0], a[1] - b[1])
        dp = (p1[0] - p2[0], p1[1] - p2[1])
        n1 = a[0] * b[1] - a[1] * b[0]
        n2 = p1[0] * p2[1] - p1[1] * p2[0]
        n3 = 1.0 / (dc[0] * dp[1] - dc[1] * dp[0])
        return ((n1 * dp[0] - n2 * dc[0]) * n3, (n1 * dp[1] - n2 * dc[1]) * n3)

    out = list(subject)
    a = clip[-1]
    for b in clip:
        src, out = out, []
        if not src:
            return []
        p1 = src[-1]
        for p2 in src:
            if inside(p2, a, b):
                if not inside(p1, a, b):
                    out.append(isect(p1, p2, a, b))
                out.append(p2)
            elif inside(p1, a, b):
                out.append(isect(p1, p2, a, b))
            p1 = p2
        a = b
    return out


def _shoelace(pts):
    area = 0.0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        area += x1 * y2 - x2 * y1
    return abs(area) / 2.0


def poly_iou(a, b):
    """Rotated-box IoU via the general clip path (`bbox.rs:476-535`)."""
    if too_far(a, b):
        return 0.0
    inter = _shoelace(_sh_clip(box_vertices(a), box_vertices(b)))
    area_a = float(a[3]) * float(a[4]) * float(a[4])
    area_b = float(b[3]) * float(b[4]) * float(b[4])
    union = area_a + area_b - inter
    return inter / union if union > 0 else 0.0


def rect_iou(a, b):
    """Axis-aligned IoU via (xc, yc, angle=0, aspect, h) boxes."""
    def ltwh(z):
        w = z[3] * z[4]
        return z[0] - w / 2, z[1] - z[4] / 2, w, z[4]

    ax, ay, aw, ah = ltwh(a)
    bx, by, bw, bh = ltwh(b)
    x1, y1 = max(ax, bx), max(ay, by)
    x2, y2 = min(ax + aw, bx + bw), min(ay + ah, by + bh)
    iw, ih = x2 - x1, y2 - y1
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    return inter / (aw * ah + bw * bh - inter)


class RefTrack:
    def __init__(self, tid, kf, z, conf, epoch):
        self.id = tid
        self.kf = kf
        self.mean, self.cov = kf.initiate(z)
        self.mean, self.cov = kf.predict(self.mean, self.cov)
        self.mean, self.cov = kf.update(self.mean, self.cov, z)
        self.pred = self.mean[:5].copy()
        self.obs = z.copy()
        self.conf = conf
        self.last_epoch = epoch
        self.length = 1

    def step(self, z, conf, epoch):
        self.mean, self.cov = self.kf.predict(self.mean, self.cov)
        self.mean, self.cov = self.kf.update(self.mean, self.cov, z)
        self.pred = self.mean[:5].copy()
        self.obs = z.copy()
        self.conf = conf
        self.last_epoch = epoch
        self.length += 1


class RefSort:
    """Oracle SORT: axis-aligned boxes only (angle==0)."""

    def __init__(self, method="iou", threshold=0.3, min_confidence=0.05,
                 max_idle_epochs=5, oriented=False):
        self.method = method
        self.oriented = oriented
        self.threshold = threshold
        self.min_confidence = min_confidence
        self.max_idle = max_idle_epochs
        self.kf = RefKF()
        self.tracks: list[RefTrack] = []
        self.epoch = 0
        self.next_id = 0

    def predict(self, boxes, confs):
        self.epoch += 1
        epoch = self.epoch
        # waste
        self.tracks = [
            t for t in self.tracks if t.last_epoch + self.max_idle >= epoch
        ]
        d = len(boxes)
        tr = self.tracks
        t = len(tr)
        W = np.zeros((d, d + t), np.float32)
        thr = self.threshold if self.method == "iou" else 1.0
        for i in range(d):
            W[i, i] = thr
        for i in range(d):
            conf = max(confs[i], self.min_confidence)
            for j, track in enumerate(tr):
                if epoch - track.last_epoch > self.max_idle:
                    continue
                if too_far(boxes[i], track.pred):
                    continue
                if self.method == "iou":
                    iou = (poly_iou if self.oriented else rect_iou)(
                        boxes[i], track.pred
                    )
                    if iou <= 0.0:
                        continue
                    m = iou * conf
                    if m < self.threshold:
                        m = 0.0
                    W[i, d + j] = m
                else:
                    dist = self.kf.distance(track.mean, track.cov, boxes[i])
                    cost = 0.0 if dist > CHI2_GATE else CHI2_UPPER - dist
                    W[i, d + j] = cost / conf

        rows, cols = linear_sum_assignment(W, maximize=True)
        out_ids = np.zeros(d, np.int64)
        assign = dict(zip(rows.tolist(), cols.tolist()))
        for i in range(d):
            c = assign[i]
            if c >= d and W[i, c] >= thr:
                track = tr[c - d]
                track.step(boxes[i], confs[i], epoch)
                out_ids[i] = track.id
            else:
                self.next_id += 1
                nt = RefTrack(self.next_id, self.kf, boxes[i], confs[i], epoch)
                self.tracks.append(nt)
                out_ids[i] = nt.id
        return out_ids
