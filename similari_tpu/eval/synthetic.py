"""Synthetic MOT sequence generator for accuracy evaluation.

No MOT17/MOT20 data ships in this environment (zero egress), so accuracy is
exercised on synthetic scenes with known ground truth: random-walk objects
with birth/death windows, detector noise, dropouts, and false positives —
the same knobs that differentiate trackers on real MOT data.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

GT = Dict[int, List[Tuple[int, float, float, float, float]]]
Dets = Dict[int, List[Tuple[float, float, float, float, float]]]


def generate_sequence(
    n_objects: int = 20,
    n_frames: int = 100,
    arena: float = 800.0,
    seed: int = 0,
    pos_noise: float = 1.0,
    wh_noise: float = 0.5,
    p_miss: float = 0.05,
    fp_per_frame: float = 0.5,
    birth_death: bool = True,
    feature_dim: int = 0,
    feature_noise: float = 0.05,
) -> Tuple[GT, Dets]:
    """When feature_dim > 0 also returns per-frame ReID features aligned with
    detections: (gt, dets, feats) — identity embeddings + noise, random
    embeddings for false positives."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(50, arena - 50, size=(n_objects, 2))
    vel = rng.uniform(-3, 3, size=(n_objects, 2))
    wh = rng.uniform(25, 55, size=(n_objects, 2))
    if birth_death:
        birth = rng.integers(0, n_frames // 3, size=n_objects)
        death = rng.integers(2 * n_frames // 3, n_frames, size=n_objects)
    else:
        birth = np.zeros(n_objects, int)
        death = np.full(n_objects, n_frames - 1)

    if feature_dim:
        identities = rng.normal(size=(n_objects, feature_dim)) * 2.0
    gt: GT = {}
    dets: Dets = {}
    feats: Dict[int, List] = {}
    for f in range(n_frames):
        xy += vel + rng.normal(0, 0.3, size=xy.shape)
        vel = np.clip(vel + rng.normal(0, 0.2, size=vel.shape), -4, 4)
        # bounce off walls
        for d in range(2):
            low = xy[:, d] < 30
            high = xy[:, d] > arena - 30
            vel[low, d] = np.abs(vel[low, d])
            vel[high, d] = -np.abs(vel[high, d])
        gt_rows = []
        det_rows = []
        feat_rows = []
        for i in range(n_objects):
            if not (birth[i] <= f <= death[i]):
                continue
            l = xy[i, 0] - wh[i, 0] / 2
            t = xy[i, 1] - wh[i, 1] / 2
            gt_rows.append((i + 1, l, t, wh[i, 0], wh[i, 1]))
            if rng.uniform() < p_miss:
                continue
            if feature_dim:
                feat_rows.append(
                    (identities[i] + rng.normal(size=feature_dim) * feature_noise)
                    .astype(np.float32)
                )
            det_rows.append(
                (
                    l + rng.normal(0, pos_noise),
                    t + rng.normal(0, pos_noise),
                    max(5.0, wh[i, 0] + rng.normal(0, wh_noise)),
                    max(5.0, wh[i, 1] + rng.normal(0, wh_noise)),
                    float(np.clip(rng.normal(0.9, 0.05), 0.1, 1.0)),
                )
            )
        # false positives
        n_fp = rng.poisson(fp_per_frame)
        for _ in range(n_fp):
            if feature_dim:
                feat_rows.append(rng.normal(size=feature_dim).astype(np.float32) * 2.0)
            det_rows.append(
                (
                    rng.uniform(0, arena),
                    rng.uniform(0, arena),
                    rng.uniform(20, 50),
                    rng.uniform(20, 50),
                    float(np.clip(rng.normal(0.5, 0.2), 0.1, 1.0)),
                )
            )
        gt[f + 1] = gt_rows
        if det_rows:
            dets[f + 1] = det_rows
            if feature_dim:
                feats[f + 1] = feat_rows
    if feature_dim:
        return gt, dets, feats
    return gt, dets


def generate_adversarial_sequence(scenario: str, seed: int = 0,
                                  n_frames: int = 120):
    """Adversarial scenarios for the accuracy-delta suite (round-4 VERDICT
    item 8).  Each returns (gt, dets) shaped like `generate_sequence`.

    Scenarios:
      crossing  — two columns of targets walk through each other (sustained
                  mutual proximity; the classic id-switch generator)
      fp_burst  — clean tracking with a mid-sequence burst of ~12 false
                  positives per frame for 20 frames
      idle_gaps — every object vanishes for a window of 2-7 frames
                  (straddling max_idle_epochs=5: some gaps re-identify,
                  some legitimately terminate)
      churn     — heavy birth/death plus 15% detector misses
      capacity  — 120 objects with churn (pressure for small stores and
                  recycle_idle)
    """
    rng = np.random.default_rng(seed)
    if scenario == "crossing":
        n = 24
        gt: GT = {}
        dets: Dets = {}
        # two columns at x=100 and x=700 moving toward each other; rows
        # offset so pairs pass within a box height of each other
        y0 = np.linspace(60, 740, n // 2)
        wh = np.full((n, 2), 34.0)
        for f in range(n_frames):
            gt_rows, det_rows = [], []
            for i in range(n // 2):
                xa = 100.0 + 5.0 * f
                xb = 700.0 - 5.0 * f
                for k, x in ((0, xa), (1, xb)):
                    j = 2 * i + k
                    y = y0[i] + (8.0 if k else -8.0)
                    l, t = x - wh[j, 0] / 2, y - wh[j, 1] / 2
                    gt_rows.append((j + 1, l, t, wh[j, 0], wh[j, 1]))
                    det_rows.append((l + rng.normal(0, 1.0),
                                     t + rng.normal(0, 1.0),
                                     wh[j, 0], wh[j, 1], 0.9))
            gt[f + 1] = gt_rows
            dets[f + 1] = det_rows
        return gt, dets
    if scenario == "fp_burst":
        gt, dets = generate_sequence(
            n_objects=20, n_frames=n_frames, seed=seed, p_miss=0.02,
            fp_per_frame=0.2, birth_death=False)
        for f in range(50, 70):
            rows = dets.setdefault(f + 1, [])
            for _ in range(12):
                rows.append((rng.uniform(0, 800), rng.uniform(0, 800),
                             rng.uniform(20, 50), rng.uniform(20, 50),
                             float(np.clip(rng.normal(0.6, 0.2), 0.1, 1.0))))
        return gt, dets
    if scenario == "idle_gaps":
        gt, dets = generate_sequence(
            n_objects=16, n_frames=n_frames, seed=seed, p_miss=0.0,
            fp_per_frame=0.0, birth_death=False)
        # carve per-object occlusion windows out of the detections (gt keeps
        # the object: missing it costs FN, a late re-identify costs IDSW).
        # With p_miss=0 and no FPs, dets[f][k] aligns with gt[f][k] by
        # construction, so windows apply by index.
        windows = {}
        for i in range(16):
            start = int(rng.integers(20, n_frames - 20))
            gap = int(rng.integers(2, 8))  # 2-7 frames vs max_idle_epochs=5
            windows[i + 1] = (start, start + gap)
        for f in list(dets):
            kept = []
            for k, d in enumerate(dets[f]):
                oid = gt[f][k][0]
                a, b = windows.get(oid, (0, 0))
                if a <= f < b:
                    continue
                kept.append(d)
            dets[f] = kept
        return gt, dets
    if scenario == "churn":
        return generate_sequence(
            n_objects=40, n_frames=n_frames, seed=seed, p_miss=0.15,
            fp_per_frame=2.0, birth_death=True)
    if scenario == "capacity":
        return generate_sequence(
            n_objects=120, n_frames=n_frames, arena=2000.0, seed=seed,
            p_miss=0.1, fp_per_frame=3.0, birth_death=True)
    raise ValueError(f"unknown scenario {scenario!r}")
