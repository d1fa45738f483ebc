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
