"""Regression tests mirroring the reference's recorded bugfixes.

The reference ships regression scripts under `python/bugfixes/`:

* `github-84.py` — rotated-IoU bug: the old axis-aligned fast path keyed on
  *equal normalized angles*, which is wrong for equal nonzero angles; it was
  fixed by always running the general clip (`src/utils/bbox.rs:477-485`).
  Our kernels must therefore be exact for equal-nonzero-angle pairs, and the
  static `oriented` flag (the only fast-path gate we allow) must never be
  inferred from per-pair angle comparisons.

* `bug_vs_1/bug_visual_sort.py` — VisualSort identity stability on a recorded
  crossing-pedestrians sequence. We reproduce the *scenario class*
  (two objects crossing paths with distinct ReID features) synthetically:
  positional IoU alone would swap ids at the crossing; the feature gallery
  must keep them.
"""

import math

import numpy as np
import pytest

import similari_tpu as s
from similari_tpu.ops import geometry as G

import jax.numpy as jnp


def _shoelace(pts):
    area = 0.0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        area += x1 * y2 - x2 * y1
    return abs(area) / 2.0


def test_github_84_equal_nonzero_angles():
    """Equal nonzero angles: intersection must be the true rotated overlap,
    not the axis-aligned bbox overlap the buggy shortcut produced."""
    angle = 0.9
    a = s.Universal2DBox(0.0, 0.0, angle, 1.0, 4.0)
    b = s.Universal2DBox(1.0, 0.5, angle, 1.0, 4.0)
    inter = s.intersection_area(a, b)

    # ground truth from the clipped polygon itself (host SH path, f64)
    poly = s.sutherland_hodgman_clip(a, b)
    expected = _shoelace(poly.get_points())
    assert abs(inter - expected) < 1e-3 * max(expected, 1.0)
    assert expected > 0.0

    # device kernel agrees for a whole grid of equal-angle pairs
    for ang in (0.3, 0.9, 2.0, math.pi / 2):
        pa = jnp.asarray([0.0, 0.0, ang, 1.0, 4.0], jnp.float32)
        pb = jnp.asarray([1.0, 0.5, ang, 1.0, 4.0], jnp.float32)
        dev = float(G.rotated_intersection(pa, pb))
        host = _shoelace(
            s.sutherland_hodgman_clip(
                s.Universal2DBox(0.0, 0.0, ang, 1.0, 4.0),
                s.Universal2DBox(1.0, 0.5, ang, 1.0, 4.0),
            ).get_points()
        )
        assert abs(dev - host) < 1e-2, (ang, dev, host)


def test_github_84_tracking_no_duplicate_ids():
    """Oriented SORT on equal-angle boxes keeps one id per object (the
    original bug surfaced as broken association on rotated detections)."""
    sort = s.Sort(shards=1, bbox_history=4, max_idle_epochs=2)
    ids = set()
    for f in range(6):
        dets = [
            (s.Universal2DBox(10.0 + 0.2 * f, 10.0, 0.9, 0.5, 8.0), 1),
            (s.Universal2DBox(30.0, 20.0 + 0.2 * f, 0.9, 0.5, 8.0), 2),
        ]
        tracks = sort.predict(dets)
        assert len(tracks) == 2
        ids.update(t.id for t in tracks)
    assert len(ids) == 2, ids


def test_visual_sort_identity_through_crossing():
    """bug_vs_1 scenario class: two objects swap positions; ReID features
    must carry identity through the crossing."""
    rng = np.random.default_rng(7)
    fa = rng.normal(size=128).astype(np.float32)
    fb = rng.normal(size=128).astype(np.float32)
    fa /= np.linalg.norm(fa)
    fb /= np.linalg.norm(fb)

    opts = (
        s.VisualSortOptions()
        .max_idle_epochs(5)
        .kept_history_length(10)
        .visual_metric(s.VisualSortMetricType.cosine(0.2))
        .visual_minimal_track_length(2)
        .visual_max_observations(5)
    )
    vs = s.VisualSort(shards=1, opts=opts)

    id_a = id_b = None
    n_frames = 13
    for f in range(n_frames):
        # A moves left->right, B right->left along the same line; they meet
        # mid-sequence where IoU association alone is ambiguous.
        xa = 10.0 + 5.0 * f
        xb = 10.0 + 5.0 * (n_frames - 1 - f)
        obs = s.VisualSortObservationSet()
        obs.add(s.VisualSortObservation(
            fa + rng.normal(scale=0.01, size=128).astype(np.float32),
            0.95, s.Universal2DBox(xa, 50.0, None, 0.5, 20.0), 1))
        obs.add(s.VisualSortObservation(
            fb + rng.normal(scale=0.01, size=128).astype(np.float32),
            0.95, s.Universal2DBox(xb, 50.0, None, 0.5, 20.0), 2))
        tracks = vs.predict(obs)
        assert len(tracks) == 2
        by_custom = {t.custom_object_id: t.id for t in tracks}
        if f == 0:
            id_a, id_b = by_custom[1], by_custom[2]
            assert id_a != id_b
        elif f >= 2:  # galleries warm (visual_minimal_track_length=2)
            assert by_custom[1] == id_a, f"id A switched at frame {f}"
            assert by_custom[2] == id_b, f"id B switched at frame {f}"
