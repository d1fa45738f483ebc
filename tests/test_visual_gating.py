"""Visual metric gating matrix at the step level.

Mirrors the reference gating tests (`visual_sort/metric.rs:676-1099`):
too-far kills only the positional part, short tracks / small boxes / low
quality / low own-area kill only the visual part.
"""

import numpy as np
import pytest

from similari_tpu import BoundingBox
from similari_tpu.trackers import PositionalMetricType, VotingType
from similari_tpu.trackers.visual import (
    VisualSort,
    VisualSortMetricType,
    VisualSortObservation,
    VisualSortObservationSet,
    VisualSortOptions,
)


def obs(feature, quality, bb, cid=None):
    return VisualSortObservation(feature, quality, bb.as_xyaah(), cid)


def oset(*observations):
    s = VisualSortObservationSet()
    for o in observations:
        s.add(o)
    return s


def base_opts(**kw):
    o = (
        VisualSortOptions()
        .max_idle_epochs(10)
        .visual_metric(VisualSortMetricType.euclidean(10.0))
        .positional_metric(PositionalMetricType.iou(0.3))
        .visual_minimal_track_length(1)
        .visual_max_observations(5)
        .visual_min_votes(1)
    )
    for name, val in kw.items():
        getattr(o, name)(val)
    return o


def test_far_box_matches_visually():
    """Positional gate (too_far) fails but appearance still wins the match
    (`metric.rs:676-724`: attribute_metric None, feature_distance Some)."""
    t = VisualSort(1, base_opts())
    f = [0.5] * 8
    t.predict(oset(obs(f, 0.9, BoundingBox(0.0, 0.0, 5.1, 10.0), 1)))
    # far away but same appearance -> visual merge
    v = t.predict(oset(obs(f, 0.9, BoundingBox(300.0, 0.0, 5.1, 10.0), 1)))
    assert v[0].length == 2
    assert v[0].voting_type == VotingType.Visual


def test_track_too_short_for_visual():
    """collected < minimal_track_length -> positional only (`metric.rs:826-874`)."""
    t = VisualSort(1, base_opts(visual_minimal_track_length=3))
    f = [0.5] * 8
    t.predict(oset(obs(f, 0.9, BoundingBox(0.0, 0.0, 5.1, 10.0), 1)))
    # far away: positional fails, and visual is gated by track length -> new track
    v = t.predict(oset(obs(f, 0.9, BoundingBox(300.0, 0.0, 5.1, 10.0), 1)))
    assert v[0].length == 1  # new track


def test_small_bbox_disables_visual():
    """Candidate bbox area < visual_minimal_area -> no visual (`metric.rs:944-994`)."""
    t = VisualSort(1, base_opts(visual_minimal_area=100.0))
    f = [0.5] * 8
    # area 5.1*10*... ~51 < 100 -> candidate feature unusable AND uncollectable
    # after the first (new-track optimize bypasses collect, but use-gate is
    # still area-gated for voting)
    t.predict(oset(obs(f, 0.9, BoundingBox(0.0, 0.0, 5.1, 10.0), 1)))
    v = t.predict(oset(obs(f, 0.9, BoundingBox(300.0, 0.0, 5.1, 10.0), 1)))
    assert v[0].length == 1  # visual blocked by area -> far box = new track


def test_low_quality_disables_visual():
    """quality < visual_minimal_quality_use (`metric.rs:997-1045`)."""
    t = VisualSort(1, base_opts(visual_minimal_quality_use=0.5))
    f = [0.5] * 8
    t.predict(oset(obs(f, 0.9, BoundingBox(0.0, 0.0, 5.1, 10.0), 1)))
    v = t.predict(oset(obs(f, 0.3, BoundingBox(300.0, 0.0, 5.1, 10.0), 1)))
    assert v[0].length == 1


def test_low_own_area_disables_visual(monkeypatch):
    """own_area < visual_minimal_own_area_percentage_use (`metric.rs:1048-1098`).

    Two heavily-overlapping detections get low own-area shares; with the
    use-threshold active their features cannot vote.
    """
    t = VisualSort(
        1,
        base_opts().visual_minimal_own_area_percentage_use(0.9),
    )
    f1 = [0.5] * 8
    f2 = [-0.5] * 8
    a = BoundingBox(0.0, 0.0, 10.0, 20.0)
    b = BoundingBox(1.0, 1.0, 10.0, 20.0)  # overlaps a heavily
    t.predict(oset(obs(f1, 0.9, a, 1), obs(f2, 0.9, b, 2)))
    # far detections with matching features: own-area of a single detection
    # is 1.0 -> usable; but the TRACK gallery was collected under low own-area
    # (collect threshold 0 by default, so features were stored) — the gate
    # under test is the candidate-side use gate:
    t2 = VisualSort(
        1,
        base_opts().visual_minimal_own_area_percentage_use(0.9),
    )
    t2.predict(oset(obs(f1, 0.9, a, 1)))
    # candidate pair overlapping -> low own share -> visual unusable -> far
    # boxes become new tracks
    v = t2.predict(
        oset(
            obs(f1, 0.9, BoundingBox(300.0, 0.0, 10.0, 20.0), 1),
            obs(f2, 0.9, BoundingBox(301.0, 1.0, 10.0, 20.0), 2),
        )
    )
    assert all(tr.length == 1 for tr in v)


def test_own_area_collect_gate():
    """Features of occluded detections are not collected into the gallery."""
    t = VisualSort(
        1,
        base_opts().visual_minimal_own_area_percentage_collect(0.9),
    )
    f = [0.5] * 8
    # single isolated detection: own area share = 1.0 -> collected
    t.predict(oset(obs(f, 0.9, BoundingBox(0.0, 0.0, 10.0, 20.0), 1)))
    st = t._scenes[0].state
    slot = int(np.nonzero(np.asarray(st.active))[0][0])
    assert int(np.asarray(st.collected)[slot]) == 1

    # two overlapping detections: low shares -> feature NOT collected on merge
    v = t.predict(
        oset(
            obs(f, 0.9, BoundingBox(0.5, 0.5, 10.0, 20.0), 1),
            obs([-0.5] * 8, 0.9, BoundingBox(2.0, 2.0, 10.0, 20.0), 2),
        )
    )
    merged = [tr for tr in v if tr.custom_object_id == 1][0]
    assert merged.length == 2
    assert int(np.asarray(t._scenes[0].state.collected)[slot]) == 1  # unchanged


def test_predict_arrays_applies_host_own_area_on_device_engine():
    """Round-4 review finding: predict_arrays with own-area gating enabled,
    own_area_backend="host" and the DEVICE engine silently used neutral
    shares (gates disabled).  The two APIs must gate identically."""
    import numpy as np

    from similari_tpu import (
        PositionalMetricType, VisualSort, VisualSortMetricType,
        VisualSortObservation, VisualSortObservationSet, VisualSortOptions,
    )
    from similari_tpu.utils.bbox import Universal2DBox

    def boxes():
        # three heavily-overlapping boxes: the middle one is mostly covered,
        # so its own-area share fails the 0.6 use/collect gates
        return np.array([[50.0, 50.0, 0.0, 1.0, 40.0],
                         [58.0, 50.0, 0.0, 1.0, 40.0],
                         [120.0, 50.0, 0.0, 1.0, 40.0]], np.float32)

    def make(engine):
        opts = (VisualSortOptions()
                .visual_metric(VisualSortMetricType.euclidean(5.0))
                .positional_metric(PositionalMetricType.iou(0.3))
                .visual_minimal_track_length(1)
                .visual_minimal_own_area_percentage_use(0.6)
                .visual_minimal_own_area_percentage_collect(0.6)
                .own_area_backend("host"))
        return VisualSort(1, opts, engine=engine)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(3, 16)).astype(np.float32)

    def via_objects(tr):
        out = []
        for step in range(3):
            obs = VisualSortObservationSet()
            b = boxes()
            b[:, 0] += step
            for i in range(3):
                obs.add(VisualSortObservation(
                    feats[i], 0.9,
                    Universal2DBox.from_vec5(b[i], 0.9), i))
            out.append(sorted((t.id, t.voting_type.name)
                              for t in tr.predict_with_scene(0, obs)))
        return out

    def via_arrays(tr):
        out = []
        for step in range(3):
            b = boxes()
            b[:, 0] += step
            _, ids, _, _, _, vt = tr.predict_arrays(
                0, b, np.full((3,), 0.9, np.float32), feats,
                np.ones((3,), bool), np.full((3,), 0.9, np.float32))
            out.append(sorted(
                (int(i), "Visual" if v == 0 else "Positional")
                for i, v in zip(ids, vt)))
        return out

    want = via_objects(make("device"))
    got = via_arrays(make("device"))
    assert got == want, (got, want)
    got_host = via_arrays(make("host"))
    assert got_host == want, (got_host, want)
