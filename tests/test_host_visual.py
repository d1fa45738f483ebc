"""Host (NumPy) VisualSORT engine vs the jitted step: identical semantics."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from similari_tpu.trackers import host_sort, host_visual
from similari_tpu.trackers.visual_state import new_visual_state
from similari_tpu.trackers.visual_step import VisualConfig, visual_step

CONFIGS = [
    VisualConfig(
        positional_kind="iou", oriented=False, assignment="hungarian",
        visual_kind="euclidean", visual_threshold=5.0,
        visual_minimal_track_length=2, max_idle_epochs=5,
    ),
    VisualConfig(
        positional_kind="maha", oriented=False, assignment="hungarian",
        visual_kind="cosine", visual_threshold=0.6,
        visual_minimal_track_length=1, visual_min_votes=2,
        visual_minimal_quality_use=0.4, visual_minimal_quality_collect=0.5,
        max_idle_epochs=4,
    ),
    VisualConfig(
        positional_kind="iou", oriented=False, assignment="hungarian",
        visual_kind="euclidean", visual_threshold=4.0,
        visual_minimal_track_length=2, max_idle_epochs=5,
        constraints=((1, 1.5), (4, 3.0)),
    ),
]


def stream(seed, steps, d, f, drop=0.2):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 350, (d, 2)).astype(np.float32)
    ident = rng.normal(size=(d, f)).astype(np.float32)
    frames = []
    for s in range(steps):
        xy += rng.uniform(-2, 2, xy.shape).astype(np.float32)
        keep = rng.uniform(size=d) >= (drop if s else 0.0)
        n = max(int(keep.sum()), 1)
        idx = np.flatnonzero(keep)[:n]
        box = np.zeros((n, 5), np.float32)
        box[:, 0] = xy[idx, 0]
        box[:, 1] = xy[idx, 1]
        box[:, 3] = 0.8
        box[:, 4] = 28.0
        feat = (ident[idx] + 0.04 * rng.normal(size=(n, f))).astype(np.float32)
        fvalid = rng.uniform(size=n) > 0.15
        conf = rng.uniform(0.5, 1.0, n).astype(np.float32)
        qual = rng.uniform(0.3, 1.0, n).astype(np.float32)
        frames.append((box, conf, feat, fvalid, qual))
    return frames


@pytest.mark.parametrize("cfg_ix", [0, 1, 2])
@pytest.mark.parametrize("seed", [0, 1])
def test_host_visual_matches_device_step(cfg_ix, seed):
    cfg = CONFIGS[cfg_ix]
    d0, f, t, k = 10, 24, 48, 3
    frames = stream(seed, steps=10, d=d0, f=f)

    sx = new_visual_state(t, 2, k, f)
    sh = host_sort.state_to_host(new_visual_state(t, 2, k, f))
    for e, (box, conf, feat, fvalid, qual) in enumerate(frames, start=1):
        n = len(box)
        oa = np.ones((n,), np.float32)
        sx, ox = visual_step(
            cfg, sx, jnp.asarray(box), jnp.asarray(conf),
            jnp.ones((n,), bool), jnp.asarray(feat), jnp.asarray(fvalid),
            jnp.asarray(qual), jnp.asarray(oa), jnp.int32(e))
        sh, oh = host_visual.host_visual_step(
            cfg, sh, box, conf, feat, fvalid, qual, oa, e)
        np.testing.assert_array_equal(
            oh["track_id"], np.asarray(ox.track_id), err_msg=f"epoch {e}")
        np.testing.assert_array_equal(
            oh["voting_type"], np.asarray(ox.voting_type),
            err_msg=f"epoch {e}")
        np.testing.assert_array_equal(oh["slot"], np.asarray(ox.slot))
        np.testing.assert_allclose(
            oh["pred_box"], np.asarray(ox.pred_box), rtol=2e-4, atol=1e-3)
    # end-state parity
    np.testing.assert_array_equal(sh.active, np.asarray(sx.active))
    np.testing.assert_array_equal(sh.track_id, np.asarray(sx.track_id))
    np.testing.assert_array_equal(sh.collected, np.asarray(sx.collected))
    np.testing.assert_array_equal(sh.feat_valid, np.asarray(sx.feat_valid))
    live = np.asarray(sx.feat_valid)
    np.testing.assert_allclose(
        np.where(live[..., None], sh.feats, 0),
        np.where(live[..., None], np.asarray(sx.feats), 0),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        sh.pred_box, np.asarray(sx.pred_box), rtol=2e-4, atol=1e-3)
    assert int(sh.next_id) == int(sx.next_id)


ORIENTED_CFG = VisualConfig(
    positional_kind="iou", oriented=True, assignment="hungarian",
    visual_kind="euclidean", visual_threshold=5.0,
    visual_minimal_track_length=2, max_idle_epochs=5,
)


@pytest.mark.parametrize("d0", [10, 140])  # <=128 native, >128 NumPy path
@pytest.mark.parametrize("seed", [0, 1])
def test_host_visual_matches_device_step_oriented(d0, seed):
    """Round-4 VERDICT item 1 (visual twin): oriented boxes through the host
    cascade must be id-exact with the jitted step's rotated clip."""
    cfg = ORIENTED_CFG
    f, t, k = 16, 512, 3
    rng = np.random.default_rng(seed + 77)
    base_angle = rng.uniform(0.0, 1.2, (d0,)).astype(np.float32)
    frames = []
    for box, conf, feat, fvalid, qual in stream(seed, steps=8, d=d0, f=f,
                                                drop=0.0):
        box = box.copy()
        n = len(box)
        # stable per-object angle + small drift: tracks stay matchable, so
        # the test exercises rotated matching, not just track creation
        box[:, 2] = base_angle[:n] + rng.uniform(
            -0.05, 0.05, (n,)).astype(np.float32)
        frames.append((box, conf, feat, fvalid, qual))

    sx = new_visual_state(t, 2, k, f)
    sh = host_sort.state_to_host(new_visual_state(t, 2, k, f))
    for e, (box, conf, feat, fvalid, qual) in enumerate(frames, start=1):
        n = len(box)
        oa = np.ones((n,), np.float32)
        sx, ox = visual_step(
            cfg, sx, jnp.asarray(box), jnp.asarray(conf),
            jnp.ones((n,), bool), jnp.asarray(feat), jnp.asarray(fvalid),
            jnp.asarray(qual), jnp.asarray(oa), jnp.int32(e))
        sh, oh = host_visual.host_visual_step(
            cfg, sh, box, conf, feat, fvalid, qual, oa, e)
        np.testing.assert_array_equal(
            oh["track_id"], np.asarray(ox.track_id), err_msg=f"epoch {e}")
        np.testing.assert_array_equal(
            oh["voting_type"], np.asarray(ox.voting_type),
            err_msg=f"epoch {e}")
        np.testing.assert_array_equal(oh["slot"], np.asarray(ox.slot))
    np.testing.assert_array_equal(sh.active, np.asarray(sx.active))
    np.testing.assert_array_equal(sh.track_id, np.asarray(sx.track_id))
    assert int(sh.next_id) == int(sx.next_id)


def test_visualsort_frame_size_crosses_native_threshold():
    """Regression (round-3 self-review): a frame above the native threshold
    (NumPy fallback) followed by one below it (native session) crashed on
    next_id item assignment when the fallback replaced the 0-d next_id
    array with a scalar.  The threshold moved 32 -> 128 in round 4 (SIMD
    dot), so the big frame is 140 now."""
    from similari_tpu import (
        BoundingBox, PositionalMetricType, VisualSort, VisualSortMetricType,
        VisualSortObservation, VisualSortObservationSet, VisualSortOptions,
    )

    rng = np.random.default_rng(0)
    idents = rng.normal(size=(140, 8)).astype(np.float32) * 10.0

    def make():
        opts = VisualSortOptions()
        opts.visual_metric(VisualSortMetricType.euclidean(5.0))
        opts.positional_metric(PositionalMetricType.iou(0.3))
        opts.visual_minimal_track_length(2)
        opts.max_idle_epochs(10)  # tracks 11-140 idle while small frames run
        return VisualSort(1, opts)

    def frame(n, step):
        obs = VisualSortObservationSet()
        for i in range(n):
            obs.add(VisualSortObservation(
                feature=idents[i] + 0.05 * rng.normal(size=8
                                                      ).astype(np.float32),
                feature_quality=0.9,
                bounding_box=BoundingBox(
                    80.0 * i + step, 40.0, 16.0, 32.0).as_xyaah(),
                custom_object_id=i))
        return obs

    tr = make()
    big = tr.predict(frame(140, 0))     # > 128: NumPy path
    small = tr.predict(frame(10, 2))    # <= 128: native session path
    assert [t.id for t in small] == [t.id for t in big][:10]
    small2 = tr.predict(frame(10, 4))   # session reused — must not crash
    assert [t.id for t in small2] == [t.id for t in small]
    big2 = tr.predict(frame(140, 6))    # back above the threshold
    assert [t.id for t in big2] == [t.id for t in big]


def test_sort_predict_arrays_results_stable_across_calls():
    """Regression (round-3 self-review): session output buffers were reused,
    so results of call N were overwritten by call N+1."""
    from similari_tpu.trackers import PositionalMetricType, Sort

    tr = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
              method=PositionalMetricType.iou(0.3))
    b1 = np.array([[10.0, 10, 0, 1, 20], [80.0, 10, 0, 1, 20]], np.float32)
    b2 = b1 + np.array([2.0, 0, 0, 0, 0], np.float32)
    conf = np.ones((2,), np.float32)
    _, ids1, pred1, len1, slot1 = tr.predict_arrays(0, b1, conf)
    ids1_snapshot = ids1.copy()
    pred1_snapshot = pred1.copy()
    tr.predict_arrays(0, b2, conf)
    np.testing.assert_array_equal(ids1, ids1_snapshot)
    np.testing.assert_array_equal(pred1, pred1_snapshot)


def test_engine_host_with_oriented_matches_device():
    """Regression (round-3 self-review, upgraded in round 4): engine="host"
    with rotated boxes must apply the true rotated IoU — since round 4 via
    the host f32 clip (host_geometry.py), id-exact with the device kernel —
    never silently ignore the angles."""
    from similari_tpu.trackers import PositionalMetricType, Sort

    def run(engine):
        tr = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
                  method=PositionalMetricType.iou(0.3), engine=engine)
        out = []
        # thin rotated boxes: ids depend on the true rotated IoU
        b = np.array([[50.0, 50, 0.8, 4.0, 10],
                      [58.0, 50, 0.8, 4.0, 10]], np.float32)
        conf = np.ones((2,), np.float32)
        for f in range(3):
            bb = b.copy()
            bb[:, 0] += f
            _, ids, _, _, _ = tr.predict_arrays(0, bb, conf)
            out.append(ids.copy())
        return out

    host = run("host")
    dev = run("device")
    for a, b_ in zip(host, dev):
        np.testing.assert_array_equal(a, b_)
