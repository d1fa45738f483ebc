"""Host (NumPy) interactive engine vs the jitted device step: same semantics.

The host engine (`trackers/host_sort.py`) re-implements the step formulas in
NumPy with the exact component-decomposed JV assignment; ids, slots, lengths
and predicted boxes must match the device engine on identical streams.
"""

import numpy as np
import pytest

from similari_tpu.trackers import PositionalMetricType, Sort
from similari_tpu.trackers.constraints import SpatioTemporalConstraints


def _stream(seed, steps, n, spread=2000.0, churn=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, spread, (n, 2)).astype(np.float32)
    wh = rng.uniform(30, 60, (n, 2)).astype(np.float32)
    frames = []
    for s in range(steps):
        xy += rng.uniform(-2, 2, xy.shape).astype(np.float32)
        if churn and s and s % churn == 0:
            # replace a third of the objects with fresh far-away ones
            k = n // 3
            idx = rng.choice(n, k, replace=False)
            xy[idx] = rng.uniform(0, spread, (k, 2)).astype(np.float32)
        boxes = np.zeros((n, 5), np.float32)
        boxes[:, :2] = xy
        boxes[:, 3] = wh[:, 0] / wh[:, 1]
        boxes[:, 4] = wh[:, 1]
        conf = rng.uniform(0.5, 1.0, (n,)).astype(np.float32)
        frames.append((boxes.copy(), conf))
    return frames


def _run(engine, method, frames, constraints=None, **kw):
    tracker = Sort(
        shards=1, bbox_history=2, max_idle_epochs=5, method=method,
        spatio_temporal_constraints=constraints, engine=engine, **kw
    )
    out = []
    for boxes, conf in frames:
        epoch, ids, pred, length, slot = tracker.predict_arrays(
            0, boxes, conf)
        out.append((ids.copy(), pred.copy(), length.copy(), slot.copy()))
    return tracker, out


@pytest.mark.parametrize("method_kind", ["iou", "maha"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_host_matches_device(method_kind, seed):
    method = (PositionalMetricType.iou(0.3) if method_kind == "iou"
              else PositionalMetricType.maha())
    frames = _stream(seed, steps=12, n=24, churn=4)
    _, host = _run("host", method, frames)
    _, dev = _run("device", method, frames)
    for s, ((hi, hp, hl, hs), (di, dp, dl, ds)) in enumerate(zip(host, dev)):
        np.testing.assert_array_equal(hi, di, err_msg=f"ids frame {s}")
        np.testing.assert_array_equal(hl, dl, err_msg=f"lengths frame {s}")
        np.testing.assert_array_equal(hs, ds, err_msg=f"slots frame {s}")
        np.testing.assert_allclose(hp, dp, rtol=2e-4, atol=1e-3,
                                   err_msg=f"pred frame {s}")


def test_host_matches_device_with_constraints():
    stc = SpatioTemporalConstraints()
    stc.add_constraints([(1, 1.0), (3, 2.0)])
    frames = _stream(3, steps=10, n=16, churn=3)
    method = PositionalMetricType.iou(0.3)
    _, host = _run("host", method, frames, constraints=stc)
    _, dev = _run("device", method, frames, constraints=stc)
    for (hi, hp, hl, hs), (di, dp, dl, ds) in zip(host, dev):
        np.testing.assert_array_equal(hi, di)


def test_host_grows_capacity():
    frames = _stream(5, steps=4, n=200)
    method = PositionalMetricType.iou(0.3)
    tracker, out = _run("host", method, frames, initial_capacity=16)
    ids0 = out[0][0]
    ids3 = out[3][0]
    np.testing.assert_array_equal(ids0, ids3)  # stable ids through growth
    assert len(np.unique(ids0)) == 200


def test_host_waste_and_idle_api():
    """wasted()/idle_tracks must work off the numpy-leaf state."""
    method = PositionalMetricType.iou(0.3)
    tracker = Sort(shards=1, bbox_history=3, max_idle_epochs=2,
                   method=method, engine="host")
    frames = _stream(7, steps=3, n=6)
    for boxes, conf in frames:
        tracker.predict_arrays(0, boxes, conf)
    assert tracker.shard_stats() == [6]
    idle = tracker.idle_tracks()
    assert idle == []  # all updated at current epoch
    # advance epochs far past max_idle: all tracks waste
    tracker.skip_epochs(5)
    wasted = tracker.wasted()
    assert len(wasted) == 6
    for w in wasted:
        assert w.length == 3
        assert len(w.observed_boxes) == 3
    assert tracker.shard_stats() == [0]


def test_auto_engine_stays_host_on_oriented():
    """Round 4: the host engine covers oriented boxes (f32 clip), so a
    rotated box no longer kicks the scene to the per-call device step."""
    method = PositionalMetricType.iou(0.3)
    tracker = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
                   method=method, engine="auto")
    boxes = np.array([[10.0, 10.0, 0.0, 1.0, 5.0],
                      [40.0, 40.0, 0.0, 1.0, 5.0]], np.float32)
    conf = np.ones((2,), np.float32)
    tracker.predict_arrays(0, boxes, conf)
    assert tracker._scenes[0].host
    boxes[0, 2] = 0.4  # rotated box appears -> host engine keeps the scene
    _, ids, _, _, _ = tracker.predict_arrays(0, boxes, conf)
    assert tracker._scenes[0].host
    assert tracker._scenes[0].oriented
    assert len(ids) == 2
    # and the rotated box still matches its own track (same clip semantics)
    _, ids2, _, _, _ = tracker.predict_arrays(0, boxes, conf)
    np.testing.assert_array_equal(ids2, ids)


def _oriented_stream(seed, steps, n, spread=800.0, churn=0):
    rng = np.random.default_rng(seed)
    frames = _stream(seed, steps, n, spread=spread, churn=churn)
    out = []
    for boxes, conf in frames:
        boxes = boxes.copy()
        boxes[:, 2] = rng.uniform(0.0, 1.2, (n,)).astype(np.float32)
        out.append((boxes, conf))
    return out


@pytest.mark.parametrize("method_kind", ["iou", "maha"])
@pytest.mark.parametrize("seed", [0, 2])
def test_host_matches_device_oriented(method_kind, seed):
    method = (PositionalMetricType.iou(0.3) if method_kind == "iou"
              else PositionalMetricType.maha())
    frames = _oriented_stream(seed, steps=10, n=20, churn=4)
    _, host = _run("host", method, frames)
    _, dev = _run("device", method, frames)
    for s, ((hi, hp, hl, hs), (di, dp, dl, ds)) in enumerate(zip(host, dev)):
        np.testing.assert_array_equal(hi, di, err_msg=f"ids frame {s}")
        np.testing.assert_array_equal(hl, dl, err_msg=f"lengths frame {s}")
        np.testing.assert_array_equal(hs, ds, err_msg=f"slots frame {s}")
        np.testing.assert_allclose(hp, dp, rtol=2e-4, atol=1e-3,
                                   err_msg=f"pred frame {s}")


def test_host_matches_device_fuzzed_oriented_configs():
    """Oriented config fuzz (round-4 VERDICT item 1): id-exact parity across
    random thresholds/idle/churn with rotated boxes on every frame."""
    rng = np.random.default_rng(321)
    for trial in range(6):
        kind = "iou" if trial % 2 == 0 else "maha"
        method = (PositionalMetricType.iou(float(rng.uniform(0.1, 0.5)))
                  if kind == "iou" else PositionalMetricType.maha())
        stc = None
        if trial % 3 == 0:
            stc = SpatioTemporalConstraints()
            stc.add_constraints([(1, float(rng.uniform(0.5, 2.0)))])
        frames = _oriented_stream(2000 + trial, steps=8,
                                  n=int(rng.integers(5, 32)),
                                  churn=int(rng.integers(0, 4)))
        kw = dict(constraints=stc, initial_capacity=int(rng.choice([8, 64])))
        _, host = _run("host", method, frames, **kw)
        _, dev = _run("device", method, frames, **kw)
        for s, ((hi, *_a), (di, *_b)) in enumerate(zip(host, dev)):
            np.testing.assert_array_equal(
                hi, di, err_msg=f"trial {trial} frame {s}")


def test_host_matches_device_fuzzed_configs():
    """Config fuzz: random thresholds/idle/churn must stay id-exact between
    the host (native C++/NumPy) and device engines."""
    rng = np.random.default_rng(123)
    for trial in range(8):
        kind = "iou" if trial % 2 == 0 else "maha"
        method = (PositionalMetricType.iou(float(rng.uniform(0.1, 0.6)))
                  if kind == "iou" else PositionalMetricType.maha())
        stc = None
        if trial % 3 == 0:
            stc = SpatioTemporalConstraints()
            stc.add_constraints([(1, float(rng.uniform(0.5, 2.0)))])
        frames = _stream(1000 + trial, steps=8,
                         n=int(rng.integers(5, 40)),
                         churn=int(rng.integers(0, 4)))
        kw = dict(constraints=stc, initial_capacity=int(rng.choice([8, 64])))
        _, host = _run("host", method, frames, **kw)
        _, dev = _run("device", method, frames, **kw)
        for s, ((hi, *_a), (di, *_b)) in enumerate(zip(host, dev)):
            np.testing.assert_array_equal(
                hi, di, err_msg=f"trial {trial} frame {s}")
