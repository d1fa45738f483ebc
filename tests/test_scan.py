"""The device-resident scan pipeline must match sequential stepping exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from similari_tpu.trackers.sort_step import (
    SortConfig,
    sort_scan,
    sort_step,
)
from similari_tpu.trackers.state import new_sort_state


def test_scan_matches_sequential():
    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5)
    rng = np.random.default_rng(0)
    steps, d, t = 6, 8, 32
    stream = np.zeros((steps, d, 5), np.float32)
    xy = rng.uniform(0, 300, size=(d, 2))
    for s in range(steps):
        xy += rng.uniform(-1, 1, size=xy.shape)
        stream[s, :, 0] = xy[:, 0]
        stream[s, :, 1] = xy[:, 1]
        stream[s, :, 3] = 0.5
        stream[s, :, 4] = 20.0
    conf = jnp.ones((steps, d), jnp.float32)
    valid = jnp.ones((steps, d), bool)

    state_a = new_sort_state(t, 4)
    ids_seq = []
    for s in range(steps):
        state_a, out = sort_step(
            cfg, state_a, jnp.asarray(stream[s]), conf[s], valid[s], jnp.int32(s + 1)
        )
        ids_seq.append(np.asarray(out.track_id))

    state_b = new_sort_state(t, 4)
    state_b, outs = sort_scan(
        cfg, state_b, jnp.asarray(stream), conf, valid, jnp.int32(1)
    )
    np.testing.assert_array_equal(np.asarray(outs.track_id), np.stack(ids_seq))
    np.testing.assert_allclose(
        np.asarray(state_b.pred_box), np.asarray(state_a.pred_box), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(state_b.length), np.asarray(state_a.length)
    )


def _churny_stream(n_cohorts=8, cohort_len=6, d=4, seed=3):
    """Detection stream where objects live `cohort_len` frames then get
    replaced by fresh far-away objects: live tracks <= d at all times, but
    cumulative tracks = n_cohorts * d."""
    rng = np.random.default_rng(seed)
    steps = n_cohorts * cohort_len
    stream = np.zeros((steps, d, 5), np.float32)
    for c in range(n_cohorts):
        xy = rng.uniform(0, 200, size=(d, 2)) + c * 10_000.0
        for s in range(c * cohort_len, (c + 1) * cohort_len):
            xy += rng.uniform(-1, 1, size=xy.shape)
            stream[s, :, 0] = xy[:, 0]
            stream[s, :, 1] = xy[:, 1]
            stream[s, :, 3] = 0.5
            stream[s, :, 4] = 20.0
    return stream


def test_recycle_idle_bounds_live_tracks():
    """Round-2 verdict Weak#3: inside a scan `active` was monotone, so a long
    churny stream silently dropped tracks once cumulative creations passed
    capacity.  With recycle_idle the capacity bounds *live* tracks."""
    d, t = 4, 8  # 8 slots << 32 cumulative tracks
    stream = _churny_stream(n_cohorts=8, cohort_len=6, d=d)
    steps = len(stream)
    conf = jnp.ones((steps, d), jnp.float32)
    valid = jnp.ones((steps, d), bool)
    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=2,
                     oriented=False, recycle_idle=True)
    state = new_sort_state(t, 1)
    state, outs = sort_scan(
        cfg, state, jnp.asarray(stream), conf, valid, jnp.int32(1))
    assert not np.asarray(outs.overflow).any()
    ids = np.asarray(outs.track_id)
    # every cohort keeps stable ids for its whole lifetime (no silent drops)
    for c in range(8):
        blk = ids[c * 6:(c + 1) * 6]
        np.testing.assert_array_equal(blk, np.broadcast_to(blk[0], blk.shape))
    # all 32 cumulative tracks got distinct ids through 8 slots
    assert len(np.unique(ids)) == 32

    # without recycling the same stream overflows (loud, not silent)
    cfg2 = SortConfig(method="iou", assignment="auction", max_idle_epochs=2,
                      oriented=False, recycle_idle=False)
    state2 = new_sort_state(t, 1)
    _, outs2 = sort_scan(
        cfg2, state2, jnp.asarray(stream), conf, valid, jnp.int32(1))
    assert np.asarray(outs2.overflow).any()


def test_recycle_idle_no_effect_when_capacity_ample():
    """recycle_idle must not change outputs when capacity never runs out."""
    d, t = 4, 256
    stream = _churny_stream(n_cohorts=4, cohort_len=6, d=d)
    steps = len(stream)
    conf = jnp.ones((steps, d), jnp.float32)
    valid = jnp.ones((steps, d), bool)
    outs = {}
    for rec in (False, True):
        cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=2,
                         oriented=False, recycle_idle=rec)
        st = new_sort_state(t, 1)
        _, o = sort_scan(cfg, st, jnp.asarray(stream), conf, valid,
                         jnp.int32(1))
        outs[rec] = o
    np.testing.assert_array_equal(
        np.asarray(outs[True].track_id), np.asarray(outs[False].track_id))
    np.testing.assert_allclose(
        np.asarray(outs[True].pred_box), np.asarray(outs[False].pred_box),
        rtol=1e-6)
