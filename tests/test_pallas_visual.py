"""Pallas fused VisualSORT kernel: parity with the XLA visual_scan."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from similari_tpu.ops.pallas_visual import compiled_pallas_visual_scan
from similari_tpu.trackers.visual_state import new_visual_state
from similari_tpu.trackers.visual_step import VisualConfig, visual_scan


def make_visual_stream(seed, steps, d, f, density=300.0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, density, size=(d, 2)).astype(np.float32)
    ident = rng.normal(size=(d, f)).astype(np.float32)  # per-object identity
    box = np.zeros((steps, d, 5), np.float32)
    feat = np.zeros((steps, d, f), np.float32)
    valid = np.ones((steps, d), bool)
    fvalid = np.ones((steps, d), bool)
    qual = rng.uniform(0.3, 1.0, size=(steps, d)).astype(np.float32)
    for s in range(steps):
        xy += rng.uniform(-2, 2, size=xy.shape).astype(np.float32)
        box[s, :, 0] = xy[:, 0]
        box[s, :, 1] = xy[:, 1]
        box[s, :, 3] = 0.5
        box[s, :, 4] = 25.0
        feat[s] = ident + 0.05 * rng.normal(size=(d, f)).astype(np.float32)
    # exercise padding rows and missing features
    valid[steps // 2, d // 2:] = False
    fvalid[1, : d // 4] = False
    fvalid[steps - 2, d // 2:] = False
    return box, valid, feat, fvalid, qual


CONFIGS = [
    VisualConfig(
        positional_kind="iou", oriented=False, assignment="auction",
        visual_kind="euclidean", visual_threshold=5.0,
        visual_minimal_track_length=2, max_idle_epochs=5,
    ),
    VisualConfig(
        positional_kind="iou", oriented=False, assignment="auction",
        visual_kind="cosine", visual_threshold=0.7,
        visual_minimal_track_length=1, visual_min_votes=2,
        visual_minimal_quality_use=0.5, visual_minimal_quality_collect=0.4,
        max_idle_epochs=5,
    ),
    # Mahalanobis positional fallback (the flagship DeepSORT-like config)
    VisualConfig(
        positional_kind="maha", oriented=False, assignment="auction",
        visual_kind="euclidean", visual_threshold=5.0,
        visual_minimal_track_length=2, max_idle_epochs=5,
    ),
    # spatio-temporal constraints active in both stages
    VisualConfig(
        positional_kind="iou", oriented=False, assignment="auction",
        visual_kind="euclidean", visual_threshold=5.0,
        visual_minimal_track_length=2, max_idle_epochs=5,
        constraints=((1, 1.0), (5, 3.0)),
    ),
]


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("cfg_ix", [0, 1, 2, 3])
def test_pallas_visual_scan_matches_xla(seed, cfg_ix):
    cfg = CONFIGS[cfg_ix]
    steps, d, t, k, f = 8, 8, 32, 3, 16
    box, valid, feat, fvalid, qual = make_visual_stream(seed, steps, d, f)
    conf = jnp.ones((steps, d), jnp.float32)
    oa = jnp.ones((steps, d), jnp.float32)
    bj, vj = jnp.asarray(box), jnp.asarray(valid)
    fj, flj, qj = jnp.asarray(feat), jnp.asarray(fvalid), jnp.asarray(qual)

    state_a = new_visual_state(t, 1, k, f)
    state_a, outs_a = visual_scan(
        cfg, state_a, bj, conf, vj, fj, flj, qj, oa, jnp.int32(1)
    )

    run = compiled_pallas_visual_scan(cfg, chunk=4, interpret=True)
    state_b = new_visual_state(t, 1, k, f)
    state_b, (ids, slots, pred, vt, newf, length, ovf) = run(
        state_b, bj, conf, vj, fj, flj, qj, oa, jnp.int32(1)
    )
    assert not np.asarray(ovf).any()

    mask = np.asarray(valid)
    np.testing.assert_array_equal(
        np.where(mask, np.asarray(ids), 0),
        np.where(mask, np.asarray(outs_a.track_id), 0),
    )
    np.testing.assert_array_equal(
        np.where(mask, np.asarray(vt), -1),
        np.where(mask, np.asarray(outs_a.voting_type), -1),
    )
    np.testing.assert_array_equal(
        np.where(mask, np.asarray(newf) > 0, False),
        np.where(mask, np.asarray(outs_a.is_new), False),
    )
    np.testing.assert_allclose(
        np.where(mask[..., None], np.asarray(pred), 0),
        np.where(mask[..., None], np.asarray(outs_a.pred_box), 0),
        rtol=2e-4, atol=1e-4,
    )
    # final state parity
    np.testing.assert_array_equal(
        np.asarray(state_b.active), np.asarray(state_a.active)
    )
    np.testing.assert_array_equal(
        np.asarray(state_b.track_id), np.asarray(state_a.track_id)
    )
    np.testing.assert_array_equal(
        np.asarray(state_b.collected), np.asarray(state_a.collected)
    )
    np.testing.assert_array_equal(
        np.asarray(state_b.feat_valid), np.asarray(state_a.feat_valid)
    )
    np.testing.assert_allclose(
        np.asarray(state_b.pred_box), np.asarray(state_a.pred_box),
        rtol=2e-4, atol=1e-4,
    )
    # gallery contents: compare only live lanes (dead lanes keep stale data)
    live = np.asarray(state_a.feat_valid)
    np.testing.assert_allclose(
        np.where(live[..., None], np.asarray(state_b.feats), 0),
        np.where(live[..., None], np.asarray(state_a.feats), 0),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.where(live, np.asarray(state_b.feat_quality), 0),
        np.where(live, np.asarray(state_a.feat_quality), 0),
        rtol=1e-6, atol=1e-6,
    )
    assert int(state_b.next_id) >= int(jnp.max(state_b.track_id))


@pytest.mark.parametrize("recycle", [False, True])
def test_pallas_visual_overflow_parity(recycle):
    """Overflow regime (capacity < cumulative tracks): the kernel must match
    the XLA step exactly — drop the overflowing frame's writes, keep
    advancing next_id — instead of summing one-hot rows into slot t-1
    (round-2 advisor finding)."""
    cfg = VisualConfig(
        positional_kind="iou", oriented=False, assignment="auction",
        visual_kind="euclidean", visual_threshold=5.0,
        visual_minimal_track_length=2, max_idle_epochs=2,
        recycle_idle=recycle,
    )
    steps, d, t, k, f = 8, 8, 8, 3, 16
    # far-apart fresh objects every frame => a new track per detection per
    # frame, so capacity t=8 overflows on frame 2 (or recycles if enabled)
    rng = np.random.default_rng(7)
    box = np.zeros((steps, d, 5), np.float32)
    for s in range(steps):
        box[s, :, 0] = rng.uniform(0, 1e5, d)
        box[s, :, 1] = rng.uniform(0, 1e5, d)
        box[s, :, 3] = 0.5
        box[s, :, 4] = 25.0
    feat = rng.normal(size=(steps, d, f)).astype(np.float32)
    conf = jnp.ones((steps, d), jnp.float32)
    truv = jnp.ones((steps, d), bool)
    oa = jnp.ones((steps, d), jnp.float32)
    bj, fj = jnp.asarray(box), jnp.asarray(feat)

    state_a = new_visual_state(t, 1, k, f)
    state_a, outs_a = visual_scan(
        cfg, state_a, bj, conf, truv, fj, truv, conf, oa, jnp.int32(1)
    )
    run = compiled_pallas_visual_scan(cfg, chunk=4, interpret=True)
    state_b = new_visual_state(t, 1, k, f)
    state_b, (ids, slots, pred, vt, newf, length, ovf) = run(
        state_b, bj, conf, truv, fj, truv, conf, oa, jnp.int32(1)
    )

    np.testing.assert_array_equal(np.asarray(ovf), np.asarray(outs_a.overflow))
    flags = np.asarray(ovf)
    if recycle:
        # slots recycle once idle > max_idle (delta 3): frames 0, 3, 6 write
        assert not flags[0] and not flags[3] and not flags[6]
        assert flags[1] and flags[2]
    else:
        # active is monotone without recycling: every later frame overflows
        assert not flags[0]
        assert flags[1:].all()
    np.testing.assert_array_equal(
        np.asarray(state_b.active), np.asarray(state_a.active))
    np.testing.assert_array_equal(
        np.asarray(state_b.track_id), np.asarray(state_a.track_id))
    np.testing.assert_array_equal(
        np.asarray(state_b.length), np.asarray(state_a.length))
    assert int(state_b.next_id) == int(state_a.next_id)
    np.testing.assert_allclose(
        np.asarray(state_b.obs_box), np.asarray(state_a.obs_box),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(outs_a.track_id))


@pytest.mark.parametrize("recycle", [False, True])
def test_pallas_visual_zero_padded_rows(recycle):
    """Regression: padded detection rows carry ALL-ZERO boxes in the real
    eval pipeline; a zero height made the in-kernel KF update divide 0/0 and
    the NaN poisoned every slot through the one-hot scatter matmuls."""
    cfg = VisualConfig(
        positional_kind="iou", oriented=False, assignment="auction",
        visual_kind="cosine", visual_threshold=0.5,
        visual_minimal_track_length=1, max_idle_epochs=10,
        feature_precision="bf16", recycle_idle=recycle,
    )
    steps, d, t, k, f = 12, 16, 64, 3, 16
    rng = np.random.default_rng(11)
    xy = rng.uniform(0, 400, (d, 2)).astype(np.float32)
    box = np.zeros((steps, d, 5), np.float32)
    feat = np.zeros((steps, d, f), np.float32)
    valid = np.zeros((steps, d), bool)
    conf = np.zeros((steps, d), np.float32)
    for s in range(steps):
        xy += rng.uniform(-2, 2, xy.shape).astype(np.float32)
        n = int(rng.integers(1, d))  # varying count; rest stays ALL-ZERO
        box[s, :n, 0] = xy[:n, 0]
        box[s, :n, 1] = xy[:n, 1]
        box[s, :n, 3] = 0.9
        box[s, :n, 4] = 30.0
        conf[s, :n] = rng.uniform(0.4, 1.0, n)
        valid[s, :n] = True
        feat[s, :n] = rng.normal(size=(n, f)).astype(np.float32)
    fvalid = valid.copy()
    qual = np.ones((steps, d), np.float32)
    oa = np.ones((steps, d), np.float32)
    bj, fj = jnp.asarray(box), jnp.asarray(feat)
    cj, vj = jnp.asarray(conf), jnp.asarray(valid)

    sa = new_visual_state(t, 1, k, f)
    sa, outs = visual_scan(cfg, sa, bj, cj, vj, fj, jnp.asarray(fvalid),
                           jnp.asarray(qual), jnp.asarray(oa), jnp.int32(1))
    run = compiled_pallas_visual_scan(cfg, chunk=4, interpret=True)
    sb = new_visual_state(t, 1, k, f)
    sb, (ids, *_r) = run(sb, bj, cj, vj, fj, jnp.asarray(fvalid),
                         jnp.asarray(qual), jnp.asarray(oa), jnp.int32(1))
    assert np.isfinite(np.asarray(sb.pred_box)).all()
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(ids), 0),
        np.where(valid, np.asarray(outs.track_id), 0))
    np.testing.assert_array_equal(
        np.asarray(sb.active), np.asarray(sa.active))
