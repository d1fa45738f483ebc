"""Pallas tracker-on-chip kernel: parity with the XLA sort_scan (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from similari_tpu.ops.pallas_sort import compiled_pallas_sort_scan
from similari_tpu.trackers.sort_step import SortConfig, sort_scan
from similari_tpu.trackers.state import new_sort_state


def make_stream(seed, steps, d, density=300.0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, density, size=(d, 2)).astype(np.float32)
    box = np.zeros((steps, d, 5), np.float32)
    valid = np.ones((steps, d), bool)
    for s in range(steps):
        xy += rng.uniform(-2, 2, size=xy.shape).astype(np.float32)
        box[s, :, 0] = xy[:, 0]
        box[s, :, 1] = xy[:, 1]
        box[s, :, 3] = 0.5
        box[s, :, 4] = 25.0
    # drop some detections to exercise padding rows
    valid[steps // 2, d // 2 :] = False
    return box, valid


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_scan_matches_xla(seed):
    cfg = SortConfig(
        method="iou", assignment="auction", max_idle_epochs=5, oriented=False
    )
    steps, d, t = 8, 8, 32
    box, valid = make_stream(seed, steps, d)
    conf = jnp.ones((steps, d), jnp.float32)
    bj, vj = jnp.asarray(box), jnp.asarray(valid)

    state_a = new_sort_state(t, 1)
    state_a, outs_a = sort_scan(cfg, state_a, bj, conf, vj, jnp.int32(1))

    run = compiled_pallas_sort_scan(cfg, chunk=4, interpret=True)
    state_b = new_sort_state(t, 1)
    state_b, (ids, slots, pred, ovf) = run(state_b, bj, conf, vj, jnp.int32(1))

    mask = np.asarray(valid)
    np.testing.assert_array_equal(
        np.where(mask, np.asarray(ids), 0),
        np.where(mask, np.asarray(outs_a.track_id), 0),
    )
    np.testing.assert_allclose(
        np.where(mask[..., None], np.asarray(pred), 0),
        np.where(mask[..., None], np.asarray(outs_a.pred_box), 0),
        rtol=2e-4, atol=1e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(state_b.active), np.asarray(state_a.active)
    )
    np.testing.assert_array_equal(
        np.asarray(state_b.track_id), np.asarray(state_a.track_id)
    )
    np.testing.assert_allclose(
        np.asarray(state_b.pred_box), np.asarray(state_a.pred_box),
        rtol=2e-4, atol=1e-4,
    )
    assert int(state_b.next_id) >= int(jnp.max(state_b.track_id))


@pytest.mark.parametrize("recycle", [False, True])
def test_pallas_sort_overflow_and_zero_padding(recycle):
    """Overflow regime + all-zero padded rows: the kernel must match the XLA
    step (drop overflowing frames' writes, keep next_id advancing) and must
    not NaN-poison state through the one-hot scatters (0 * NaN)."""
    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=2,
                     oriented=False, recycle_idle=recycle)
    steps, d, t = 8, 8, 8
    rng = np.random.default_rng(3)
    box = np.zeros((steps, d, 5), np.float32)
    valid = np.zeros((steps, d), bool)
    for s in range(steps):
        n = int(rng.integers(3, d))  # trailing rows stay ALL-ZERO
        box[s, :n, 0] = rng.uniform(0, 1e5, n)
        box[s, :n, 1] = rng.uniform(0, 1e5, n)
        box[s, :n, 3] = 0.5
        box[s, :n, 4] = 25.0
        valid[s, :n] = True
    conf = jnp.ones((steps, d), jnp.float32)
    bj, vj = jnp.asarray(box), jnp.asarray(valid)

    state_a = new_sort_state(t, 1)
    state_a, outs_a = sort_scan(cfg, state_a, bj, conf, vj, jnp.int32(1))
    run = compiled_pallas_sort_scan(cfg, chunk=4, interpret=True)
    state_b = new_sort_state(t, 1)
    state_b, (ids, slots, pred, ovf) = run(state_b, bj, conf, vj, jnp.int32(1))

    assert np.isfinite(np.asarray(state_b.pred_box)).all()
    assert np.asarray(outs_a.overflow).any()  # the regime is exercised
    np.testing.assert_array_equal(
        np.where(valid, np.asarray(ids), 0),
        np.where(valid, np.asarray(outs_a.track_id), 0))
    np.testing.assert_array_equal(
        np.asarray(state_b.active), np.asarray(state_a.active))
    np.testing.assert_array_equal(
        np.asarray(state_b.track_id), np.asarray(state_a.track_id))
    np.testing.assert_array_equal(
        np.asarray(state_b.length), np.asarray(state_a.length))
    assert int(state_b.next_id) == int(state_a.next_id)
