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
