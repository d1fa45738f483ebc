"""Multi-scene vmap + multi-device shard_map tests (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from similari_tpu.parallel import (
    batched_sort_step,
    new_batched_state,
    scene_mesh,
    shard_batched_state,
    sharded_sort_step,
)
from similari_tpu.trackers.sort_step import SortConfig


def make_dets(rng, s, d, spread=100.0):
    box = np.zeros((s, d, 5), np.float32)
    box[..., 0] = rng.uniform(0, spread, size=(s, d))
    box[..., 1] = rng.uniform(0, spread, size=(s, d))
    box[..., 3] = 0.5
    box[..., 4] = 20.0
    conf = np.ones((s, d), np.float32)
    valid = np.ones((s, d), bool)
    return box, conf, valid


def test_vmapped_batch_step_matches_single():
    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5)
    rng = np.random.default_rng(0)
    s, d, t = 4, 8, 32
    state = new_batched_state(s, t, 4)
    box, conf, valid = make_dets(rng, s, d)
    vstep = jax.jit(batched_sort_step(cfg))
    epochs = jnp.ones((s,), jnp.int32)

    state2, out = vstep(state, jnp.asarray(box), jnp.asarray(conf), jnp.asarray(valid), epochs)
    # each scene creates d new tracks with ids 1..d
    ids = np.asarray(out.track_id)
    for i in range(s):
        assert sorted(ids[i].tolist()) == list(range(1, d + 1))

    # second epoch: same boxes -> same ids (all matched)
    state3, out2 = vstep(
        state2, jnp.asarray(box), jnp.asarray(conf), jnp.asarray(valid), epochs + 1
    )
    np.testing.assert_array_equal(np.asarray(out2.track_id), ids)
    assert not np.asarray(out2.is_new).any()


def test_sharded_step_on_mesh():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"expected 8 virtual devices, got {n_dev}"
    mesh = scene_mesh()
    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5)
    rng = np.random.default_rng(1)
    s, d, t = 16, 8, 32  # 2 scenes per device
    state = shard_batched_state(new_batched_state(s, t, 4), mesh)
    box, conf, valid = make_dets(rng, s, d)
    step = sharded_sort_step(cfg, mesh)
    epochs = jnp.ones((s,), jnp.int32)

    state, out, new_tracks = step(
        state, jnp.asarray(box), jnp.asarray(conf), jnp.asarray(valid), epochs
    )
    assert int(new_tracks) == s * d  # psum across devices
    state, out2, new_tracks2 = step(
        state, jnp.asarray(box), jnp.asarray(conf), jnp.asarray(valid), epochs + 1
    )
    assert int(new_tracks2) == 0
    np.testing.assert_array_equal(
        np.asarray(out2.track_id), np.asarray(out.track_id)
    )


def test_sharded_scan_over_mesh():
    """scan(vmap(step)) inside shard_map: per-device frame loops + one psum."""
    from similari_tpu.parallel import sharded_sort_scan

    mesh = scene_mesh()
    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5,
                     oriented=False)
    rng = np.random.default_rng(5)
    frames, s, d, t = 6, 8, 4, 16
    states = jax.device_put(
        new_batched_state(s, t, 1),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("scenes")),
    )
    box = np.zeros((frames, s, d, 5), np.float32)
    xy = rng.uniform(0, 300, size=(s, d, 2))
    for f in range(frames):
        xy += rng.uniform(-1, 1, size=xy.shape)
        box[f, ..., 0] = xy[..., 0]
        box[f, ..., 1] = xy[..., 1]
        box[f, ..., 3] = 0.5
        box[f, ..., 4] = 20.0
    run = sharded_sort_scan(cfg, mesh)
    states, ids, total_new, total_ovf = run(
        states,
        jnp.asarray(box),
        jnp.ones((frames, s, d), jnp.float32),
        jnp.ones((frames, s, d), bool),
        jnp.ones((s,), jnp.int32),
    )
    assert int(total_new) == s * d  # only the first frame creates tracks
    assert int(total_ovf) == 0
    ids = np.asarray(ids)
    for f in range(1, frames):
        np.testing.assert_array_equal(ids[f], ids[0])


def test_pod_mesh_2d():
    """2-D (hosts x devices) mesh: scenes sharded over both axes."""
    from similari_tpu.parallel import (
        pod_mesh,
        pod_scene_spec,
        pod_sharded_sort_scan,
    )

    mesh = pod_mesh(2, 4)  # 8 virtual devices as 2 "hosts" x 4 chips
    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5,
                     oriented=False)
    rng = np.random.default_rng(6)
    frames, s, d, t = 4, 16, 4, 16
    states = jax.device_put(
        new_batched_state(s, t, 1),
        jax.sharding.NamedSharding(mesh, pod_scene_spec()),
    )
    box = np.zeros((frames, s, d, 5), np.float32)
    xy = rng.uniform(0, 500, size=(s, d, 2))
    for f in range(frames):
        xy += rng.uniform(-1, 1, size=xy.shape)
        box[f, ..., 0] = xy[..., 0]
        box[f, ..., 1] = xy[..., 1]
        box[f, ..., 3] = 0.5
        box[f, ..., 4] = 20.0
    run = pod_sharded_sort_scan(cfg, mesh)
    states, ids, total_new, total_ovf = run(
        states,
        jnp.asarray(box),
        jnp.ones((frames, s, d), jnp.float32),
        jnp.ones((frames, s, d), bool),
        jnp.ones((s,), jnp.int32),
    )
    assert int(total_new) == s * d
    assert int(total_ovf) == 0
    ids = np.asarray(ids)
    np.testing.assert_array_equal(ids[1], ids[0])


def test_chunked_batched_step_matches_unchunked():
    """Scene-chunked vmap (lax.map over chunks) must be output-identical to
    the full-width vmap — chunking only bounds the step's temporaries."""
    from similari_tpu.parallel import (
        batched_sort_step,
        batched_sort_step_chunked,
        new_batched_state,
    )

    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5,
                     oriented=False)
    full = jax.jit(batched_sort_step(cfg))
    chunked = jax.jit(batched_sort_step_chunked(cfg, 4))
    rng = np.random.default_rng(9)
    s, d, t = 16, 6, 16
    box = np.zeros((s, d, 5), np.float32)
    xy = rng.uniform(0, 500, size=(s, d, 2))
    box[..., 0] = xy[..., 0]
    box[..., 1] = xy[..., 1]
    box[..., 3] = 0.5
    box[..., 4] = 20.0
    conf = jnp.ones((s, d), jnp.float32)
    valid = jnp.ones((s, d), bool)
    epochs = jnp.ones((s,), jnp.int32)

    st_a, out_a = full(new_batched_state(s, t, 1), jnp.asarray(box), conf,
                       valid, epochs)
    st_b, out_b = chunked(new_batched_state(s, t, 1), jnp.asarray(box), conf,
                          valid, epochs)
    np.testing.assert_array_equal(np.asarray(out_b.track_id),
                                  np.asarray(out_a.track_id))
    np.testing.assert_allclose(np.asarray(st_b.pred_box),
                               np.asarray(st_a.pred_box), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(st_b.active),
                                  np.asarray(st_a.active))
