"""Multi-device VisualSORT: sharded batch step + distributed gallery query."""

import numpy as np
import jax
import jax.numpy as jnp

from similari_tpu.parallel import (
    global_gallery_query,
    new_batched_visual_state,
    scene_mesh,
    shard_batched_state,
    sharded_visual_step,
)
from similari_tpu.trackers.visual_step import VisualConfig


def make_visual_dets(rng, s, d, f):
    box = np.zeros((s, d, 5), np.float32)
    box[..., 0] = rng.uniform(0, 500, size=(s, d))
    box[..., 1] = rng.uniform(0, 500, size=(s, d))
    box[..., 3] = 0.5
    box[..., 4] = 20.0
    feat = rng.normal(size=(s, d, f)).astype(np.float32)
    return box, feat


def test_sharded_visual_step_and_gallery_query():
    mesh = scene_mesh()
    cfg = VisualConfig(
        positional_kind="iou",
        visual_kind="cosine",
        visual_threshold=0.3,
        visual_minimal_track_length=1,
        max_idle_epochs=5,
        assignment="auction",
    )
    rng = np.random.default_rng(0)
    s, d, t, k, f = 8, 4, 16, 3, 32
    state = shard_batched_state(new_batched_visual_state(s, t, 2, k, f), mesh)
    box, feat = make_visual_dets(rng, s, d, f)
    ones = jnp.ones((s, d), jnp.float32)
    tru = jnp.ones((s, d), bool)
    step = sharded_visual_step(cfg, mesh)

    state, out, new_tracks = step(
        state, jnp.asarray(box), ones, tru, jnp.asarray(feat), tru, ones, ones,
        jnp.ones((s,), jnp.int32),
    )
    assert int(new_tracks) == s * d

    # second epoch, same positions+features -> all matched
    state, out2, new2 = step(
        state, jnp.asarray(box), ones, tru, jnp.asarray(feat), tru, ones, ones,
        jnp.full((s,), 2, jnp.int32),
    )
    assert int(new2) == 0

    # global gallery query: the query feature of scene 5, det 2 must hit its
    # own track as the global best match
    query = jnp.asarray(feat[5, 2:3])  # [1, F]
    qfn = global_gallery_query("cosine", k=4, mesh=mesh)
    scores, shard, scene, tids = qfn(state, query)
    expect_tid = int(np.asarray(out2.track_id)[5, 2])
    got = np.asarray(tids)[0]
    assert expect_tid in got.tolist()
    best_scene = int(np.asarray(scene)[0, 0])
    n_local = s // len(jax.devices())
    global_scene = int(np.asarray(shard)[0, 0]) * n_local + best_scene
    assert global_scene == 5
    assert float(np.asarray(scores)[0, 0]) > 0.99


def test_gallery_query_on_pod_mesh():
    """Regression (round-3 review): global_gallery_query hardcoded the 1-D
    scene axis and failed to trace on the 2-D (hosts x devices) pod mesh."""
    import dataclasses

    from similari_tpu.parallel import (
        global_gallery_query,
        new_batched_visual_state,
        pod_mesh,
        pod_scene_spec,
    )

    mesh = pod_mesh(2, 4)
    scenes, t, k, f = 8, 4, 2, 16
    rng = np.random.default_rng(3)
    states = new_batched_visual_state(scenes, t, 1, k, f)
    states = dataclasses.replace(
        states,
        feats=jnp.asarray(rng.normal(size=states.feats.shape
                                     ).astype(np.float32)),
        feat_valid=jnp.ones(states.feat_valid.shape, bool),
        active=jnp.ones(states.active.shape, bool),
        track_id=jnp.arange(scenes * t, dtype=jnp.int32).reshape(scenes, t),
    )
    states = jax.device_put(
        states, jax.sharding.NamedSharding(mesh, pod_scene_spec()))
    qfn = global_gallery_query("cosine", 4, mesh)
    # query = an exact stored feature: the global top-1 must find it
    target = np.asarray(states.feats)[5, 2, 1]
    scores, shard, scene, tid = qfn(states, jnp.asarray(target[None]))
    assert float(scores[0, 0]) > 0.999
    found = int(tid[0, 0])
    assert found == int(np.asarray(states.track_id)[5, 2])
