"""Cross-shard track migration & merge tests (8 virtual CPU devices).

Covers the collective handoff ops in `parallel/handoff.py`: track columns
moving intact between scene shards, fresh-id assignment in the destination
namespace, capacity-overflow refusal, gallery quality-top-K union on merge,
and source deactivation only on success.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from similari_tpu.parallel import (
    new_batched_state,
    new_batched_visual_state,
    scene_mesh,
    shard_batched_state,
    track_merge,
    track_migration,
)


def _populate_sort(state, scene, slots, ids, rng):
    """Host-side: drop hand-made active tracks into a batched SortState."""
    active = np.array(state.active)
    track_id = np.array(state.track_id)
    length = np.array(state.length)
    pred = np.array(state.pred_box)
    next_id = np.array(state.next_id)
    for sl, tid in zip(slots, ids):
        active[scene, sl] = True
        track_id[scene, sl] = tid
        length[scene, sl] = 3
        pred[scene, sl] = rng.uniform(0, 100, size=5).astype(np.float32)
    next_id[scene] = max(ids)
    return dataclasses.replace(
        state,
        active=jnp.asarray(active),
        track_id=jnp.asarray(track_id),
        length=jnp.asarray(length),
        pred_box=jnp.asarray(pred),
        next_id=jnp.asarray(next_id),
    )


def test_migration_moves_track_between_shards():
    mesh = scene_mesh()
    s, t = 16, 8  # 2 scenes per device
    rng = np.random.default_rng(0)
    state = _populate_sort(new_batched_state(s, t, 2), scene=1,
                           slots=[2, 5], ids=[7, 9], rng=rng)
    # give the destination scene one pre-existing track so next_id > 0
    state = _populate_sort(state, scene=11, slots=[0], ids=[4], rng=rng)
    state = shard_batched_state(state, mesh)
    src_pred = np.asarray(state.pred_box)[1, 5].copy()

    migrate = track_migration(mesh)
    m = lambda v: jnp.asarray(v, jnp.int32)
    state2, success, new_ids = migrate(
        state, m([1]), m([9]), m([11]), m([42])
    )
    assert np.asarray(success).tolist() == [True]
    new_id = int(np.asarray(new_ids)[0])
    assert new_id == 5  # dst next_id was 4

    active = np.asarray(state2.active)
    tids = np.asarray(state2.track_id)
    assert not active[1, 5]  # source slot freed
    assert active[1, 2]  # unrelated track untouched
    dst_slots = np.flatnonzero(active[11])
    assert len(dst_slots) == 2
    landed = [sl for sl in dst_slots if tids[11, sl] == new_id]
    assert len(landed) == 1
    sl = landed[0]
    np.testing.assert_allclose(np.asarray(state2.pred_box)[11, sl], src_pred)
    assert np.asarray(state2.length)[11, sl] == 3  # history travels
    assert np.asarray(state2.last_epoch)[11, sl] == 42
    assert int(np.asarray(state2.next_id)[11]) == 5


def test_migration_missing_track_and_full_destination():
    mesh = scene_mesh()
    s, t = 8, 4
    rng = np.random.default_rng(1)
    state = _populate_sort(new_batched_state(s, t, 2), scene=0,
                           slots=[0], ids=[1], rng=rng)
    # fill destination scene 7 completely
    state = _populate_sort(state, scene=7, slots=list(range(t)),
                           ids=[1, 2, 3, 4], rng=rng)
    state = shard_batched_state(state, mesh)

    migrate = track_migration(mesh)
    m = lambda v: jnp.asarray(v, jnp.int32)
    state2, success, new_ids = migrate(
        state,
        m([0, 0]), m([99, 1]),  # move 0: id 99 does not exist; move 1: full dst
        m([3, 7]), m([0, 0]),
    )
    assert np.asarray(success).tolist() == [False, False]
    assert np.asarray(new_ids).tolist() == [0, 0]
    # source of the failed capacity move must still be alive
    assert bool(np.asarray(state2.active)[0, 0])
    assert np.asarray(state2.active).sum() == 1 + t


def test_migration_two_moves_same_destination():
    mesh = scene_mesh()
    s, t = 8, 8
    rng = np.random.default_rng(2)
    state = _populate_sort(new_batched_state(s, t, 2), scene=2,
                           slots=[0], ids=[5], rng=rng)
    state = _populate_sort(state, scene=3, slots=[1], ids=[6], rng=rng)
    state = shard_batched_state(state, mesh)

    migrate = track_migration(mesh)
    m = lambda v: jnp.asarray(v, jnp.int32)
    state2, success, new_ids = migrate(
        state, m([2, 3]), m([5, 6]), m([6, 6]), m([9, 9])
    )
    assert np.asarray(success).tolist() == [True, True]
    assert sorted(np.asarray(new_ids).tolist()) == [1, 2]  # distinct fresh ids
    active = np.asarray(state2.active)
    assert active[6].sum() == 2  # distinct slots
    assert active[2].sum() == 0 and active[3].sum() == 0
    assert int(np.asarray(state2.next_id)[6]) == 2


def _populate_visual(state, scene, slot, tid, qualities, rng, feat_base):
    active = np.array(state.active)
    track_id = np.array(state.track_id)
    length = np.array(state.length)
    feats = np.array(state.feats, np.float32)
    qual = np.array(state.feat_quality)
    fvalid = np.array(state.feat_valid)
    collected = np.array(state.collected)
    active[scene, slot] = True
    track_id[scene, slot] = tid
    length[scene, slot] = len(qualities)
    for k, q in enumerate(qualities):
        feats[scene, slot, k] = feat_base + k
        qual[scene, slot, k] = q
        fvalid[scene, slot, k] = True
    collected[scene, slot] = len(qualities)
    return dataclasses.replace(
        state,
        active=jnp.asarray(active),
        track_id=jnp.asarray(track_id),
        length=jnp.asarray(length),
        feats=jnp.asarray(feats).astype(state.feats.dtype),
        feat_quality=jnp.asarray(qual),
        feat_valid=jnp.asarray(fvalid),
        collected=jnp.asarray(collected),
    )


def test_merge_unions_gallery_by_quality():
    mesh = scene_mesh()
    s, t, k, f = 16, 4, 3, 8
    rng = np.random.default_rng(3)
    state = new_batched_visual_state(s, t, 2, k, f)
    # src on shard 0 (scene 1): qualities 0.9, 0.2; features base 100
    state = _populate_visual(state, 1, 0, 11, [0.9, 0.2], rng, 100.0)
    # dst on shard 7 (scene 15): qualities 0.5, 0.4, 0.3; base 200
    state = _populate_visual(state, 15, 2, 22, [0.5, 0.4, 0.3], rng, 200.0)
    state = shard_batched_state(state, mesh)

    merge = track_merge(mesh)
    m = lambda v: jnp.asarray(v, jnp.int32)
    state2, success = merge(state, m([1]), m([11]), m([15]), m([22]))
    assert np.asarray(success).tolist() == [True]

    active = np.asarray(state2.active)
    assert not active[1, 0]  # source freed
    assert active[15, 2]
    qual = np.asarray(state2.feat_quality)[15, 2]
    valid = np.asarray(state2.feat_valid)[15, 2]
    assert valid.all()
    # top-3 of {0.9, 0.2} U {0.5, 0.4, 0.3} = {0.9, 0.5, 0.4}
    np.testing.assert_allclose(
        sorted(qual.tolist(), reverse=True), [0.9, 0.5, 0.4], rtol=1e-6
    )
    feats = np.asarray(state2.feats, np.float32)[15, 2]
    by_q = {round(q, 2): ft[0] for q, ft in zip(qual.tolist(), feats)}
    assert by_q[0.9] == 100.0  # src's best feature came across
    assert by_q[0.5] == 200.0
    assert np.asarray(state2.collected)[15, 2] == 5
    assert np.asarray(state2.length)[15, 2] == 5
    # dst keeps its own id and kalman state
    assert np.asarray(state2.track_id)[15, 2] == 22


def test_merge_requires_both_rows():
    mesh = scene_mesh()
    s, t, k, f = 8, 4, 2, 4
    rng = np.random.default_rng(4)
    state = new_batched_visual_state(s, t, 2, k, f)
    state = _populate_visual(state, 0, 0, 1, [0.5], rng, 10.0)
    state = shard_batched_state(state, mesh)

    merge = track_merge(mesh)
    m = lambda v: jnp.asarray(v, jnp.int32)
    state2, success = merge(state, m([0]), m([1]), m([5]), m([99]))
    assert np.asarray(success).tolist() == [False]
    assert bool(np.asarray(state2.active)[0, 0])  # source untouched


def test_migration_works_on_visual_state():
    mesh = scene_mesh()
    s, t, k, f = 8, 4, 2, 4
    rng = np.random.default_rng(5)
    state = new_batched_visual_state(s, t, 2, k, f)
    state = _populate_visual(state, 4, 1, 8, [0.7, 0.6], rng, 50.0)
    state = shard_batched_state(state, mesh)

    migrate = track_migration(mesh)
    m = lambda v: jnp.asarray(v, jnp.int32)
    state2, success, new_ids = migrate(state, m([4]), m([8]), m([2]), m([1]))
    assert np.asarray(success).tolist() == [True]
    active = np.asarray(state2.active)
    assert not active[4, 1]
    sl = np.flatnonzero(active[2])
    assert len(sl) == 1
    feats = np.asarray(state2.feats, np.float32)[2, sl[0]]
    assert feats[0, 0] == 50.0 and feats[1, 0] == 51.0  # gallery travelled
    assert np.asarray(state2.feat_valid)[2, sl[0]].all()
    assert np.asarray(state2.collected)[2, sl[0]] == 2


def test_migration_on_2d_pod_mesh():
    """Handoff across the (hosts, devices) pod mesh — DCN-crossing move."""
    from jax.sharding import NamedSharding
    from similari_tpu.parallel import pod_mesh, pod_scene_spec

    mesh = pod_mesh(n_hosts=4, devices_per_host=2)
    s, t = 16, 4  # 2 scenes per shard, 8 shards
    rng = np.random.default_rng(6)
    state = _populate_sort(new_batched_state(s, t, 2), scene=0,
                           slots=[1], ids=[3], rng=rng)
    sharding = NamedSharding(mesh, pod_scene_spec())
    state = jax.tree.map(lambda a: jax.device_put(a, sharding), state)

    migrate = track_migration(mesh)
    m = lambda v: jnp.asarray(v, jnp.int32)
    # scene 0 lives on (host 0, dev 0); scene 15 on (host 3, dev 1)
    state2, success, new_ids = migrate(state, m([0]), m([3]), m([15]), m([4]))
    assert np.asarray(success).tolist() == [True]
    active = np.asarray(state2.active)
    assert not active[0, 1] and active[15].sum() == 1
    sl = int(np.flatnonzero(active[15])[0])
    assert np.asarray(state2.track_id)[15, sl] == 1
    assert np.asarray(state2.last_epoch)[15, sl] == 4


def test_merge_on_2d_pod_mesh():
    """ReID merge across the (hosts, devices) pod mesh — psum over both axes."""
    from jax.sharding import NamedSharding
    from similari_tpu.parallel import pod_mesh, pod_scene_spec

    mesh = pod_mesh(n_hosts=4, devices_per_host=2)
    s, t, k, f = 16, 4, 3, 8
    rng = np.random.default_rng(9)
    state = new_batched_visual_state(s, t, 2, k, f)
    state = _populate_visual(state, 0, 0, 11, [0.9, 0.2], rng, 100.0)
    state = _populate_visual(state, 15, 2, 22, [0.5, 0.4, 0.3], rng, 200.0)
    sharding = NamedSharding(mesh, pod_scene_spec())
    state = jax.tree.map(lambda a: jax.device_put(a, sharding), state)

    merge = track_merge(mesh)
    m = lambda v: jnp.asarray(v, jnp.int32)
    state2, success = merge(state, m([0]), m([11]), m([15]), m([22]))
    assert np.asarray(success).tolist() == [True]
    active = np.asarray(state2.active)
    assert not active[0, 0] and active[15, 2]
    qual = np.asarray(state2.feat_quality)[15, 2]
    np.testing.assert_allclose(
        sorted(qual.tolist(), reverse=True), [0.9, 0.5, 0.4], rtol=1e-6
    )
    assert np.asarray(state2.track_id)[15, 2] == 22


def test_merge_rejects_conflicting_batches():
    """Regression (round-3 review): duplicated destinations/sources, chains
    and self-merges must FAIL loudly (success=False, state untouched) instead
    of last-writer-wins gallery loss and corrupted deactivation."""
    mesh = scene_mesh()
    s, t, k, f = 8, 4, 2, 8
    rng = np.random.default_rng(9)
    state = new_batched_visual_state(s, t, 2, k, f)
    for scene in range(8):
        state = _populate_visual(state, scene, 0, 10 + scene, [0.5], rng,
                                 10.0 * (scene + 1))
    state = shard_batched_state(state, mesh)
    merge = track_merge(mesh)
    m = lambda v: jnp.asarray(v, jnp.int32)
    act_before = np.asarray(state.active).copy()

    # two sources into ONE destination -> both entries fail
    st2, ok = merge(state, m([0, 1]), m([10, 11]), m([2, 2]), m([12, 12]))
    assert not bool(np.asarray(ok).any())
    np.testing.assert_array_equal(np.asarray(st2.active), act_before)

    # self-merge -> fails
    st3, ok3 = merge(st2, m([3]), m([13]), m([3]), m([13]))
    assert not bool(np.asarray(ok3).any())
    np.testing.assert_array_equal(np.asarray(st3.active), act_before)

    # chain (A->B and B->C in one batch) -> both fail
    st4, ok4 = merge(st3, m([4, 5]), m([14, 15]), m([5, 6]), m([15, 16]))
    assert not bool(np.asarray(ok4).any())
    np.testing.assert_array_equal(np.asarray(st4.active), act_before)

    # an independent entry alongside a duplicated-source pair still works
    st5, ok5 = merge(st4, m([0, 1, 1]), m([10, 11, 11]),
                     m([7, 2, 3]), m([17, 12, 13]))
    ok5 = np.asarray(ok5)
    assert bool(ok5[0]) and not ok5[1] and not ok5[2]
    active5 = np.asarray(st5.active)
    assert not active5[0, 0]  # entry 0 landed: source freed
    assert active5[1, 0]      # duplicated source untouched
