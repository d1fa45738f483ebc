"""Cross-shard track handoff and merging — collectives, not channels.

The north-star deployment (BASELINE.json) shards scenes/streams across a
device mesh with each scene's track store resident on its shard.  Two
cross-shard operations close the loop that a multi-camera deployment needs
(the reference demonstrates the semantics host-side in its multi-camera
example, `/root/reference/examples/track_merging.rs`, and its store exposes
`merge_external` / `merge_owned`, `/root/reference/src/track/store.rs:584-691`
— but it has no multi-process story at all, `SURVEY.md` §2.10):

* `track_migration` — move a live track (Kalman state, histories, gallery,
  …every SoA column) from one scene shard to another, e.g. when a stream is
  rebalanced or an object physically crosses between cameras handled by
  different hosts.  The destination scene assigns the track a fresh
  sequential id (scene-local id namespaces stay collision-free) and the old
  id -> new id mapping is returned to the caller.

* `track_merge` — merge a source track INTO an existing destination track on
  another shard (ReID identity stitching): the destination keeps its own
  Kalman state and bbox history (its camera's geometry), absorbs the source's
  feature gallery by quality-top-K union (the reference's gallery eviction
  rule, `/root/reference/src/trackers/visual_sort/metric.rs:129-154`), sums
  track lengths (`Track::merge` extends observations,
  `/root/reference/src/track.rs:522-588`), and the source slot is freed.

Both are built scatter-free: the owning shard extracts the track's rows with
a one-hot contraction, the payload rides ONE `psum` (only the owner
contributes non-zeros), the destination writes with a one-hot merge, and a
second tiny `psum` carries the success flags back so the source only
deactivates tracks that actually landed.  No dynamic gather/scatter, no
host round-trips: each op is a single compiled program with two collectives.

These are rare-event control operations (a handful of tracks per event), not
per-frame hot paths; clarity and exactness win over peak FLOPs here.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..trackers.visual_state import VisualState
from .mesh import SCENE_AXIS  # noqa: F401  (callers build 1-D scene meshes with it)


def _mesh_axes(mesh: Mesh):
    """All mesh axis names — scenes shard over every axis (1-D scene mesh
    or 2-D (hosts, devices) pod mesh, see `mesh.pod_scene_spec`)."""
    return tuple(mesh.axis_names)


def _my_shard(mesh: Mesh) -> jax.Array:
    """Row-major linear shard index over all mesh axes — matches the order
    scenes are laid out by `P(mesh.axis_names)` sharding."""
    idx = jnp.int32(0)
    for a in _mesh_axes(mesh):
        idx = idx * mesh.shape[a] + jax.lax.axis_index(a).astype(jnp.int32)
    return idx


def _is_track_leaf(leaf: jax.Array, s: int, t: int) -> bool:
    return leaf.ndim >= 2 and leaf.shape[0] == s and leaf.shape[1] == t


def _psum_leaf(leaf: jax.Array, axes) -> jax.Array:
    """psum that tolerates bool/bf16 leaves (sum of one non-zero contributor)."""
    if leaf.dtype == jnp.bool_:
        return jax.lax.psum(leaf.astype(jnp.int32), axes) > 0
    if leaf.dtype == jnp.bfloat16:
        return jax.lax.psum(leaf.astype(jnp.float32), axes).astype(
            jnp.bfloat16
        )
    return jax.lax.psum(leaf, axes)


def _extract(state, onehot: jax.Array):
    """Pull the rows selected by onehot[m, s, t] out of every track column.

    Non-owning shards see an all-False onehot and contribute exact zeros, so
    the subsequent psum reconstructs the payload everywhere.  Returns a
    pytree whose track leaves have shape [M, ...] (leading [S, T] dropped);
    non-track leaves (per-scene counters) are replaced by zeros.
    """
    m = onehot.shape[0]
    s, t = onehot.shape[1], onehot.shape[2]

    def ext(leaf):
        if not _is_track_leaf(leaf, s, t):
            return jnp.zeros((m,), leaf.dtype)
        rows = []
        for i in range(m):
            sel = onehot[i].reshape((s, t) + (1,) * (leaf.ndim - 2))
            zero = jnp.zeros((), leaf.dtype)
            # sum over (S, T) hits exactly one row; cast restores bool leaves
            # (their sum promotes to int)
            rows.append(
                jnp.where(sel, leaf, zero).sum(axis=(0, 1)).astype(leaf.dtype)
            )
        return jnp.stack(rows)

    return jax.tree.map(ext, state)


def _insert(state, writer: jax.Array, payload):
    """Write payload rows into the slots selected by writer[m, s, t].

    Disjoint one-hots per move; a plain unrolled where-chain (M is a handful)
    — exact for every dtype, no scatters.
    """
    m = writer.shape[0]
    s, t = writer.shape[1], writer.shape[2]

    def ins(leaf, pay):
        if not _is_track_leaf(leaf, s, t):
            return leaf
        out = leaf
        for i in range(m):
            sel = writer[i].reshape((s, t) + (1,) * (leaf.ndim - 2))
            out = jnp.where(sel, pay[i].astype(leaf.dtype), out)
        return out

    return jax.tree.map(ins, state, payload)


def _source_onehot(state, my_shard, s_local, scene_g, track_id):
    """onehot[m, s, t] — the source rows this shard owns; plus local found."""
    src_shard = scene_g // s_local
    src_local = scene_g % s_local
    own = src_shard == my_shard  # [M]
    scene_grid = jnp.arange(s_local, dtype=jnp.int32)[:, None]  # [S, 1]
    onehot = (
        own[:, None, None]
        & (scene_grid[None] == src_local[:, None, None])
        & (state.track_id[None] == track_id[:, None, None])
        & state.active[None]
    )
    return onehot, src_local


def _same_scene_rank(dst_local, mine, eligible):
    """rank[m] = #{j < m : eligible[j] and same destination scene}."""
    m = dst_local.shape[0]
    before = jnp.tril(jnp.ones((m, m), bool), k=-1)
    same = dst_local[:, None] == dst_local[None, :]
    return jnp.sum(
        (before & same & (mine & eligible)[None, :]).astype(jnp.int32), axis=1
    )


def track_migration(mesh: Mesh) -> callable:
    """Build the jitted cross-shard migration op for a batched state type.

    Works for batched `SortState` and `VisualState` alike (every leaf with a
    leading [scenes, capacity] block is treated as a track column).

    The returned function:

        new_state, success, new_ids = migrate(
            state,        # batched state, scene axis sharded over the mesh
            src_scene,    # [M] int32 GLOBAL scene index of each move
            src_track_id, # [M] int32 id of the track to move
            dst_scene,    # [M] int32 GLOBAL destination scene
            dst_epoch,    # [M] int32 destination scene's current epoch
        )

    `success[m]` is False when the source track does not exist or the
    destination scene has no free slot (the source is left untouched).
    `new_ids[m]` is the id assigned by the destination scene (0 on failure).
    Moving within one scene is a no-op concern — use the in-scene store API.
    """

    axes = _mesh_axes(mesh)

    def local(state, src_scene, src_track_id, dst_scene, dst_epoch):
        s_local = state.active.shape[0]
        t = state.active.shape[1]
        my = _my_shard(mesh)

        onehot, _ = _source_onehot(state, my, s_local, src_scene, src_track_id)
        found = jax.lax.psum(
            jnp.any(onehot, axis=(1, 2)).astype(jnp.int32), axes
        ) > 0  # [M]
        payload = jax.tree.map(
            lambda l: _psum_leaf(l, axes), _extract(state, onehot)
        )

        # --- destination side -------------------------------------------
        dst_shard = dst_scene // s_local
        dst_local = dst_scene % s_local
        mine = dst_shard == my
        rank = _same_scene_rank(dst_local, mine, found)
        free_count = jnp.sum((~state.active).astype(jnp.int32), axis=1)  # [S]
        cap_ok = rank < free_count[jnp.clip(dst_local, 0, s_local - 1)]
        success_local = mine & found & cap_ok
        success = jax.lax.psum(success_local.astype(jnp.int32), axes) > 0

        # r-th free slot per scene, scatter-free: a slot matches move m when
        # its free-rank equals rank[m]
        free = ~state.active  # [S, T]
        free_rank = jnp.cumsum(free.astype(jnp.int32), axis=1) - 1
        free_rank = jnp.where(free, free_rank, -1)
        scene_grid = jnp.arange(s_local, dtype=jnp.int32)[:, None]
        writer = (
            success_local[:, None, None]
            & (scene_grid[None] == dst_local[:, None, None])
            & (free_rank[None] == rank[:, None, None])
        )  # [M, S, T]

        # fresh sequential ids in the destination scene's namespace
        next_id = state.next_id  # [S]
        new_id_local = jnp.where(
            success_local,
            next_id[jnp.clip(dst_local, 0, s_local - 1)] + rank + 1,
            0,
        ).astype(jnp.int32)
        new_ids = jax.lax.psum(new_id_local, axes)

        issued = jnp.sum(
            (success_local[:, None] & (dst_local[:, None] == scene_grid.T))
            .astype(jnp.int32),
            axis=0,
        )  # [S]

        payload = dataclasses.replace(
            payload,
            track_id=new_ids,
            last_epoch=dst_epoch,
            active=jnp.ones_like(payload.active),
        )
        state = _insert(state, writer, payload)

        # --- source side: free slots whose move landed -------------------
        dead = jnp.any(onehot & success[:, None, None], axis=0)  # [S, T]
        state = dataclasses.replace(
            state,
            active=state.active & ~dead,
            next_id=(state.next_id + issued).astype(jnp.int32),
        )
        return state, success, new_ids

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(), P(), P(), P()),
        out_specs=(P(axes), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def track_merge(mesh: Mesh) -> callable:
    """Build the jitted cross-shard track-merge op for batched `VisualState`.

    ReID identity stitching: the source track's feature gallery is absorbed
    into the destination track, which keeps its own camera-local Kalman state
    and bbox history (the reference's `Track::merge` likewise keeps the
    destination attributes and extends observations,
    `/root/reference/src/track.rs:522-588`).

        new_state, success = merge(
            state,         # batched VisualState, scene axis sharded
            src_scene, src_track_id,   # [M] int32 (global scene, id)
            dst_scene, dst_track_id,   # [M] int32 (global scene, id)
        )

    Gallery union keeps the top-K by quality out of the 2K candidate features
    (`visual_sort/metric.rs:129-154` eviction rule); `collected` and `length`
    accumulate; `last_epoch` is NOT touched (the destination's scene clock is
    unrelated to the source's).

    `success[m]` requires both rows to exist AND the batch entry to be
    independent: entries whose source or destination identity is duplicated
    within the batch, chains (one entry's destination is another's source),
    and self-merges all FAIL (success=False, state untouched for them) —
    last-writer-wins on a shared destination would silently drop a gallery,
    and deactivating a chained row would corrupt the other merge.  Retry
    failed entries in a later batch.
    """

    axes = _mesh_axes(mesh)

    def local(state: VisualState, src_scene, src_id, dst_scene, dst_id):
        s_local = state.active.shape[0]
        my = _my_shard(mesh)

        src_oh, _ = _source_onehot(state, my, s_local, src_scene, src_id)
        dst_oh, _ = _source_onehot(state, my, s_local, dst_scene, dst_id)
        src_found = jax.lax.psum(
            jnp.any(src_oh, axis=(1, 2)).astype(jnp.int32), axes
        ) > 0
        dst_found = jax.lax.psum(
            jnp.any(dst_oh, axis=(1, 2)).astype(jnp.int32), axes
        ) > 0
        # independence guard (see docstring): duplicated sources or
        # destinations and cross-entry chains fail rather than corrupt
        eq_d = ((dst_scene[:, None] == dst_scene[None, :])
                & (dst_id[:, None] == dst_id[None, :]))
        eq_s = ((src_scene[:, None] == src_scene[None, :])
                & (src_id[:, None] == src_id[None, :]))
        unique = ((jnp.sum(eq_d, axis=1) == 1)
                  & (jnp.sum(eq_s, axis=1) == 1))
        chain = ((dst_scene[:, None] == src_scene[None, :])
                 & (dst_id[:, None] == src_id[None, :]))
        indep = ~jnp.any(chain, axis=1) & ~jnp.any(chain.T, axis=1)
        success = src_found & dst_found & unique & indep

        src = jax.tree.map(lambda l: _psum_leaf(l, axes), _extract(state, src_oh))
        dst = jax.tree.map(lambda l: _psum_leaf(l, axes), _extract(state, dst_oh))

        # --- merged rows, computed identically on every shard ------------
        # (batched state is [S, T, K, F]; count the gallery axis from the end
        # — the `gallery_size` property assumes an unbatched [T, K, F] layout)
        k = state.feats.shape[-2]
        cat_q = jnp.concatenate([dst.feat_quality, src.feat_quality], axis=1)
        cat_v = jnp.concatenate([dst.feat_valid, src.feat_valid], axis=1)
        cat_f = jnp.concatenate([dst.feats, src.feats], axis=1)  # [M, 2K, F]
        ranked = jnp.where(cat_v, cat_q, -jnp.inf)
        _, keep = jax.lax.top_k(ranked, k)  # [M, K] indices into 2K
        sel = jax.nn.one_hot(keep, 2 * k, dtype=jnp.float32)  # [M, K, 2K]
        m_feats = jnp.einsum(
            "mkc,mcf->mkf", sel, cat_f.astype(jnp.float32)
        ).astype(state.feats.dtype)
        m_qual = jnp.einsum("mkc,mc->mk", sel, cat_q)
        m_valid = jnp.einsum(
            "mkc,mc->mk", sel, cat_v.astype(jnp.float32)
        ) > 0.5

        merged = dataclasses.replace(
            dst,
            feats=m_feats,
            feat_quality=m_qual,
            feat_valid=m_valid,
            collected=dst.collected + src.collected,
            length=dst.length + src.length,
        )

        writer = dst_oh & success[:, None, None]
        state = _insert(state, writer, merged)

        dead = jnp.any(src_oh & success[:, None, None], axis=0)
        state = dataclasses.replace(state, active=state.active & ~dead)
        return state, success

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P(), P(), P(), P()),
        out_specs=(P(axes), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))
