"""Distributed ReID gallery search — cross-shard track queries.

The north-star workload (BASELINE.json) shards scenes/streams across devices;
tracks (and their feature galleries) live with their scene shard.  Global
queries ("which tracks anywhere match this appearance?") are answered with a
two-level top-k: each shard scores its local galleries with one MXU matmul,
takes a local top-k, and the results ride an all_gather over ICI — O(k)
bytes per device instead of gathering the galleries themselves.

This is the TPU-native replacement for what would be a cross-process gallery
service in the reference's architecture (it has no multi-host story at all —
`SURVEY.md` §2.10).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..trackers.visual_state import VisualState


def _local_topk_scores(
    state: VisualState, queries: jax.Array, k: int, kind: str
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Score queries [Q, F] against every local gallery feature.

    Returns (scores[Q, k], scene[Q, k], track_id[Q, k]) of the local top-k.
    Scores are similarities: cosine similarity or negative euclidean distance.
    """
    s, t, g, f = state.feats.shape  # [S, T, K, F] (batched per-shard state)
    feats = state.feats.reshape(s * t * g, f)
    valid = (
        state.feat_valid & state.active[:, :, None]
    ).reshape(s * t * g)
    if kind == "cosine":
        qn = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-9
        )
        fn = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-9
        )
        scores = jnp.dot(qn, fn.T, preferred_element_type=jnp.float32)
    else:
        q2 = jnp.sum(queries * queries, axis=-1)
        f2 = jnp.sum(feats * feats, axis=-1)
        dot = jnp.dot(queries, feats.T, preferred_element_type=jnp.float32)
        scores = -(q2[:, None] + f2[None, :] - 2.0 * dot)  # -squared distance
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    scene_idx = (top_idx // (t * g)).astype(jnp.int32)
    slot_idx = ((top_idx // g) % t).astype(jnp.int32)
    tids = state.track_id[scene_idx, slot_idx]
    return top_scores, scene_idx, tids


def local_gallery_query(cfg_kind: str, k: int, mesh: Mesh):
    """Per-shard gallery scoring WITHOUT the cross-shard merge.

    Same scoring + local top-k as `global_gallery_query`, but each shard
    keeps its own candidate set (outputs concatenated over the shard
    axis: scores[n*Q, k], scene[n*Q, k], track[n*Q, k]).  Used by
    `tools/profile_gallery.py` to separate the scoring cost from the
    all_gather+merge cost (round-5 VERDICT item 5), and useful on its own
    when the caller only needs shard-local matches.
    """
    axes = tuple(mesh.axis_names)

    def local(state, queries):
        return _local_topk_scores(state, queries, k, cfg_kind)

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P()),
        out_specs=(P(axes), P(axes), P(axes)),
        check_vma=False,
    )
    return jax.jit(mapped)


def global_gallery_query(cfg_kind: str, k: int, mesh: Mesh):
    """Build the jitted cross-shard query.

    in: per-shard batched VisualState (scene axis sharded), queries [Q, F]
    (replicated).  out: (scores[Q, k], shard[Q, k], scene[Q, k], track[Q, k])
    of the global top-k, merged from per-shard candidates via all_gather.
    """

    # scenes shard over EVERY mesh axis (1-D scene mesh or 2-D pod mesh,
    # `mesh.pod_scene_spec`); the gather rides all of them
    axes = tuple(mesh.axis_names)

    def local(state, queries):
        scores, scene, tids = _local_topk_scores(state, queries, k, cfg_kind)
        my = jnp.int32(0)
        for a in axes:  # row-major linear shard index (handoff._my_shard)
            my = my * mesh.shape[a] + jax.lax.axis_index(a).astype(jnp.int32)
        shard = jnp.full(scores.shape, my, jnp.int32)
        # gather per-shard top-k candidate sets: [n_shards, Q, k]
        def gather(x):
            for a in reversed(axes):
                x = jax.lax.all_gather(x, a)
            return x.reshape((-1,) + x.shape[len(axes):])

        all_scores = gather(scores)
        all_scene = gather(scene)
        all_tids = gather(tids)
        all_shard = gather(shard)
        n = all_scores.shape[0]
        q = scores.shape[0]
        flat = all_scores.transpose(1, 0, 2).reshape(q, n * k)
        g_scores, g_idx = jax.lax.top_k(flat, k)
        take = lambda a: jnp.take_along_axis(
            a.transpose(1, 0, 2).reshape(q, n * k), g_idx, axis=1
        )
        return g_scores, take(all_shard), take(all_scene), take(all_tids)

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
