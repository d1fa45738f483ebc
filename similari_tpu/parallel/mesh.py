"""Multi-scene / multi-chip execution: vmap within a chip, shard_map across.

The reference scales by thread-per-shard executors and voting worker threads
(`/root/reference/src/track/store.rs:333-346`, `sort/batch_api.rs:68-153`).
The TPU-native equivalent: scenes are the parallel axis — a batch of per-scene
SoA states is vmapped on one chip and sharded over a `jax.sharding.Mesh` axis
across chips.  SORT semantics keep scenes isolated (`sort.rs:250-251`), so the
only collectives are metric reductions (psum) — and, for the visual tracker,
optional cross-shard gallery queries (all_gather), see `parallel/gallery.py`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..trackers.sort_step import SortConfig, sort_step
from ..trackers.state import SortState, new_sort_state
from ..trackers.visual_state import VisualState, new_visual_state
from ..trackers.visual_step import VisualConfig, visual_step

SCENE_AXIS = "scenes"


def scene_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SCENE_AXIS,))


HOST_AXIS = "hosts"
DEVICE_AXIS = "devices"


def pod_mesh(n_hosts: int, devices_per_host: Optional[int] = None) -> Mesh:
    """2-D (hosts, devices) mesh for pod-slice runs.

    Scenes shard over BOTH axes (`pod_scene_spec`): the outer host axis rides
    DCN between hosts, the inner device axis rides ICI — matching the
    scaling-plan layout (streams partitioned across hosts, then across each
    host's chips).  SORT scenes never communicate, so the only DCN traffic is
    the psum'd metrics; gallery queries all_gather over both axes.
    """
    devices = jax.devices()
    if devices_per_host is None:
        devices_per_host = len(devices) // n_hosts
    use = devices[: n_hosts * devices_per_host]
    grid = np.asarray(use).reshape(n_hosts, devices_per_host)
    return Mesh(grid, (HOST_AXIS, DEVICE_AXIS))


def pod_scene_spec() -> P:
    return P((HOST_AXIS, DEVICE_AXIS))


def _sharded_tracker_scan(vstep, mesh: Mesh, n_streams: int):
    """Shared builder for the pod-scale scan pipelines: scan(vmap(step))
    inside shard_map on ANY mesh (1-D scene mesh or 2-D (hosts, devices)
    pod mesh — scenes shard over every mesh axis, `pod_scene_spec`).

    Per-device frame loops with zero cross-device traffic; two psums reduce
    the global new-track and overflow counters — the communication profile
    the scaling plan calls for.  Returns (states, ids, total_new,
    total_overflow).
    """
    axes = tuple(mesh.axis_names)
    entry = axes if len(axes) > 1 else axes[0]
    spec = P(entry)

    def local(states, *streams_and_epochs):
        streams, epochs0 = streams_and_epochs[:-1], streams_and_epochs[-1]

        def body(st, inp):
            *inps, i = inp
            st, out = vstep(st, *inps, epochs0 + i)
            return st, (out.track_id, out.is_new, out.overflow)

        steps = streams[0].shape[0]
        idx = jnp.arange(steps, dtype=jnp.int32)
        states, (ids, is_new, ovf) = jax.lax.scan(
            body, states, (*streams, idx)
        )
        total_new = jax.lax.psum(jnp.sum(is_new.astype(jnp.int32)), axes)
        total_ovf = jax.lax.psum(jnp.sum(ovf.astype(jnp.int32)), axes)
        return states, ids, total_new, total_ovf

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec,) + (P(None, entry),) * n_streams + (spec,),
        out_specs=(spec, P(None, entry), P(), P()),
        # the auction solver builds fresh (unvarying) carries inside the
        # body; skip the varying-manual-axes check rather than pcast them
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def sharded_sort_scan(cfg: SortConfig, mesh: Mesh):
    """Pod-scale SORT pipeline (see _sharded_tracker_scan).

    stream shapes: det_box[S_frames, scenes, D, 5], det_conf/valid
    [S_frames, scenes, D], epochs0[scenes]."""
    return _sharded_tracker_scan(batched_sort_step(cfg), mesh, 3)


def pod_sharded_sort_scan(cfg: SortConfig, mesh: Mesh):
    """Alias kept for API stability: `sharded_sort_scan` handles any mesh."""
    return sharded_sort_scan(cfg, mesh)


def sharded_visual_scan(cfg: VisualConfig, mesh: Mesh):
    """Pod-scale VisualSORT pipeline (see _sharded_tracker_scan).

    stream shapes as `batched_visual_scan` with the scene axis sharded;
    works on 1-D and 2-D pod meshes alike."""
    return _sharded_tracker_scan(batched_visual_step(cfg), mesh, 7)


def batched_sort_step(cfg: SortConfig):
    """vmapped step over a leading scene axis (single device).

    The oriented block-skip path is forced off under vmap: the per-scene
    Pallas clip kernel (ops/pallas_clip.py) is tuned for the single-scene
    recurrence — a scene-batched launch serializes on Mosaic's sequential
    grid (the same reason the batch engines stay on vmapped XLA,
    ARCHITECTURE.md §4d) — and per-scene x-sorting buys nothing when the
    dense clip vectorizes across scenes anyway.

    All arrays gain a leading [S] dim, including per-scene epochs and the
    per-scene `next_id` counters inside the state.
    """
    import dataclasses

    cfg = dataclasses.replace(cfg, oriented_block_sort=False)
    return jax.vmap(partial(sort_step, cfg))


def _chunk_scenes(vstep, chunk: int):
    """Wrap a vmapped step to run the scene axis in sequential chunks.

    Past the saturation knee a single [S]-wide vmap makes XLA materialize
    [S, D, T] temporaries in HBM and throughput *declines* with S
    (ARCHITECTURE.md §4c); chunking bounds the working set to the knee size
    so per-scene cost stays at the knee rate.  `chunk` must divide S.
    """

    def step(states, *args):
        s = jax.tree.leaves(states)[0].shape[0]
        if s <= chunk:
            return vstep(states, *args)
        assert s % chunk == 0, "scene count must be a multiple of the chunk"
        nb = s // chunk

        def resh(a):
            return a.reshape((nb, chunk) + a.shape[1:])

        states_r = jax.tree.map(resh, states)
        args_r = jax.tree.map(resh, args)

        def one(packed):
            st, aa = packed
            return vstep(st, *aa)

        states_o, outs_o = jax.lax.map(one, (states_r, args_r))

        def flat(a):
            return a.reshape((s,) + a.shape[2:])

        return jax.tree.map(flat, states_o), jax.tree.map(flat, outs_o)

    return step


def batched_sort_step_chunked(cfg: SortConfig, chunk: int):
    """Scene-chunked batched step (see _chunk_scenes)."""
    return _chunk_scenes(batched_sort_step(cfg), chunk)


def new_batched_state(n_scenes: int, capacity: int, history: int) -> SortState:
    one = new_sort_state(capacity, history)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_scenes,) + a.shape).copy(), one
    )


def sharded_sort_step(cfg: SortConfig, mesh: Mesh):
    """shard_map'd batch step: scenes sharded over the mesh axis.

    Includes a psum'd global new-track count so a real ICI collective is part
    of the compiled program (the scenes themselves never communicate — that is
    the correct sharding for SORT semantics, not a simplification).
    """
    vstep = batched_sort_step(cfg)

    def local(state, det_box, det_conf, det_valid, epochs):
        state, out = vstep(state, det_box, det_conf, det_valid, epochs)
        new_tracks = jax.lax.psum(
            jnp.sum(out.is_new.astype(jnp.int32)), SCENE_AXIS
        )
        return state, out, new_tracks

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS), P(SCENE_AXIS), P(SCENE_AXIS), P(SCENE_AXIS), P(SCENE_AXIS)),
        out_specs=(P(SCENE_AXIS), P(SCENE_AXIS), P()),
        # the auction solver builds fresh (unvarying) carries inside the body;
        # skip the varying-manual-axes check rather than pcast every carry
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))


def batched_sort_scan(cfg: SortConfig):
    """Device pipeline over frames for a batch of scenes: scan(vmap(step)).

    stream shapes: det_box[S, SC, D, 5], det_conf/valid[S, SC, D], epochs0[SC].
    """
    vstep = batched_sort_step(cfg)

    def scan_fn(states, det_box, det_conf, det_valid, epochs0):
        def body(st, inp):
            box, conf, valid, i = inp
            st, out = vstep(st, box, conf, valid, epochs0 + i)
            return st, (out.track_id, out.overflow)

        steps = det_box.shape[0]
        idx = jnp.arange(steps, dtype=jnp.int32)
        return jax.lax.scan(body, states, (det_box, det_conf, det_valid, idx))

    return scan_fn


def shard_batched_state(state, mesh: Mesh):
    """Place a batched state with the scene axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(SCENE_AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), state)


# --------------------------------------------------------------------------
# VisualSORT flavors
# --------------------------------------------------------------------------

def batched_visual_step(cfg: VisualConfig):
    return jax.vmap(partial(visual_step, cfg))


def batched_visual_step_inplace(cfg: VisualConfig, interpret: bool = False):
    """Batched step with the big feature merges done IN PLACE.

    The per-scene step defers its gallery-lane and history-ring feature
    writes (`visual_step_deferred`); this wrapper applies them across all
    scenes with ONE Pallas row-DMA kernel each (`ops/pallas_merge.py`):
    the [S,T,K,F]/[S,T,H,F] arrays stay in HBM, aliased input->output,
    and only the D touched rows per scene move — instead of the XLA
    one-hot merge's full-array read+rewrite (~28% of the step,
    ARCHITECTURE §4c).  Id-exact with `batched_visual_step`
    (tests/test_pallas_merge.py).
    """
    import dataclasses as _dc

    from ..ops.pallas_merge import lane_merge_inplace
    from ..trackers.visual_step import visual_step_deferred

    vstep = jax.vmap(partial(visual_step_deferred, cfg))

    def step(states, *args):
        states, out, (src, rowf, maskf, rowh, maskh) = vstep(states, *args)
        s, t, k, f = states.feats.shape
        h = states.hist_feat.shape[2]
        feats = lane_merge_inplace(
            states.feats.reshape(s, t * k, f), src, rowf, maskf,
            interpret=interpret).reshape(s, t, k, f)
        hist = lane_merge_inplace(
            states.hist_feat.reshape(s, t * h, f), src, rowh, maskh,
            interpret=interpret).reshape(s, t, h, f)
        return _dc.replace(states, feats=feats, hist_feat=hist), out

    return step


def batched_visual_step_chunked(cfg: VisualConfig, chunk: int):
    """Scene-chunked batched VisualSORT step (see _chunk_scenes)."""
    return _chunk_scenes(batched_visual_step(cfg), chunk)


def new_batched_visual_state(
    n_scenes: int, capacity: int, history: int, gallery: int, feature_dim: int,
    feature_dtype=jnp.float32,
) -> VisualState:
    one = new_visual_state(capacity, history, gallery, feature_dim,
                           feature_dtype=feature_dtype)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a, (n_scenes,) + a.shape).copy(), one
    )


def batched_visual_scan(cfg: VisualConfig):
    """Device pipeline over frames for a batch of scenes (VisualSORT).

    stream shapes: box[S, SC, D, 5], conf/valid/fvalid/qual/oa[S, SC, D],
    feat[S, SC, D, F], epochs0[SC].  Returns
    (states, (track_id, voting_type, overflow)) stacked over frames.
    """
    vstep = batched_visual_step(cfg)

    def scan_fn(states, box, conf, valid, feat, fvalid, qual, oa, epochs0):
        def body(st, inp):
            b, c, v, fe, fv, q, o, i = inp
            st, out = vstep(st, b, c, v, fe, fv, q, o, epochs0 + i)
            return st, (out.track_id, out.voting_type, out.overflow)

        steps = box.shape[0]
        idx = jnp.arange(steps, dtype=jnp.int32)
        return jax.lax.scan(
            body, states, (box, conf, valid, feat, fvalid, qual, oa, idx)
        )

    return scan_fn


def sharded_visual_step(cfg: VisualConfig, mesh: Mesh):
    """shard_map'd VisualSORT batch step over the scene mesh (+psum stats)."""
    vstep = batched_visual_step(cfg)

    def local(state, box, conf, valid, feat, fvalid, qual, oa, epochs):
        state, out = vstep(state, box, conf, valid, feat, fvalid, qual, oa, epochs)
        new_tracks = jax.lax.psum(
            jnp.sum(out.is_new.astype(jnp.int32)), SCENE_AXIS
        )
        return state, out, new_tracks

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(SCENE_AXIS),) * 9,
        out_specs=(P(SCENE_AXIS), P(SCENE_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,))
