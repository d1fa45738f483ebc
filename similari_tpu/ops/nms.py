"""Batched NMS kernel: rank-sorted greedy suppression on device.

Re-design of the reference scalar loop (`/root/reference/src/utils/nms.rs:32-72`)
for the TPU: the full pairwise rotated-intersection matrix is computed in one
shot (vectorized Sutherland–Hodgman), then the sequential greedy pass runs as a
`fori_loop` over rows of the precomputed suppression matrix — O(N) tiny steps
over on-chip data instead of O(N^2) scalar polygon clips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import geometry as geo


@partial(jax.jit, static_argnames=("oriented", "neighbors", "block_skip"))
def nms_kernel(boxes: jax.Array, valid: jax.Array,
               nms_threshold, oriented: bool = True, neighbors: int = -1,
               block_skip=None):
    """boxes[N,5] already rank-sorted descending; returns keep mask [N].
    (Rank order IS the positional order — the caller sorts.)

    suppress[i, j] (i before j in rank order): intersection(i, j)/area(j)
    > threshold — the reference's asymmetric overlap criterion (`nms.rs:60-63`).

    `oriented` is a STATIC flag like SortConfig.oriented (never a per-pair
    angle test — the reference's bug #84 class): False selects the exact
    ~10-op axis-aligned intersection instead of the ~700-op general clip.

    `neighbors`: radius-pruned top-k clip for the oriented path (the
    reference's per-pair `too_far` prune, `nms.rs:56-58` via `bbox.rs:476-485`,
    recast as one top-k per row).  Measured NEGATIVE on v5e at bench scales
    (the [N,K,N] one-hot select outweighs the clip saved — ARCHITECTURE.md
    §4d), so auto (-1) currently resolves to dense; 0 = dense, >0 forces.

    `block_skip`: the round-4 prune that measured POSITIVE — x-sort the
    boxes and compute the intersection matrix with the Pallas
    `too_far`-tile-skip kernel, running the suppression fixpoint in sorted
    space with ranks as payload (only the [N] keep vector is unsorted).
    None = auto (TPU, oriented, n >= 512), True/False force.
    """
    n = boxes.shape[0]
    if neighbors < 0:
        neighbors = 0
    rank = jnp.arange(n, dtype=jnp.int32)
    unsort = None
    # auto gate measured on v5e (bench shapes, spread 500): x1.58 at 1000,
    # x1.11 at 500, x0.71 at 300 (sort + kernel overheads beat the savings
    # below ~500 boxes), so auto engages at n >= 512
    use_block = (
        block_skip is True
        or (block_skip is None and oriented and neighbors == 0 and n >= 512
            and jax.default_backend() == "tpu")
    )
    if use_block and oriented:
        # round-4 block-skip route (same design as sort_step._match_sorted):
        # x-sort the boxes so in-radius pairs form a diagonal band, compute
        # the intersection matrix with the Pallas `too_far`-tile-skip kernel,
        # and run the suppression fixpoint IN SORTED SPACE — rank order
        # rides along as a payload (`earlier` compares ranks, not indices),
        # so only the [N] keep vector is unsorted at the end; no [N, N]
        # unpermute exists anywhere.
        from .pallas_clip import oriented_inter_blockskip

        big = jnp.float32(3.0e38)
        key = jnp.where(valid, boxes[:, 0], big)
        (_, bx, by, ba, bas, bh, val_i, rank_s) = jax.lax.sort(
            (key, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
             boxes[:, 4], valid.astype(jnp.int32), rank),
            num_keys=1,
        )
        boxes = jnp.stack([bx, by, ba, bas, bh], axis=-1)
        valid = val_i.astype(bool)
        rank = rank_s
        unsort = rank_s
        inter = oriented_inter_blockskip(
            boxes, boxes, interpret=jax.default_backend() != "tpu")
    elif oriented and 0 < neighbors < n:
        # +1: the self-pair (distance 0) always occupies one top-k slot on
        # the a == b route, so k genuine partners need k+1 slots
        inter = geo.rotated_intersection_topk(boxes, boxes,
                                              min(neighbors + 1, n))
    elif oriented:
        inter = geo.rotated_intersection(boxes[:, None, :], boxes[None, :, :])
    else:
        inter = geo.aligned_intersection(boxes[:, None, :], boxes[None, :, :])
    metric = inter / geo.box_area(boxes)[None, :]
    earlier = rank[:, None] < rank[None, :]
    suppress = (
        earlier & (metric > nms_threshold) & valid[:, None] & valid[None, :]
    )

    # Greedy keep[i] = valid[i] & no kept j<i suppressing i.  A fori_loop over
    # rows is O(N) tiny sequential steps (loop overhead dominates on TPU);
    # instead run the Jacobi fixpoint keep' = valid & ~any_j(keep[j] & sup[j,i])
    # — each round settles every box whose suppression chain is one longer, so
    # it converges to the exact greedy solution in chain-depth rounds
    # (typically <= 3).  A few rounds run unrolled; a while_loop tail
    # guarantees the fixpoint on pathological chains.
    def one(keep):
        return valid & ~jnp.any(suppress & keep[:, None], axis=0)

    keep = valid
    for _ in range(4):
        keep = one(keep)

    def cond(c):
        keep, prev = c
        return jnp.any(keep != prev)

    def body(c):
        keep, _ = c
        return one(keep), keep

    keep, _ = jax.lax.while_loop(cond, body, (one(keep), keep))
    if unsort is not None:
        # back to the caller's rank order: sort (rank, keep) by rank
        (_, keep_i) = jax.lax.sort(
            (unsort, keep.astype(jnp.int32)), num_keys=1)
        keep = keep_i.astype(bool)
    return keep
