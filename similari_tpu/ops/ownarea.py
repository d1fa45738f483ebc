"""Device kernel for exclusively-owned box areas (occlusion gating).

Reference semantics: `/root/reference/src/utils/clipping/bbox_own_areas.rs:8-46`
computes, for every box in a detection set, the area not covered by any other
box (rayon-parallel polygon boolean differences), and the normalized share
`own_area / area` clamped to 1.0.  VisualSort runs this over every frame's
detections when own-area gating is enabled
(`visual_sort/simple_api.rs:111-127`).

TPU-native design: the union coverage is expanded by inclusion-exclusion

    |B_i ∩ ∪_j B_j| = Σ_j |B_i∩B_j| − Σ_{j<k} |B_i∩B_j∩B_k| + …

where every term is the area of an intersection of convex quads, computed in
closed form by a Green's-theorem boundary integral (`intersection_area_k`
below, the K-polygon generalization of `geometry.quad_intersection_area`):
each quad's edges are Liang-Barsky clipped against the other quads' halfplanes
and contribute `cross(p(t0), p(t1))` to the contour integral.  Everything is
fixed-shape elementwise VPU work — no polygon vertex lists, no host callbacks,
vmappable over scenes for the batch engines.

The expansion is truncated at a static `order` (max quads per term) over each
box's top-`neighbors` overlapping boxes (selected by pairwise intersection
area; the pairwise term itself is always computed over *all* boxes).  The
result is exact whenever no point of a box is covered by more than `order − 1`
of its top neighbors simultaneously — true for realistic occlusion patterns —
and otherwise obeys the Bonferroni brackets: an odd number of expansion terms
(even `order`) underestimates the own area, an even number (odd `order`)
overestimates it.  The host f64 oracle (`utils/clipping.py`) remains the exact
reference; parity is property-tested in `tests/test_ownarea.py`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import geometry as geo

EPS = 1e-5  # matches `src/lib.rs:80` and utils/clipping.py


def intersection_area_k(quads: jax.Array) -> jax.Array:
    """Area of the intersection of K convex quads: [..., K, 4, 2] -> [...].

    Generalizes `geometry.quad_intersection_area` (K=2) — same Liang-Barsky
    boundary integral, with each quad's edges clipped against the 4(K−1)
    halfplanes of the others.  Quads must be consistently wound (CW, as
    produced by `geometry.box_vertices`; inside = cross <= 0, matching
    `clipping.rs:12-15`).

    Collinear-edge tie-break (degenerate inputs like duplicated boxes): a
    segment lying exactly on another quad's boundary is kept only when that
    quad has a *higher* stack index, or when traversed in the opposite
    direction — so each shared boundary segment is counted exactly once (by
    the lowest-index quad that owns it) while the two opposing traversals of
    a touching edge (zero-area intersection) cancel.
    """
    k = quads.shape[-3]
    total = jnp.zeros(quads.shape[:-3], quads.dtype)
    for m in range(k):
        a_quad = quads[..., m, :, :]
        for i in range(4):
            sx = a_quad[..., i, 0]
            sy = a_quad[..., i, 1]
            ex = a_quad[..., (i + 1) % 4, 0]
            ey = a_quad[..., (i + 1) % 4, 1]
            dex = ex - sx
            dey = ey - sy
            t0 = jnp.zeros_like(sx)
            t1 = jnp.ones_like(sx)
            ok = jnp.ones(sx.shape, bool)
            for mp in range(k):
                if mp == m:
                    continue
                b_quad = quads[..., mp, :, :]
                tie = mp < m
                for h in range(4):
                    px = b_quad[..., h, 0]
                    py = b_quad[..., h, 1]
                    dx = b_quad[..., (h + 1) % 4, 0] - px
                    dy = b_quad[..., (h + 1) % 4, 1] - py
                    fa = dx * (sy - py) - dy * (sx - px)  # f(s); inside <= 0
                    fb = dx * dey - dy * dex  # df/dt along the edge
                    tt = -fa / jnp.where(fb == 0.0, 1.0, fb)
                    t0 = jnp.where(fb < 0.0, jnp.maximum(t0, tt), t0)
                    t1 = jnp.where(fb > 0.0, jnp.minimum(t1, tt), t1)
                    para_out = (fb == 0.0) & (fa > 0.0)
                    if tie:
                        same_dir = dx * dex + dy * dey >= 0.0
                        para_out = para_out | (
                            (fb == 0.0) & (fa == 0.0) & same_dir
                        )
                    ok = ok & ~para_out
            p0x = sx + t0 * dex
            p0y = sy + t0 * dey
            p1x = sx + t1 * dex
            p1y = sy + t1 * dey
            contrib = p0x * p1y - p0y * p1x
            total = total + jnp.where(ok & (t1 > t0), contrib, 0.0)
    return jnp.abs(total) * 0.5


@partial(jax.jit, static_argnames=("order", "neighbors"))
def own_area_shares(
    boxes: jax.Array,  # [D, 5] (xc, yc, angle, aspect, height)
    valid: jax.Array,  # [D] bool
    order: int = 3,
    neighbors: int = 8,
) -> jax.Array:
    """Normalized exclusively-owned-area shares, `bbox_own_areas.rs:36-46`.

    Returns [D] with share_i = max(area_i − |B_i ∩ ∪_{j≠i} B_j|, 0) / area_i
    clamped to [0, 1]; invalid rows get share 1.0 (the gate-neutral value the
    trackers use when own-area gating is off).
    """
    d = boxes.shape[0]
    dtype = boxes.dtype
    area = geo.box_area(boxes)

    # Per-row recentring: all terms for box i live in box i's frame, which
    # keeps f32 exact at large scene coordinates (same trick as
    # `geometry.rotated_intersection`).
    centers = boxes[:, :2]
    shifted = jnp.concatenate(
        [
            boxes[None, :, :2] - centers[:, None, :],
            jnp.broadcast_to(boxes[None, :, 2:], (d, d, 3)),
        ],
        axis=-1,
    )  # [D, D, 5]: box j seen from box i
    verts = geo.box_vertices(shifted)  # [D, D, 4, 2]
    self_q = geo.box_vertices(
        jnp.concatenate([jnp.zeros((d, 2), dtype), boxes[:, 2:]], axis=-1)
    )  # [D, 4, 2] box i in its own frame

    pair_mask = (
        valid[:, None]
        & valid[None, :]
        & ~jnp.eye(d, dtype=bool)
        & ~geo.too_far(boxes[:, None, :], boxes[None, :, :])
    )
    pair = jnp.where(
        pair_mask,
        geo.quad_intersection_area(self_q[:, None], verts),
        0.0,
    )  # [D, D]
    covered = jnp.sum(pair, axis=1)

    m = min(neighbors, d - 1)
    if order >= 3 and m >= 2:
        # top-M overlapping neighbors per box, fetched with a one-hot
        # contraction (vmapped dynamic gathers serialize on TPU)
        nbr_area, nbr_idx = jax.lax.top_k(pair, m)  # [D, M]
        nbr_live = nbr_area > 0.0
        onehot = (
            (nbr_idx[:, :, None] == jnp.arange(d, dtype=jnp.int32)[None, None])
            & nbr_live[:, :, None]
        ).astype(dtype)  # [D, M, D]
        nq = jnp.einsum("imj,ijkc->imkc", onehot, verts)  # [D, M, 4, 2]

        def subset_area(size):
            """Σ over {n_1 < … < n_size} of |B_i ∩ B_{n_1} ∩ … ∩ B_{n_size}|.

            Axes: [D, m_1, …, m_size]; inserting singleton axes via reshape
            never reorders data, so everything is broadcast, no gathers.
            """
            full = [d] + [m] * size
            members = [
                jnp.broadcast_to(
                    self_q.reshape([d] + [1] * size + [4, 2]), full + [4, 2]
                )
            ]
            live = jnp.ones(full, bool)
            for pos in range(size):
                qshape = [d] + [1] * size + [4, 2]
                qshape[1 + pos] = m
                members.append(jnp.broadcast_to(nq.reshape(qshape), full + [4, 2]))
                lshape = [d] + [1] * size
                lshape[1 + pos] = m
                live = live & nbr_live.reshape(lshape)
            # strictly increasing slot tuples only (each subset once)
            iotas = []
            for pos in range(size):
                ishape = [1] * (1 + size)
                ishape[1 + pos] = m
                iotas.append(jnp.arange(m).reshape(ishape))
            for pos in range(size - 1):
                live = live & (iotas[pos] < iotas[pos + 1])
            quads = jnp.stack(members, axis=-3)  # [D, m…, size+1, 4, 2]
            return jnp.sum(
                jnp.where(live, intersection_area_k(quads), 0.0),
                axis=tuple(range(1, 1 + size)),
            )

        sign = 1.0
        for size in range(2, order):  # subsets of `size` neighbors
            sign = -sign
            covered = covered + sign * subset_area(size)

    own = jnp.maximum(area - covered, 0.0)
    share = jnp.clip(own / (area + EPS), 0.0, 1.0)
    return jnp.where(valid, share, 1.0).astype(dtype)
