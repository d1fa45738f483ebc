"""Pallas oriented-IoU kernel with `too_far` block skipping.

The dense Green's-theorem clip (`geometry.quad_intersection_area`) costs
~700 flops/pair and is ~60% of the oriented SORT step at 500x2000
(ARCHITECTURE.md §4d).  The reference prunes per pair with `too_far`
(`/root/reference/src/utils/bbox.rs:452-462`) — worthless to a dense SIMD
program.  This kernel recovers the prune the TPU way: grid over
[BD, BT] = 128x128 tiles of the pair matrix, each tile first evaluates the
~10-flop `too_far` test for its pairs, and only tiles containing ANY
in-radius pair run the ~700-flop boundary-integral clip (`@pl.when` —
Mosaic's grid is sequential per core, so skipped tiles genuinely save
time).  Feeding it x-SORTED detections and tracks (see
`sort_step._match_sorted`) concentrates the in-radius pairs near the
diagonal band, so on tracking-shaped scenes most tiles skip.

Inputs are preprocessed per box into 8 derived columns (centers, two
corner-offset vectors, radius, area) so the kernel does no trig; the pair
recentring of `geometry.rotated_intersection` becomes vertex = offset ±
0.5*(center delta), algebraically identical with [BD, BT]-rank
temporaries only.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BD = 128
_BT = 128


def clip_columns(boxes: jax.Array) -> jax.Array:
    """vec5 [..., 5] -> derived clip columns [..., 8]:
    (xc, yc, r1x, r1y, r2x, r2y, radius, area) — r1/r2 as in
    `geometry.box_vertices` (corners are +r1, +r2, -r1, -r2)."""
    angle = boxes[..., 2]
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    hw = boxes[..., 3] * boxes[..., 4] * 0.5
    hh = boxes[..., 4] * 0.5
    r1x = -hw * c - hh * s
    r1y = -hw * s + hh * c
    r2x = hw * c - hh * s
    r2y = hw * s + hh * c
    radius = jnp.sqrt(hw * hw + hh * hh)
    area = boxes[..., 3] * boxes[..., 4] * boxes[..., 4]
    return jnp.stack(
        [boxes[..., 0], boxes[..., 1], r1x, r1y, r2x, r2y, radius, area],
        axis=-1,
    )


def _pair_integral(ax, ay, bx, by, tie_pass):
    """Boundary integral of A's edges clipped to B (geometry semantics).

    ax/ay: 4-lists of [BD, BT] vertex coordinates of A (already recentred
    per pair); bx/by: same for B.  Unrolled 4 edges x 4 halfplanes.
    """
    total = None
    for i in range(4):
        sx = ax[i]
        sy = ay[i]
        dex = ax[(i + 1) % 4] - sx
        dey = ay[(i + 1) % 4] - sy
        t0 = jnp.zeros_like(sx)
        t1 = jnp.ones_like(sx)
        ok = jnp.ones(sx.shape, jnp.bool_)
        for h in range(4):
            px = bx[h]
            py = by[h]
            dx = bx[(h + 1) % 4] - px
            dy = by[(h + 1) % 4] - py
            a = dx * (sy - py) - dy * (sx - px)
            b = dx * dey - dy * dex
            tt = -a / jnp.where(b == 0.0, 1.0, b)
            t0 = jnp.where(b < 0.0, jnp.maximum(t0, tt), t0)
            t1 = jnp.where(b > 0.0, jnp.minimum(t1, tt), t1)
            para_out = (b == 0.0) & (a > 0.0)
            if tie_pass:
                same_dir = dx * dex + dy * dey >= 0.0
                para_out = para_out | ((b == 0.0) & (a == 0.0) & same_dir)
            ok = ok & ~para_out
        p0x = sx + t0 * dex
        p0y = sy + t0 * dey
        p1x = sx + t1 * dex
        p1y = sy + t1 * dey
        contrib = jnp.where(ok & (t1 > t0), p0x * p1y - p0y * p1x, 0.0)
        total = contrib if total is None else total + contrib
    return total


def _pair_block(det_ref, trk_ref, out_ref, want_iou: bool):
    """det_ref [BD, 8] clip columns; trk_ref [8, BT] (transposed columns);
    out_ref [BD, BT] IoU or raw intersection area (0 where empty/too_far)."""
    dxc = det_ref[:, 0:1]  # [BD, 1]
    dyc = det_ref[:, 1:2]
    drad = det_ref[:, 6:7]
    darea = det_ref[:, 7:8]
    txc = trk_ref[0:1, :]  # [1, BT]
    tyc = trk_ref[1:2, :]
    trad = trk_ref[6:7, :]
    tarea = trk_ref[7:8, :]

    ddx = dxc - txc  # [BD, BT] center delta (a - b)
    ddy = dyc - tyc
    md = drad + trad
    far = ddx * ddx + ddy * ddy > md * md

    @pl.when(jnp.all(far))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(jnp.all(far)))
    def _():
        hx = 0.5 * ddx  # a_center - midpoint; b_center - midpoint = -hx
        hy = 0.5 * ddy
        # A corners: +r1, +r2, -r1, -r2 around hx/hy (geometry order)
        a_r1x = det_ref[:, 2:3]
        a_r1y = det_ref[:, 3:4]
        a_r2x = det_ref[:, 4:5]
        a_r2y = det_ref[:, 5:6]
        ax = [hx + a_r1x, hx + a_r2x, hx - a_r1x, hx - a_r2x]
        ay = [hy + a_r1y, hy + a_r2y, hy - a_r1y, hy - a_r2y]
        b_r1x = trk_ref[2:3, :]
        b_r1y = trk_ref[3:4, :]
        b_r2x = trk_ref[4:5, :]
        b_r2y = trk_ref[5:6, :]
        bx = [b_r1x - hx, b_r2x - hx, -b_r1x - hx, -b_r2x - hx]
        by = [b_r1y - hy, b_r2y - hy, -b_r1y - hy, -b_r2y - hy]
        s = _pair_integral(ax, ay, bx, by, False) + _pair_integral(
            bx, by, ax, ay, True
        )
        inter = jnp.where(far, 0.0, jnp.abs(s) * 0.5)
        if want_iou:
            # union > 0 guard: a degenerate (zero-area) box near a real one
            # is NOT too_far, clips to the full real-box area, and leaves
            # union at +-1 ulp of zero — unguarded, that division emitted
            # ~1e7-magnitude garbage IoU (round-4 review repro).  In exact
            # math inter <= min(area) <= union, so the guard only fires on
            # degenerate/garbage rows, which must come out 0.
            union = darea + tarea - inter
            pos = (inter > 0.0) & (union > 0.0)
            out_ref[:] = jnp.where(
                pos, inter / jnp.where(pos, union, 1.0), 0.0
            )
        else:
            out_ref[:] = inter


@lru_cache(maxsize=None)
def _compiled_call(d: int, t: int, interpret: bool, want_iou: bool = True):
    return pl.pallas_call(
        partial(_pair_block, want_iou=want_iou),
        grid=(d // _BD, t // _BT),
        in_specs=[
            pl.BlockSpec((_BD, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _BT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BD, _BT), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, t), jnp.float32),
        interpret=interpret,
    )


def oriented_iou_blockskip(det_box: jax.Array, trk_box: jax.Array,
                           interpret: bool = False):
    """Pairwise rotated IoU det[D,5] x trk[T,5] -> (iou[D,T], valid[D,T])
    via the block-skip kernel.  D and T are padded to 128 internally and
    degenerate (zero-area) rows come out as exactly 0/invalid (the kernel
    guards the union division); callers still mask padded rows/columns
    for semantic correctness."""
    d = det_box.shape[0]
    t = trk_box.shape[0]
    dpad = -(-d // _BD) * _BD
    tpad = -(-t // _BT) * _BT
    det8 = clip_columns(det_box)
    trk8 = clip_columns(trk_box)
    if dpad != d:
        det8 = jnp.pad(det8, ((0, dpad - d), (0, 0)))
    if tpad != t:
        trk8 = jnp.pad(trk8, ((0, tpad - t), (0, 0)))
    iou = _compiled_call(dpad, tpad, interpret)(det8, trk8.T)
    iou = iou[:d, :t]
    return iou, iou > 0.0


def oriented_inter_blockskip(det_box: jax.Array, trk_box: jax.Array,
                             interpret: bool = False):
    """Pairwise rotated intersection AREA via the block-skip kernel
    (the NMS overlap criterion needs inter/area_j, not IoU)."""
    d = det_box.shape[0]
    t = trk_box.shape[0]
    dpad = -(-d // _BD) * _BD
    tpad = -(-t // _BT) * _BT
    det8 = clip_columns(det_box)
    trk8 = clip_columns(trk_box)
    if dpad != d:
        det8 = jnp.pad(det8, ((0, dpad - d), (0, 0)))
    if tpad != t:
        trk8 = jnp.pad(trk8, ((0, tpad - t), (0, 0)))
    inter = _compiled_call(dpad, tpad, interpret, want_iou=False)(
        det8, trk8.T)
    return inter[:d, :t]
