"""Block-skip oriented IoU kernel (ops/pallas_clip.py) + sorted match path.

Runs in Pallas interpret mode on the CPU test mesh; the compiled kernel is
exercised on the real chip by bench.py (sort_iou_oriented_* configs).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from similari_tpu.ops import geometry as geo
from similari_tpu.ops.pallas_clip import clip_columns, oriented_iou_blockskip


def _boxes(rng, n, spread=900.0):
    b = np.zeros((n, 5), np.float32)
    b[:, 0] = rng.uniform(0, spread, n)
    b[:, 1] = rng.uniform(0, spread, n)
    b[:, 2] = rng.uniform(0, 2 * np.pi, n)
    b[:, 3] = rng.uniform(0.4, 2.5, n)
    b[:, 4] = rng.uniform(15, 60, n)
    return b


def test_clip_columns_match_geometry():
    rng = np.random.default_rng(0)
    b = jnp.asarray(_boxes(rng, 64))
    cols = clip_columns(b)
    np.testing.assert_allclose(
        np.asarray(cols[:, 6]), np.asarray(geo.box_radius(b)), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cols[:, 7]), np.asarray(geo.box_area(b)), rtol=1e-6)
    verts = np.asarray(geo.box_vertices(b))
    np.testing.assert_allclose(
        np.asarray(cols[:, 0]) + np.asarray(cols[:, 2]),
        verts[:, 0, 0], rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("d,t", [(130, 300), (64, 128)])
def test_blockskip_iou_matches_dense_kernel(d, t):
    """The block-skip kernel must reproduce the dense Green's-theorem IoU
    (same clip region; recentring is algebraically identical)."""
    rng = np.random.default_rng(3)
    det = jnp.asarray(_boxes(rng, d))
    trk = jnp.asarray(_boxes(rng, t))
    iou_blk, valid_blk = oriented_iou_blockskip(det, trk, interpret=True)
    iou_ref, valid_ref = geo.universal_iou_matrix(det, trk, oriented=True)
    iou_blk = np.asarray(iou_blk)
    iou_ref = np.asarray(iou_ref)
    np.testing.assert_allclose(iou_blk, iou_ref, rtol=2e-4, atol=2e-4)
    # masks agree except where the IoU itself is borderline-zero
    diff = np.asarray(valid_blk) != np.asarray(valid_ref)
    assert np.all(iou_ref[diff] < 1e-4)


def test_blockskip_skips_far_blocks_to_exact_zero():
    """Two clusters far apart: every cross block is all-far and must come
    back exactly 0 (the skip branch writes zeros, not garbage)."""
    rng = np.random.default_rng(4)
    det = _boxes(rng, 64, spread=200.0)
    trk = _boxes(rng, 128, spread=200.0)
    trk[:, 0] += 100000.0  # far away in x
    iou, valid = oriented_iou_blockskip(
        jnp.asarray(det), jnp.asarray(trk), interpret=True)
    assert not bool(np.asarray(valid).any())
    assert float(np.abs(np.asarray(iou)).max()) == 0.0


def test_sorted_match_path_matches_plain_step():
    """sort_step with oriented_block_sort (x-sorted views + block-skip
    kernel) must track identically to the plain dense path."""
    from similari_tpu.trackers.sort_step import SortConfig, compiled_sort_step
    from similari_tpu.trackers.state import new_sort_state

    rng = np.random.default_rng(11)
    d, t, steps = 64, 512, 6
    base = _boxes(rng, d, spread=2500.0)

    def run(block_sort):
        cfg = SortConfig(method="iou", assignment="hungarian", oriented=True,
                         max_idle_epochs=5, oriented_block_sort=block_sort)
        step = compiled_sort_step(cfg)
        state = new_sort_state(t, 1)
        rng2 = np.random.default_rng(12)
        outs = []
        boxes = base.copy()
        for e in range(1, steps + 1):
            boxes[:, :2] += rng2.uniform(-3, 3, (d, 2)).astype(np.float32)
            boxes[:, 2] += rng2.uniform(-0.03, 0.03, d).astype(np.float32)
            conf = rng2.uniform(0.5, 1.0, d).astype(np.float32)
            valid = np.ones((d,), bool)
            valid[rng2.integers(0, d, 5)] = False  # padding rows mid-frame
            state, out = step(state, jnp.asarray(boxes), jnp.asarray(conf),
                              jnp.asarray(valid), jnp.int32(e))
            outs.append((np.asarray(out.track_id), np.asarray(out.is_new),
                         np.asarray(out.slot)))
        return outs

    plain = run(False)
    sorted_ = run(True)
    for e, ((pi, pn, ps), (si, sn, ss)) in enumerate(zip(plain, sorted_)):
        np.testing.assert_array_equal(pi, si, err_msg=f"ids step {e}")
        np.testing.assert_array_equal(pn, sn, err_msg=f"is_new step {e}")
        np.testing.assert_array_equal(ps, ss, err_msg=f"slots step {e}")


def test_nms_block_skip_matches_dense():
    """Sorted block-skip NMS (round 4) must keep exactly the same boxes as
    the dense kernel — the fixpoint runs in sorted space with rank-payload
    ordering, so the greedy result is order-identical."""
    from similari_tpu.ops.nms import nms_kernel

    rng = np.random.default_rng(5)
    for n, frac in ((64, 1.0), (300, 0.9)):
        b = _boxes(rng, n, spread=60.0 * np.sqrt(n))
        valid = rng.uniform(size=n) < frac
        boxes = jnp.asarray(b)
        v = jnp.asarray(valid)
        dense = nms_kernel(boxes, v, jnp.float32(0.7), True,
                           block_skip=False)
        blk = nms_kernel(boxes, v, jnp.float32(0.7), True, block_skip=True)
        np.testing.assert_array_equal(np.asarray(dense), np.asarray(blk),
                                      err_msg=f"n={n}")


def test_degenerate_box_iou_is_exact_zero():
    """Round-4 review repro: a zero-area box near a real one is NOT too_far,
    clips to the full real-box area, and leaves union at ±1 ulp of zero —
    the unguarded division emitted ~1e7-magnitude IoU.  All three engines
    (Pallas kernel, dense XLA, NumPy host) must return 0/invalid."""
    from similari_tpu.trackers.host_geometry import rotated_iou_matrix_np

    real = np.array([[5.0, 0.0, 0.3, 1.5, 30.0]], np.float32)
    degen = np.array([[0.0, 0.0, 0.0, 0.0, 0.0],   # zero everything
                      [2.0, 1.0, 0.5, 2.0, 0.0],   # zero height
                      [3.0, 0.0, 0.1, 0.0, 25.0]], np.float32)  # zero aspect
    # zero-area boxes must never explode (the unguarded division gave
    # |iou| ~ 1e7); roundoff-scale positives (~1e-9, from clipping against
    # a zero-width segment quad) are acceptable — they are below any
    # usable IoU threshold
    iou_blk, _ = oriented_iou_blockskip(
        jnp.asarray(real), jnp.asarray(degen), interpret=True)
    assert float(np.abs(np.asarray(iou_blk)).max()) < 1e-6
    iou_xla, _ = geo.universal_iou_matrix(
        jnp.asarray(real), jnp.asarray(degen), oriented=True)
    assert float(np.abs(np.asarray(iou_xla)).max()) < 1e-6
    iou_np, _ = rotated_iou_matrix_np(real, degen)
    assert float(np.abs(iou_np).max()) < 1e-6
