"""Geometry kernel tests: SH clip, rotated IoU, gating — vs goldens and Monte Carlo.

Goldens from `/root/reference/src/utils/bbox.rs:332-381,437-449`.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from similari_tpu.ops import geometry as G
from similari_tpu.utils.bbox import BoundingBox, Universal2DBox


def vec5(*args):
    return jnp.asarray(np.array(args, np.float32))


def mc_intersection(b1, b2, n=512):
    """Monte-Carlo (dense grid) intersection area of two rotated boxes."""

    def inside(b, px, py):
        a = b[2]
        c, s = math.cos(a), math.sin(a)
        dx, dy = px - b[0], py - b[1]
        # rotate into box frame
        lx = c * dx + s * dy
        ly = -s * dx + c * dy
        hw, hh = b[3] * b[4] / 2, b[4] / 2
        return (np.abs(lx) <= hw) & (np.abs(ly) <= hh)

    xs = [b[0] for b in (b1, b2)]
    ys = [b[1] for b in (b1, b2)]
    r = max(G.EPS, *(float(np.hypot(b[3] * b[4], b[4])) for b in (b1, b2)))
    x0, x1 = min(xs) - r, max(xs) + r
    y0, y1 = min(ys) - r, max(ys) + r
    gx, gy = np.meshgrid(np.linspace(x0, x1, n), np.linspace(y0, y1, n))
    m = inside(b1, gx, gy) & inside(b2, gx, gy)
    cell = ((x1 - x0) / (n - 1)) * ((y1 - y0) / (n - 1))
    return m.sum() * cell


def test_transform_golden():
    b1 = vec5(0.0, 0.0, 2.0, 0.5, 2.0)
    b2 = vec5(0.0, 0.0, 2.0 + math.pi / 2.0, 0.5, 2.0)
    inter = float(G.rotated_intersection(b1, b2))
    union = float(G.box_area(b1) + G.box_area(b2)) - inter
    assert abs(union - 3.0) < 1e-4
    iou, valid = G.universal_iou(b1, b2)
    assert bool(valid)
    assert abs(float(iou) - inter / union) < 1e-5

    b3 = vec5(10.0, 0.0, 2.0 + math.pi / 2.0, 0.5, 2.0)
    inter3 = float(G.rotated_intersection(b1, b3))
    assert inter3 == 0.0
    _, valid3 = G.universal_iou(b1, b3)
    assert not bool(valid3)


def test_corner_case_large_coords():
    """f32 parity at large coordinates (reference corner_case_f32, bbox.rs:371-380)."""
    x = np.array([8044.315, 8011.0454, 2.678_774_8, 1.00801, 49.8073], np.float32)
    y = np.array([8044.455, 8011.338, 2.678_774_8, 1.0083783, 49.79979], np.float32)
    inter = float(G.rotated_intersection(jnp.asarray(x), jnp.asarray(y)))
    approx = mc_intersection(x, y)
    assert abs(inter - approx) / approx < 0.02


@pytest.mark.parametrize("seed", range(5))
def test_random_rotated_intersection_vs_mc(seed):
    rng = np.random.default_rng(seed)
    b1 = np.array(
        [rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(0, 6.28),
         rng.uniform(0.3, 2.0), rng.uniform(1.0, 6.0)], np.float32)
    b2 = np.array(
        [b1[0] + rng.uniform(-3, 3), b1[1] + rng.uniform(-3, 3),
         rng.uniform(0, 6.28), rng.uniform(0.3, 2.0), rng.uniform(1.0, 6.0)],
        np.float32)
    inter = float(G.rotated_intersection(jnp.asarray(b1), jnp.asarray(b2)))
    approx = mc_intersection(b1, b2)
    assert abs(inter - approx) <= max(0.02 * approx, 5e-3)


def test_axis_aligned_matches_ltwh():
    a = BoundingBox(0.0, 0.0, 4.0, 6.0)
    b = BoundingBox(2.0, 3.0, 4.0, 6.0)
    ltwh_iou = a.iou(b)
    ua, ub = a.as_xyaah(), b.as_xyaah()
    iou, valid = G.universal_iou(
        jnp.asarray(ua.to_vec5()), jnp.asarray(ub.to_vec5())
    )
    assert bool(valid)
    assert abs(float(iou) - ltwh_iou) < 1e-5


def test_iou_matrix_shape_and_symmetry():
    rng = np.random.default_rng(3)
    A = np.stack(
        [np.array([rng.uniform(0, 10), rng.uniform(0, 10), 0.0, 1.0, 2.0]) for _ in range(4)]
    ).astype(np.float32)
    B = A.copy()
    iou, valid = G.universal_iou_matrix(jnp.asarray(A), jnp.asarray(B))
    assert iou.shape == (4, 4)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), 1.0, rtol=1e-5)


def test_too_far_and_dist2r():
    l = vec5(0.0, 0.0, 0.0, 1.0, 2.0)
    r = vec5(10.0, 0.0, 0.0, 1.0, 2.0)
    assert bool(G.too_far(l, r))
    near = vec5(1.0, 0.0, 0.0, 1.0, 2.0)
    assert not bool(G.too_far(l, near))
    d = float(G.dist_in_2r(l, near))
    lb = Universal2DBox.from_vec5(np.asarray(l))
    nb = Universal2DBox.from_vec5(np.asarray(near))
    assert abs(d - Universal2DBox.dist_in_2r(lb, nb)) < 1e-5


def test_normalize_angle_goldens():
    assert abs(float(G.normalize_angle(jnp.float32(0.3))) - 0.3) < 1e-5
    assert abs(float(G.normalize_angle(jnp.float32(-0.3))) - 5.983184) < 1e-5
    assert abs(float(G.normalize_angle(jnp.float32(6.583184))) - 0.3) < 1e-4


def test_vertices_match_host_polygon():
    b = Universal2DBox(3.0, 4.0, 0.7, 1.5, 5.0)
    host = np.array(b.get_vertices().get_points(), np.float32)
    dev = np.asarray(G.box_vertices(jnp.asarray(b.to_vec5())))
    np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)


def test_containment():
    """Small box fully inside big box: intersection == small box area."""
    big = vec5(0.0, 0.0, 0.5, 1.0, 10.0)
    small = vec5(0.0, 0.0, 1.2, 1.0, 2.0)
    inter = float(G.rotated_intersection(big, small))
    assert abs(inter - float(G.box_area(small))) < 1e-3


def test_aligned_kernel_matches_general_clip():
    """aligned_intersection must equal the SH clip for angle-0 boxes."""
    rng = np.random.default_rng(9)
    a = np.zeros((32, 5), np.float32)
    b = np.zeros((32, 5), np.float32)
    for arr in (a, b):
        arr[:, 0] = rng.uniform(0, 100, 32)
        arr[:, 1] = rng.uniform(0, 100, 32)
        arr[:, 3] = rng.uniform(0.3, 2.0, 32)
        arr[:, 4] = rng.uniform(5, 30, 32)
    ref = np.asarray(G.rotated_intersection(jnp.asarray(a), jnp.asarray(b)))
    fast = np.asarray(G.aligned_intersection(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-3)


def test_quad_area_degenerate_cases():
    """Green's-theorem intersection kernel on measure-zero / duplicate configs.

    These are the configurations where the collinear tie-break matters
    (identical boxes counted once, touching edges cancel) — the SH clip
    handled them via its n>=3 check, the boundary-integral kernel via the
    direction rule in `_boundary_integral`.
    """
    # identical axis-aligned boxes -> full area
    a = vec5(0.0, 0.0, 0.0, 1.0, 2.0)
    assert abs(float(G.rotated_intersection(a, a)) - 4.0) < 1e-5
    # identical rotated boxes (bitwise-equal params) -> full area
    r = vec5(10.0, -3.0, 0.7, 0.6, 8.0)
    area = float(G.box_area(r))
    assert abs(float(G.rotated_intersection(r, r)) - area) < 1e-2 * area
    # edge-touching boxes -> zero
    b = vec5(2.0, 0.0, 0.0, 1.0, 2.0)
    assert float(G.rotated_intersection(a, b)) < 1e-5
    # corner-touching boxes -> zero
    c = vec5(2.0, 2.0, 0.0, 1.0, 2.0)
    assert float(G.rotated_intersection(a, c)) < 1e-5
    # collinear partial overlap (shares top/bottom edge lines) -> exact slab
    d = vec5(1.0, 0.0, 0.0, 1.0, 2.0)
    assert abs(float(G.rotated_intersection(a, d)) - 2.0) < 1e-4


def test_quad_area_matches_sh_clip_montecarlo():
    """Boundary-integral area == Sutherland-Hodgman clip area on random pairs."""
    rng = np.random.default_rng(123)
    n = 512
    boxes = np.zeros((2, n, 5), np.float32)
    for arr in boxes:
        arr[:, 0] = rng.uniform(-20, 20, n)
        arr[:, 1] = rng.uniform(-20, 20, n)
        arr[:, 2] = rng.uniform(0, 2 * np.pi, n)
        arr[:, 3] = rng.uniform(0.2, 3.0, n)
        arr[:, 4] = rng.uniform(1, 30, n)
    va = G.box_vertices(jnp.asarray(boxes[0]))
    vb = G.box_vertices(jnp.asarray(boxes[1]))
    green = np.asarray(G.quad_intersection_area(va, vb))
    sh = np.asarray(G._clip_area_one(va, vb))
    np.testing.assert_allclose(green, sh, rtol=2e-3, atol=1e-2)


def test_topk_pruned_oriented_iou_matches_dense():
    """Radius-pruned top-k rotated IoU == dense kernel whenever each row has
    fewer in-radius partners than k (the tracking regime)."""
    import jax.numpy as jnp
    from similari_tpu.ops import geometry as geo

    rng = np.random.default_rng(17)
    d, t, k = 48, 96, 16
    def boxes(n, spread):
        b = np.zeros((n, 5), np.float32)
        b[:, 0] = rng.uniform(0, spread, n)
        b[:, 1] = rng.uniform(0, spread, n)
        b[:, 2] = rng.uniform(0, 1.4, n)
        b[:, 3] = rng.uniform(0.4, 1.6, n)
        b[:, 4] = rng.uniform(15, 40, n)
        return b
    a = jnp.asarray(boxes(d, 900.0))
    b = jnp.asarray(boxes(t, 900.0))
    iou_d, val_d = geo.universal_iou_matrix(a, b, True, neighbors=0)
    iou_p, val_p = geo.universal_iou_matrix(a, b, True, neighbors=k)
    # sanity: the prune must actually be exact here (few partners per row)
    cd2 = np.asarray(geo.center_distance2(a[:, None, :], b[None, :, :]))
    rd = np.asarray(geo.box_radius(a))[:, None] + np.asarray(geo.box_radius(b))[None, :]
    assert (cd2 <= rd * rd).sum(axis=1).max() <= k
    np.testing.assert_array_equal(np.asarray(val_p), np.asarray(val_d))
    np.testing.assert_allclose(np.asarray(iou_p), np.asarray(iou_d),
                               rtol=1e-6, atol=1e-7)


def test_nms_pruned_matches_dense_oriented():
    import jax.numpy as jnp
    from similari_tpu.ops.nms import nms_kernel

    rng = np.random.default_rng(23)
    n = 128
    b = np.zeros((n, 5), np.float32)
    b[:, 0] = rng.uniform(0, 400, n)
    b[:, 1] = rng.uniform(0, 400, n)
    b[:, 2] = rng.uniform(0, 0.8, n)
    b[:, 3] = rng.uniform(0.5, 1.5, n)
    b[:, 4] = rng.uniform(20, 50, n)
    ranks = rng.uniform(0.5, 1.0, n).astype(np.float32)
    order = np.argsort(-ranks)
    bj = jnp.asarray(b[order])
    rj = jnp.asarray(ranks[order])
    valid = jnp.ones((n,), bool)
    keep_dense = nms_kernel(bj, valid, jnp.float32(0.7), True, 0)
    keep_prune = nms_kernel(bj, valid, jnp.float32(0.7), True, 32)
    np.testing.assert_array_equal(np.asarray(keep_prune),
                                  np.asarray(keep_dense))
