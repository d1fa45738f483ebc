// Scalar f32 rotated-box intersection — op-order parity with the device
// kernel (ops/geometry.py quad_intersection_area / rotated_intersection):
// the same Green's-theorem boundary integral with per-edge Liang–Barsky
// clipping, the same pair recentring, all in f32.  The host tracker steps
// (sortstep.cpp / visualstep.cpp) use this so host and device engines stay
// id-exact on oriented streams ON THE CPU TEST MESH, where both sides use
// the exact JV solver (tests/test_host_sort.py fuzzed configs).  On a real
// TPU the device engine resolves near-ties differently by construction —
// the auction solver, and above the block-sort gate the x-sorted Pallas
// clip whose recentring differs by ~1 ulp — which is within the
// reference's own tie nondeterminism (SURVEY.md §7), not an exactness
// target.  native/nms.cpp keeps its own f64 Sutherland–Hodgman path (NMS
// parity target is the reference semantics,
// /root/reference/src/utils/bbox.rs:476-509, not the jitted step).

#pragma once

#include <cmath>

namespace similari_clip {

struct QuadF {
  float x[4], y[4];
};

// geometry.box_vertices order, vec5 = (xc, yc, angle, aspect, height)
inline void box_vertices_f32(const float* b, QuadF& q) {
  const float c = std::cos(b[2]);
  const float s = std::sin(b[2]);
  const float hw = b[3] * b[4] * 0.5f;
  const float hh = b[4] * 0.5f;
  const float r1x = -hw * c - hh * s, r1y = -hw * s + hh * c;
  const float r2x = hw * c - hh * s, r2y = hw * s + hh * c;
  q.x[0] = b[0] + r1x; q.y[0] = b[1] + r1y;
  q.x[1] = b[0] + r2x; q.y[1] = b[1] + r2y;
  q.x[2] = b[0] - r1x; q.y[2] = b[1] - r1y;
  q.x[3] = b[0] - r2x; q.y[3] = b[1] - r2y;
}

inline float cross2(float ax, float ay, float bx, float by) {
  return ax * by - ay * bx;
}

// geometry._boundary_integral: sum of cross(p0, p1) over A's edges clipped
// to convex quad B (Liang–Barsky per edge; collinear tie-break per pass).
inline float boundary_integral_f32(const QuadF& A, const QuadF& B,
                                   bool tie_pass) {
  float total = 0.0f;
  for (int i = 0; i < 4; ++i) {
    const int i1 = (i + 1) & 3;
    const float sx = A.x[i], sy = A.y[i];
    const float dex = A.x[i1] - sx, dey = A.y[i1] - sy;
    float t0 = 0.0f, t1 = 1.0f;
    bool ok = true;
    for (int h = 0; h < 4; ++h) {
      const int h1 = (h + 1) & 3;
      const float px = B.x[h], py = B.y[h];
      const float dx = B.x[h1] - px, dy = B.y[h1] - py;
      const float a = cross2(dx, dy, sx - px, sy - py);
      const float b = cross2(dx, dy, dex, dey);
      const float tt = -a / (b == 0.0f ? 1.0f : b);
      if (b < 0.0f) t0 = std::max(t0, tt);
      if (b > 0.0f) t1 = std::min(t1, tt);
      bool para_out = (b == 0.0f) && (a > 0.0f);
      if (tie_pass) {
        const bool same_dir = dx * dex + dy * dey >= 0.0f;
        para_out = para_out || ((b == 0.0f) && (a == 0.0f) && same_dir);
      }
      ok = ok && !para_out;
    }
    if (ok && t1 > t0) {
      const float p0x = sx + t0 * dex, p0y = sy + t0 * dey;
      const float p1x = sx + t1 * dex, p1y = sy + t1 * dey;
      total += cross2(p0x, p0y, p1x, p1y);
    }
  }
  return total;
}

// geometry.rotated_intersection: too_far pairs are exactly 0; the pair is
// recentred around the midpoint of the two centers before clipping.
inline float rotated_intersection_f32(const float* a, const float* b) {
  const float hwa = a[3] * a[4] * 0.5f, hha = a[4] * 0.5f;
  const float hwb = b[3] * b[4] * 0.5f, hhb = b[4] * 0.5f;
  const float ra = std::sqrt(hwa * hwa + hha * hha);
  const float rb = std::sqrt(hwb * hwb + hhb * hhb);
  const float ddx = a[0] - b[0], ddy = a[1] - b[1];
  const float md = ra + rb;
  if (ddx * ddx + ddy * ddy > md * md) return 0.0f;
  const float mx = 0.5f * (a[0] + b[0]), my = 0.5f * (a[1] + b[1]);
  const float ac[5] = {a[0] - mx, a[1] - my, a[2], a[3], a[4]};
  const float bc[5] = {b[0] - mx, b[1] - my, b[2], b[3], b[4]};
  QuadF qa, qb;
  box_vertices_f32(ac, qa);
  box_vertices_f32(bc, qb);
  const float s = boundary_integral_f32(qa, qb, false) +
                  boundary_integral_f32(qb, qa, true);
  return std::abs(s) * 0.5f;
}

// universal_iou semantics (`bbox.rs:512-535`): returns IoU, 0 when the
// intersection is empty (the caller treats 0 as "no edge").
inline float rotated_iou_f32(const float* a, const float* b) {
  const float inter = rotated_intersection_f32(a, b);
  if (!(inter > 0.0f)) return 0.0f;
  const float uni = a[3] * a[4] * a[4] + b[3] * b[4] * b[4] - inter;
  // uni > 0 guards degenerate zero-area boxes (geometry.universal_iou
  // parity: float roundoff can leave inter marginally above a ~0 union)
  if (!(uni > 0.0f)) return 0.0f;
  return inter / uni;
}

}  // namespace similari_clip
