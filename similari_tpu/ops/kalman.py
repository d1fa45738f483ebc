"""Batched Kalman filters for 2D boxes and 2D points — TPU-native core.

The reference filter (`/root/reference/src/utils/kalman/kalman_2d_box.rs:29-184`,
a DeepSORT-style constant-velocity filter) keeps a dense 10x10 covariance, but its
motion model only ever couples component ``i`` with its own velocity ``5+i``:
the motion matrix is ``I + shift`` and both process and measurement noise are
diagonal.  The covariance therefore stays block-diagonal in 2x2 blocks
``[[cpp_i, cpv_i], [cpv_i, cvv_i]]`` for the (position_i, velocity_i) pairs, and
the projected innovation covariance ``S = H P H^T + R`` is exactly diagonal.
(The reference's ``solve_lower_triangular`` on that diagonal matrix is an
elementwise division, which is what we do explicitly.)

We exploit this: the whole filter is elementwise arithmetic over ``[..., K]``
arrays (K = 5 for boxes, K = 2 for points), which vectorizes perfectly on the
TPU VPU with no matrix factorizations at all.  The numerics are bit-for-bit the
same recurrences as the reference's dense form.

Box state layout (K = 5): components are (xc, yc, angle, aspect, height) per
``kalman_2d_box.rs:58-70``; the aspect component (index 3) uses the constant
noise std (1e-2 init/predict, 1e-1 project) instead of height-scaled stds.

Point state layout (K = 2): (x, y) with constant stds
(``kalman_2d_point.rs:41-49``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

# chi2inv(0.95, dof) table and gating bound, `src/utils/kalman.rs:16-20`.
CHI2INV95 = (3.8415, 5.9915, 7.8147, 9.4877, 11.070, 12.592, 14.067, 15.507, 16.919)
CHI2_UPPER_BOUND = 100.0

DEFAULT_POSITION_WEIGHT = 1.0 / 20.0
DEFAULT_VELOCITY_WEIGHT = 1.0 / 160.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KalmanState:
    """Decomposed Kalman state; arrays share a common batch prefix.

    mean_pos[..., K]  position part of the mean
    mean_vel[..., K]  velocity part of the mean
    cpp/cpv/cvv[..., K]  the 2x2 per-component covariance blocks
    """

    mean_pos: jax.Array
    mean_vel: jax.Array
    cpp: jax.Array
    cpv: jax.Array
    cvv: jax.Array

    @property
    def dim(self) -> int:
        return self.mean_pos.shape[-1]

    def dense_covariance(self) -> jax.Array:
        """Materialize the full [..., 2K, 2K] covariance (API/introspection only)."""
        k = self.dim
        batch = self.mean_pos.shape[:-1]
        cov = jnp.zeros(batch + (2 * k, 2 * k), self.mean_pos.dtype)
        idx = jnp.arange(k)
        cov = cov.at[..., idx, idx].set(self.cpp)
        cov = cov.at[..., idx, k + idx].set(self.cpv)
        cov = cov.at[..., k + idx, idx].set(self.cpv)
        cov = cov.at[..., k + idx, k + idx].set(self.cvv)
        return cov

    def mean(self) -> jax.Array:
        return jnp.concatenate([self.mean_pos, self.mean_vel], axis=-1)


def _box_stds(k: float, cnst: float, p: jax.Array, weight: float) -> jax.Array:
    """[w*k*p, w*k*p, w*k*p, cnst, w*k*p] per `kalman_2d_box.rs:46-54`."""
    s = k * weight * p
    return jnp.stack([s, s, s, jnp.full_like(s, cnst), s], axis=-1)


def _point_stds(k: float, _p, weight: float) -> jax.Array:
    s = jnp.asarray(k * weight, jnp.float32)
    return jnp.stack([s, s], axis=-1)


@dataclasses.dataclass(frozen=True)
class KalmanSpec:
    """Static filter configuration (box or point flavor)."""

    position_weight: float = DEFAULT_POSITION_WEIGHT
    velocity_weight: float = DEFAULT_VELOCITY_WEIGHT
    kind: str = "box"  # "box" | "point"

    # --- noise schedules --------------------------------------------------
    def _std_pos(self, k: float, cnst: float, p: jax.Array) -> jax.Array:
        if self.kind == "box":
            return _box_stds(k, cnst, p, self.position_weight)
        return _point_stds(k, p, self.position_weight)

    def _std_vel(self, k: float, cnst: float, p: jax.Array) -> jax.Array:
        if self.kind == "box":
            return _box_stds(k, cnst, p, self.velocity_weight)
        return _point_stds(k, p, self.velocity_weight)

    # --- filter steps -----------------------------------------------------
    def initiate(self, z: jax.Array) -> KalmanState:
        """First-observation init, `kalman_2d_box.rs:58-82` / point `51-65`.

        z[..., K]; for boxes z = (xc, yc, angle-or-0, aspect, height).
        """
        p = z[..., 4] if self.kind == "box" else None
        sp = self._std_pos(2.0, 1e-2, p)
        sv = self._std_vel(10.0, 1e-5, p)
        zero = jnp.zeros_like(z)
        return KalmanState(
            mean_pos=z, mean_vel=zero, cpp=sp * sp, cpv=zero, cvv=sv * sv
        )

    def predict(self, s: KalmanState) -> KalmanState:
        """Constant-velocity motion step, `kalman_2d_box.rs:86-102`.

        Noise stds scale with the *pre-motion* height (mean[4]).
        """
        p = s.mean_pos[..., 4] if self.kind == "box" else None
        qp = self._std_pos(1.0, 1e-2, p) ** 2
        qv = self._std_vel(1.0, 1e-5, p) ** 2
        # cov' = F cov F^T + Q with F = [[1,1],[0,1]] per component
        return KalmanState(
            mean_pos=s.mean_pos + s.mean_vel,
            mean_vel=s.mean_vel,
            cpp=s.cpp + 2.0 * s.cpv + s.cvv + qp,
            cpv=s.cpv + s.cvv,
            cvv=s.cvv + qv,
        )

    def project(self, s: KalmanState) -> tuple[jax.Array, jax.Array]:
        """Project to measurement space, `kalman_2d_box.rs:104-120`.

        Returns (projected_mean[..., K], S_diag[..., K]); S is exactly diagonal.
        """
        p = s.mean_pos[..., 4] if self.kind == "box" else None
        r = self._std_pos(1.0, 1e-1, p) ** 2
        return s.mean_pos, s.cpp + r

    def update(self, s: KalmanState, z: jax.Array) -> KalmanState:
        """Measurement update, `kalman_2d_box.rs:124-148`.

        The reference's gain is ``S_lower^{-1} (P H^T)^T``; S is diagonal so this
        is an elementwise division — gains gp = cpp/S, gv = cpv/S.
        """
        mean_proj, S = self.project(s)
        nu = z - mean_proj
        gp = s.cpp / S
        gv = s.cpv / S
        return KalmanState(
            mean_pos=s.mean_pos + nu * gp,
            mean_vel=s.mean_vel + nu * gv,
            # cov' = cov - gain^T S gain  (per-component 2x2 outer product)
            cpp=s.cpp - s.cpp * gp,
            cpv=s.cpv - s.cpp * gv,
            cvv=s.cvv - s.cpv * gv,
        )

    def distance(self, s: KalmanState, z: jax.Array) -> jax.Array:
        """Squared Mahalanobis gating distance, `kalman_2d_box.rs:150-170`.

        Cholesky of the diagonal S is sqrt(S); the solve is a division.
        """
        mean_proj, S = self.project(s)
        nu = z - mean_proj
        return jnp.sum(nu * nu / S, axis=-1)

    def distance_matrix(self, s: KalmanState, z: jax.Array) -> jax.Array:
        """Pairwise gating distance: states [T, ...] x measurements [D, K] -> [D, T]."""
        mean_proj, S = self.project(s)  # [T, K]
        nu = z[:, None, :] - mean_proj[None, :, :]  # [D, T, K]
        return jnp.sum(nu * nu / S[None, :, :], axis=-1)


def calculate_cost(distance: jax.Array, inverted: bool, gate: float = CHI2INV95[4]):
    """Chi-square gating cost, `kalman_2d_box.rs:172-184`.

    Plain: distance, clipped to CHI2_UPPER_BOUND above the gate.
    Inverted: CHI2_UPPER_BOUND - distance, 0 above the gate.
    """
    over = distance > gate
    if not inverted:
        return jnp.where(over, CHI2_UPPER_BOUND, distance)
    return jnp.where(over, 0.0, CHI2_UPPER_BOUND - distance)


def make_candidate_states(spec: KalmanSpec, z: jax.Array) -> KalmanState:
    """The candidate-track Kalman dance: initiate -> predict -> update(z).

    This is what `Track::add_observation` does to a fresh SORT candidate via
    `SortMetric::optimize` -> `make_prediction` (`kalman_prediction.rs:13-32`).
    The resulting mean position equals z exactly (zero innovation), but the
    covariance matters because it seeds new tracks.
    """
    return spec.update(spec.predict(spec.initiate(z)), z)


def step_track_states(spec: KalmanSpec, s: KalmanState, z: jax.Array) -> KalmanState:
    """One tracked-object step: predict -> update (`kalman_prediction.rs:22-26`)."""
    return spec.update(spec.predict(s), z)


def empty_state(n: int, dim: int, dtype=jnp.float32) -> KalmanState:
    # distinct buffers per leaf: aliased leaves break argument donation
    return KalmanState(*(jnp.zeros((n, dim), dtype) for _ in range(5)))


def gather_state(s: KalmanState, idx: jax.Array) -> KalmanState:
    return jax.tree.map(lambda a: a[idx], s)


def scatter_state(dst: KalmanState, idx: jax.Array, src: KalmanState, mask: jax.Array) -> KalmanState:
    """Write src rows into dst at idx where mask; out-of-range idx rows dropped."""
    safe_idx = jnp.where(mask, idx, dst.mean_pos.shape[0])

    def put(d, v):
        return d.at[safe_idx].set(v, mode="drop")

    return jax.tree.map(put, dst, src)
