"""Batched feature-distance kernels (ReID gallery matching).

The reference computes per-pair SIMD loops (`/root/reference/src/distance.rs:9-47`)
inside a candidates x tracks x gallery cartesian product.  Here the whole
product is one MXU matmul: candidates [D, F] against galleries [T, K, F]
reshaped to [T*K, F].

Length-mismatch truncation semantics from the reference do not apply on the
tensor path — features are padded/truncated to the static dim at ingestion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def euclidean_matrix(q: jax.Array, g: jax.Array) -> jax.Array:
    """q[D,F] x g[...,F] -> [D, ...] euclidean distances (sqrt of ssd).

    bf16 inputs run the dot on the MXU at double rate; norms always accumulate
    in f32 (bf16 long-sum accumulation would dominate the error).
    """
    gt = g.reshape(-1, g.shape[-1])
    qf = q.astype(jnp.float32)
    gf = gt.astype(jnp.float32)
    qn = jnp.sum(qf * qf, axis=-1)  # [D]
    gn = jnp.sum(gf * gf, axis=-1)  # [G]
    dot = jnp.dot(q, gt.T, preferred_element_type=jnp.float32)  # [D, G]
    d2 = jnp.maximum(qn[:, None] + gn[None, :] - 2.0 * dot, 0.0)
    return jnp.sqrt(d2).reshape((q.shape[0],) + g.shape[:-1])


def cosine_matrix(q: jax.Array, g: jax.Array) -> jax.Array:
    """Cosine *similarity* per `distance.rs:26-47` (not 1-cos)."""
    gt = g.reshape(-1, g.shape[-1])
    dot = jnp.dot(q, gt.T, preferred_element_type=jnp.float32)
    qf = q.astype(jnp.float32)
    gf = gt.astype(jnp.float32)
    qn = jnp.sqrt(jnp.sum(qf * qf, axis=-1))
    gn = jnp.sqrt(jnp.sum(gf * gf, axis=-1))
    denom = qn[:, None] * gn[None, :]
    sim = dot / jnp.where(denom > 0, denom, 1.0)
    return sim.reshape((q.shape[0],) + g.shape[:-1])


def euclidean(a, b) -> float:
    """Scalar pair API parity (`distance.rs:9-19`): truncates to shorter vec."""
    a = jnp.asarray(a, jnp.float32).ravel()
    b = jnp.asarray(b, jnp.float32).ravel()
    n = min(a.shape[0], b.shape[0])
    d = a[:n] - b[:n]
    return float(jnp.sqrt(jnp.sum(d * d)))


def cosine(a, b) -> float:
    """Scalar pair API parity (`distance.rs:26-47`)."""
    a = jnp.asarray(a, jnp.float32).ravel()
    b = jnp.asarray(b, jnp.float32).ravel()
    n = min(a.shape[0], b.shape[0])
    a, b = a[:n], b[:n]
    return float(jnp.sum(a * b) / jnp.sqrt(jnp.sum(a * a) * jnp.sum(b * b)))
