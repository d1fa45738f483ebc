"""Scatter/gather-free masked row merges for the SoA track stores.

A tracker step writes at most one detection row into each track slot (slots
are unique per step: matched targets are distinct by assignment, new slots by
construction).  The natural formulations are a dynamic scatter
(``state.at[slot].set(src)``) or its inverse gather — both lower to
serialized code on TPU once vmapped over scenes and dominated the batched
step (≈50%).  Instead we materialize the tiny [T, D] writer one-hot once and
turn every row placement into dense vector work that XLA fuses:

    hit[t, d]  = (slot[d] == t) & safe[d]          (at most one d per t)
    g          = hit @ src        float payloads — an MXU matmul
    g[t]       = sum_d where(hit[t,d], src[d], 0)  int payloads — a VPU reduce
    new        = where(any_d hit, g, old)

T*D is 20k bools at bench scale; the gallery/feature payloads ride the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def writer_hit(slot: jax.Array, safe: jax.Array, capacity: int) -> jax.Array:
    """hit[T, D] one-hot: which detection writes each slot (at most one)."""
    return (
        slot[None, :] == jnp.arange(capacity, dtype=slot.dtype)[:, None]
    ) & safe[None, :]


def _place(hit: jax.Array, src: jax.Array) -> jax.Array:
    """g[T, ...] = src[writer[t]] where written, 0 elsewhere — no gather.

    Floats go through an MXU matmul over the one-hot; integers/bools through a
    masked sum (exact — at most one hit per row).
    """
    t, d = hit.shape
    if jnp.issubdtype(src.dtype, jnp.floating):
        # zero unused source rows: padded detections can carry NaN/inf (e.g.
        # 0/0 Kalman gains on zero-height padding) and 0 * NaN would smear NaN
        # over every output row of the matmul; a scatter would just drop them.
        used = jnp.any(hit, axis=0)
        flat = jnp.where(used[:, None], src.reshape(d, -1), 0.0)
        g = jnp.einsum(
            "td,dc->tc",
            hit.astype(src.dtype),
            flat,
            preferred_element_type=src.dtype,
        )
        return g.reshape((t,) + src.shape[1:])
    mask = hit.reshape((t, d) + (1,) * (src.ndim - 1))
    if src.dtype == jnp.bool_:
        return jnp.any(mask & src[None], axis=1)
    return jnp.sum(jnp.where(mask, src[None], 0), axis=1, dtype=src.dtype)


def merge_rows(old: jax.Array, src: jax.Array, hit: jax.Array) -> jax.Array:
    """old[T, ...] <- src[D, ...] rows placed by hit[T, D]."""
    written = jnp.any(hit, axis=1)
    g = _place(hit, src)
    mask = written.reshape(written.shape + (1,) * (old.ndim - 1))
    return jnp.where(mask, g.astype(old.dtype), old)


def merge_scalar(old: jax.Array, value, hit: jax.Array) -> jax.Array:
    """old[T] <- broadcast scalar where any detection wrote the slot."""
    return jnp.where(jnp.any(hit, axis=1), value, old)


def merge_tree(old, src, hit):
    """Pytree version of merge_rows (e.g. KalmanState leaves)."""
    return jax.tree.map(lambda o, s: merge_rows(o, s, hit), old, src)


def merge_ring(
    old: jax.Array,  # [T, H, ...]
    src: jax.Array,  # [D, ...]
    ring_ix: jax.Array,  # [D] int32 write position per detection
    hit: jax.Array,  # [T, D]
) -> jax.Array:
    """Ring-buffer write old[slot, ring_ix] = src without a 2-D scatter."""
    h = old.shape[1]
    written = jnp.any(hit, axis=1)
    g = _place(hit, src)  # [T, ...]
    lane_onehot = ring_ix[:, None] == jnp.arange(h, dtype=ring_ix.dtype)  # [D, H]
    lane = jnp.einsum("td,dh->th", hit.astype(jnp.float32),
                      lane_onehot.astype(jnp.float32)) > 0.5
    mask = (written[:, None] & lane).reshape(
        (old.shape[0], h) + (1,) * (old.ndim - 2)
    )
    return jnp.where(mask, g[:, None].astype(old.dtype), old)


# gallery-lane writes are the same computation with a lane index per detection
merge_lane = merge_ring


def reader_hit(slot: jax.Array, capacity: int) -> jax.Array:
    """hot[D, T] one-hot: which slot each detection reads.

    The inverse of ``writer_hit``: measured on v5e, a vmapped dynamic gather
    ``table[slot]`` serializes (~20x slower than this contraction at
    S=256, D=100, T=200 — see ARCHITECTURE.md §4c), so every by-slot read
    in the steps goes through these helpers instead.
    """
    return slot[:, None] == jnp.arange(capacity, dtype=slot.dtype)[None, :]


def _use_onehot() -> bool:
    """One-hot contractions on accelerators, plain gathers on CPU.

    Evaluated at trace time (jit caches are per-backend): a CPU gather is
    O(D) and beats the O(D*T) contraction there, while on TPU the vmapped
    gather serializes (x20 slower — ARCHITECTURE.md §4c).  Both forms are
    exact, so this is purely a performance dispatch.
    """
    return jax.default_backend() != "cpu"


def take_rows(table: jax.Array, slot: jax.Array) -> jax.Array:
    """g[D, ...] = table[slot[d]] as a one-hot contraction (no gather).

    Floats ride the MXU; ints/bools use a masked reduce.  Exactness relies
    on the table being globally finite (0 * inf would poison the matmul) —
    which the merge invariants guarantee: every state write zeroes NaN/inf
    source rows (see ``_place``), and empty state is zero-initialized.
    """
    if not _use_onehot():
        return table[slot]
    d = slot.shape[0]
    t = table.shape[0]
    hot = reader_hit(slot, t)
    if jnp.issubdtype(table.dtype, jnp.floating):
        g = jnp.einsum(
            "dt,tc->dc",
            hot.astype(table.dtype),
            table.reshape(t, -1),
            preferred_element_type=table.dtype,
        )
        return g.reshape((d,) + table.shape[1:])
    mask = hot.reshape((d, t) + (1,) * (table.ndim - 1))
    if table.dtype == jnp.bool_:
        return jnp.any(mask & table[None], axis=1)
    return jnp.sum(jnp.where(mask, table[None], 0), axis=1, dtype=table.dtype)


def take_tree(table_tree, slot: jax.Array):
    """Pytree version of take_rows (e.g. KalmanState leaves)."""
    return jax.tree.map(lambda tbl: take_rows(tbl, slot), table_tree)


def take_at(matrix: jax.Array, cols: jax.Array) -> jax.Array:
    """g[D] = matrix[d, cols[d]] without the 2-D gather."""
    if not _use_onehot():
        return matrix[jnp.arange(matrix.shape[0]), cols]
    t = matrix.shape[1]
    hot = cols[:, None] == jnp.arange(t, dtype=cols.dtype)[None, :]
    if matrix.dtype == jnp.bool_:
        return jnp.any(hot & matrix, axis=1)
    return jnp.sum(jnp.where(hot, matrix, 0), axis=1, dtype=matrix.dtype)


def nth_free_slot(active: jax.Array, want_rank: jax.Array) -> jax.Array:
    """slot[d] = index of the want_rank[d]-th (0-based) free slot.

    capacity-1 where no such slot exists (callers gate on overflow).
    Scatter/gather-free replacement for building a free-slot table with
    ``.at[].set`` and indexing it.
    """
    t = active.shape[0]
    free = ~active
    frank = jnp.cumsum(free.astype(jnp.int32)) - 1  # [T] rank among free
    if not _use_onehot():
        table = jnp.full((t,), t - 1, jnp.int32).at[
            jnp.where(free, frank, t)
        ].set(jnp.arange(t, dtype=jnp.int32), mode="drop")
        return table[jnp.clip(want_rank, 0, t - 1)]
    hot = free[None, :] & (frank[None, :] == want_rank[:, None])
    cols = jnp.arange(t, dtype=jnp.int32)
    return jnp.min(jnp.where(hot, cols[None, :], t - 1), axis=1)
