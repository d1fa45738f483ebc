"""In-place batched gallery-lane merge — the Pallas row-DMA kernel.

The batched VisualSORT step's state merge is roofline-bound in its XLA
form: the one-hot ``merge_lane``/``merge_ring`` writes (ops/merge.py) read
and rewrite the ENTIRE ``feats [S,T,K,F]`` and ``hist_feat [S,T,H,F]``
arrays to change at most D rows per scene — ~1.6 MB/scene of the step's
1.8 MB merge traffic for a ~0.1 MB payload (ARCHITECTURE.md §4c priced
this at ~0.5 ms of the 2.5 ms step).  This kernel does the write the way
the hardware wants: the state array stays in HBM (``memory_space=ANY``)
and is ALIASED input→output (``input_output_aliases``), and each scene's
D touched rows are copied VMEM→HBM with per-row async DMAs — untouched
rows are never read or written.

Shapes: state [S, R, F] (R = T*K gallery lanes or T*H ring rows), src
[S, D, F] (same dtype as state), row [S, D] int32 (destination row, from
slot*K+lane or slot*H+hix), valid [S, D] int32 (0 = skip).  Row indices
of invalid lanes may be anything in [0, R).

Grid = (S,): Mosaic's sequential grid runs scenes one at a time, but each
scene's body only ISSUES D DMA descriptors and waits — the copies
themselves overlap across the loop, so the kernel is bounded by DMA issue
rate + payload bandwidth, not by the serialization that sank the
scenes-per-step compute kernels (§5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _merge_kernel(row_ref, valid_ref, src_ref, state_ref, out_ref, sems):
    d_count = src_ref.shape[0]

    def start(d, _):
        @pl.when(valid_ref[0, d] != 0)
        def _():
            pltpu.make_async_copy(
                src_ref.at[d], out_ref.at[row_ref[0, d]], sems.at[d]
            ).start()
        return 0

    jax.lax.fori_loop(0, d_count, start, 0, unroll=True)

    def wait(d, _):
        @pl.when(valid_ref[0, d] != 0)
        def _():
            pltpu.make_async_copy(
                src_ref.at[d], out_ref.at[row_ref[0, d]], sems.at[d]
            ).wait()
        return 0

    jax.lax.fori_loop(0, d_count, wait, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=0)
def lane_merge_inplace(state, src, row, valid, *, interpret=False):
    """state[S,R,F] <- src[S,D,F] rows placed at row[S,D] where valid.

    In-place: the returned array aliases ``state`` (donate it).  dtypes of
    state and src must match; row is int32, valid int32/bool.
    """
    s, r, f = state.shape
    d = src.shape[1]
    assert src.dtype == state.dtype, (src.dtype, state.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, d), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),  # row
            pl.BlockSpec((1, d), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),  # valid
            pl.BlockSpec((1, d, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # src (per-scene block)
            pl.BlockSpec(memory_space=pltpu.ANY),  # state stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((d,))],
    )

    def kernel(row_ref, valid_ref, src_ref, state_ref, out_ref, sems):
        # src block is (1, D, F); drop the leading scene axis
        _merge_kernel(row_ref, valid_ref, src_ref.at[0], state_ref,
                      out_ref.at[pl.program_id(0)], sems)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, r, f), state.dtype),
        input_output_aliases={3: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(row.astype(jnp.int32), valid.astype(jnp.int32), src, state)
