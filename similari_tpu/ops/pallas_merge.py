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


def _merge_kernel(row_ref, valid_ref, src_ref, out_ref, f, d_count, sems):
    """src/out refs are flattened per scene: (1, D*F) and (1, R*F).

    Mosaic refuses 1-row dynamic slices of a [R, F] memref (sublane
    tiling), but LAST-dim slices at 128-element-aligned offsets are fine —
    so rows are addressed as (1, F) windows of the flattened scene row.
    """

    def dma(d):
        s0 = pl.multiple_of(d * f, 128)
        s1 = pl.multiple_of(row_ref[0, d] * f, 128)
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(s0, f)],
            out_ref.at[:, pl.ds(s1, f)],
            sems.at[d],
        )

    def start(d, _):
        @pl.when(valid_ref[0, d] != 0)
        def _():
            dma(d).start()
        return 0

    jax.lax.fori_loop(0, d_count, start, 0)

    def wait(d, _):
        @pl.when(valid_ref[0, d] != 0)
        def _():
            dma(d).wait()
        return 0

    jax.lax.fori_loop(0, d_count, wait, 0)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=0)
def lane_merge_inplace(state, src, row, valid, *, interpret=False):
    """state[S,R,F] <- src[S,D,F] rows placed at row[S,D] where valid.

    In-place: the returned array aliases ``state`` (donate it).  dtypes of
    state and src must match; row is int32, valid int32/bool.

    Lane-alignment constraint: every row offset must land on a 128-lane
    boundary after the int32 bitcast, so F must be a multiple of 128 words
    — i.e. F % 128 == 0 for f32/int32 states but **F % 256 == 0 for bf16**
    (pairs pack into int32 words).  A 128-dim bf16 gallery does not
    qualify; use the shipping one-hot `merge_lane` for it (which is also
    the faster path everywhere measured — ARCHITECTURE §4c keeps this
    kernel as the measured-negative experiment record).
    """
    s, r, f = state.shape
    d = src.shape[1]
    assert src.dtype == state.dtype, (src.dtype, state.dtype)
    words = f // 2 if state.dtype == jnp.bfloat16 else f
    if words % 128:
        raise ValueError(
            f"lane_merge_inplace: feature dim {f} ({state.dtype}) packs to "
            f"{words} int32 words per row; row offsets must be 128-word "
            "aligned (f32/int32 need F % 128 == 0, bf16 needs F % 256 == 0)")
    # sub-32-bit dtypes ride as int32 words (bf16 tiling pads a size-1
    # sublane dim to 2, which outlaws the (1, N) flattened-scene view; an
    # int32 bitcast packs the pairs and keeps every offset lane-aligned)
    orig_dtype = state.dtype
    if state.dtype == jnp.bfloat16:
        state = jax.lax.bitcast_convert_type(
            state.reshape(s, r, f // 2, 2), jnp.int32)
        src = jax.lax.bitcast_convert_type(
            src.reshape(s, d, f // 2, 2), jnp.int32)
        f = f // 2
    elif state.dtype != jnp.int32:
        state = jax.lax.bitcast_convert_type(state, jnp.int32)
        src = jax.lax.bitcast_convert_type(src, jnp.int32)
    # Scenes flattened to ONE long row each ([S, 1, R*F]): Mosaic refuses
    # 1-row dynamic slices of a tiled [R, F] memref, but last-dim windows
    # at 128-aligned offsets are legal in any memory space.  SMEM blocks
    # must match the array's trailing dims exactly, so the per-scene index
    # rows ride as [S, 1, D] with block (1, 1, D).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # row
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),  # valid
            # src stays in HBM like the state (HBM->HBM row DMAs never
            # stage the payload through VMEM at all)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # state: aliased output
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((d,))],
    )

    def kernel(row_ref, valid_ref, src_ref, state_ref, out_ref, sems):
        # row/valid blocks are (1, 1, D); src/state are the full arrays
        i = pl.program_id(0)
        _merge_kernel(row_ref.at[0], valid_ref.at[0], src_ref.at[i],
                      out_ref.at[i], f, d, sems)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, 1, r * f), jnp.int32),
        input_output_aliases={3: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(row.astype(jnp.int32).reshape(s, 1, d),
      valid.astype(jnp.int32).reshape(s, 1, d),
      src.reshape(s, 1, d * f), state.reshape(s, 1, r * f))
    out = out.reshape(s, r, f)
    if orig_dtype == jnp.bfloat16:
        return jax.lax.bitcast_convert_type(
            out, jnp.bfloat16).reshape(s, r, 2 * f)
    if orig_dtype != jnp.int32:
        return jax.lax.bitcast_convert_type(out, orig_dtype)
    return out
