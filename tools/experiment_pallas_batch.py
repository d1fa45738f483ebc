#!/usr/bin/env python
"""Experiment: can the fused Pallas visual kernel win BATCH workloads?

ARCHITECTURE.md §5 argues it cannot: Mosaic executes one kernel (and one
grid step) at a time on the v5e's single TensorCore, so S scenes through
the fused kernel cost ~S x the single-scene time, while the XLA batch
engine amortizes by *vectorizing across scenes* (wider [S*D, ...] ops).
The round-2 review asked for a measurement instead of an argument.

This script measures scenes-sequential Pallas directly: n independent
single-scene `pallas_call`s inside one jit (the scheduling a scene-grid
would produce on a single core; a blocked scene-grid variant additionally
trips Mosaic's squeezed-block tiling rules, so the multi-call form is also
the practical formulation).  Captured result (v5e, 100 obj x 512-d,
gallery 3, T=400, chunk 32, fetch-synced differencing):

    pallas x1 scene /step: 31.1 us/frame  (32.2k scene-fps)
    pallas x2 scenes/step: 82.0 us/frame = 41.0 us/scene-frame
    XLA batch engine, 256 scenes:          8.2 us/scene-frame

Scenes-sequential Pallas is x4-5 per-scene slower than the XLA batch
engine and degrades past 1 scene (VMEM working sets of the two kernel
instances evict each other).  The batch claim in §5 is therefore a
measured result: the fused kernel's win is the single-scene (latency)
regime; batch throughput belongs to the vectorizing XLA engine.

Run on the TPU: `python tools/experiment_pallas_batch.py`
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from bench import per_step_time
    from similari_tpu.ops import pallas_visual as pv
    from similari_tpu.trackers.visual_state import new_visual_state
    from similari_tpu.trackers.visual_step import VisualConfig

    cfg = VisualConfig(
        positional_kind="iou", visual_kind="euclidean",
        visual_threshold=100.0, visual_minimal_track_length=3,
        max_idle_epochs=5, assignment="auction", oriented=False,
        feature_precision="bf16",
    )
    chunk, d, t, k, f = 32, 100, 400, 3, 512
    call = pv.pallas_visual_chunk(cfg, chunk, d, t, k, f, False)
    n_state = len(pv.state_to_tuple(new_visual_state(t, 1, k, f)))

    def scene_inputs(seed):
        r = np.random.default_rng(seed)
        box = np.zeros((chunk, d, 5), np.float32)
        xy = r.uniform(0, 1000, (d, 2))
        for s in range(chunk):
            xy += r.uniform(-2, 2, xy.shape)
            box[s, :, 0] = xy[:, 0]
            box[s, :, 1] = xy[:, 1]
            box[s, :, 3] = 0.5
            box[s, :, 4] = 30.0
        feat = np.broadcast_to(
            r.normal(size=(1, d, f)).astype(np.float32), (chunk, d, f)
        ).copy()
        ones = np.ones((chunk, d), np.float32)
        ib = np.ones((chunk, d), np.int32)
        return (jnp.asarray(box), jnp.asarray(ones), jnp.asarray(ib),
                jnp.asarray(feat), jnp.asarray(ib), jnp.asarray(ones),
                jnp.asarray(ones), jnp.asarray(np.ones((1, 1), np.int32)))

    def build(n_scenes):
        @jax.jit
        def step(states, all_args):
            outs = [call(st, *args) for st, args in zip(states, all_args)]
            return ([tuple(o[:n_state]) for o in outs],
                    [o[n_state] for o in outs])

        return step

    for n_scenes in (1, 2):
        step = build(n_scenes)
        all_args = [scene_inputs(7 + i) for i in range(n_scenes)]

        def run(kk):
            states = [pv.state_to_tuple(new_visual_state(t, 1, k, f))
                      for _ in range(n_scenes)]
            t0 = time.perf_counter()
            ids = None
            for _ in range(kk):
                states, ids = step(states, all_args)
            np.asarray(ids[-1][-1, 0])  # real fetch
            return time.perf_counter() - t0

        per_frame = per_step_time(run, chunk)
        print(f"pallas x{n_scenes} scenes/step: {per_frame*1e6:.1f} us/frame,"
              f" {per_frame/n_scenes*1e6:.1f} us/scene-frame "
              f"({n_scenes/per_frame:.0f} scene-fps)", flush=True)


if __name__ == "__main__":
    main()
