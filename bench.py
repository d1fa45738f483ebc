#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Scales mirror the reference cargo benches (`/root/reference/benches/`) and the
published numbers in BASELINE.md (Intel i5-7440HQ, 4 cores).  Tracking is
measured as a device-resident pipeline (`lax.scan` over the frame stream, one
transfer in/out), which is both how a production TPU deployment runs and the
only honest measurement through the high-latency dev tunnel.  Diagnostics go
to stderr; stdout carries exactly one JSON line for the driver.
"""

import json
import sys
import time

import numpy as np

# Reference baselines (FPS) from BASELINE.md
BASELINES = {
    "sort_iou_100": 561.0,
    "sort_maha_100": 588.0,
    "sort_iou_500": 53.0,
    "batch_sort_iou_100": 618.0,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def box_stream(steps, n, seed=42, spread=1000.0):
    """Random-walk box stream akin to the reference BoxGen2 (`examples.rs:188-249`)."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, spread, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(30, 60, size=(n, 2)).astype(np.float32)
    out = np.zeros((steps, n, 5), np.float32)
    for s in range(steps):
        xy += rng.uniform(-2, 2, size=xy.shape).astype(np.float32)
        wh += rng.uniform(-0.5, 0.5, size=wh.shape).astype(np.float32)
        out[s, :, 0] = xy[:, 0]
        out[s, :, 1] = xy[:, 1]
        out[s, :, 3] = wh[:, 0] / wh[:, 1]
        out[s, :, 4] = wh[:, 1]
    return out


def bench_sort_scan(method: str, n_objects: int, steps=128, reps=5):
    import jax
    import jax.numpy as jnp

    from similari_tpu.trackers.sort_step import SortConfig, compiled_sort_scan
    from similari_tpu.trackers.state import new_sort_state

    cfg = SortConfig(method=method, assignment="auction", max_idle_epochs=5)
    scan = compiled_sort_scan(cfg)
    stream = jnp.asarray(box_stream(steps, n_objects))
    conf = jnp.ones((steps, n_objects), jnp.float32)
    valid = jnp.ones((steps, n_objects), bool)

    state = new_sort_state(4 * n_objects, 1)
    state, out = scan(state, stream, conf, valid, jnp.int32(1))
    jax.block_until_ready(out)  # compile + warmup

    t0 = time.perf_counter()
    for r in range(reps):
        state, out = scan(state, stream, conf, valid, jnp.int32((r + 1) * steps + 1))
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return reps * steps / dt


def bench_batch_sort_scan(n_scenes=64, n_objects=100, steps=32, reps=3):
    import jax
    import jax.numpy as jnp

    from similari_tpu.parallel import batched_sort_scan, new_batched_state
    from similari_tpu.trackers.sort_step import SortConfig

    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5)
    scan = jax.jit(batched_sort_scan(cfg), donate_argnums=(0,))
    flat = box_stream(steps, n_scenes * n_objects)
    stream = jnp.asarray(flat.reshape(steps, n_scenes, n_objects, 5))
    conf = jnp.ones((steps, n_scenes, n_objects), jnp.float32)
    valid = jnp.ones((steps, n_scenes, n_objects), bool)

    states = new_batched_state(n_scenes, 2 * n_objects, 1)
    states, ids = scan(states, stream, conf, valid, jnp.ones((n_scenes,), jnp.int32))
    jax.block_until_ready(ids)

    t0 = time.perf_counter()
    for r in range(reps):
        states, ids = scan(
            states, stream, conf, valid,
            jnp.full((n_scenes,), (r + 1) * steps + 1, jnp.int32),
        )
        jax.block_until_ready(ids)
    dt = time.perf_counter() - t0
    return reps * steps * n_scenes / dt  # scene-frames per second


def main():
    results = {}
    t_start = time.time()
    for name, method, n in (
        ("sort_iou_100", "iou", 100),
        ("sort_maha_100", "maha", 100),
        ("sort_iou_500", "iou", 500),
    ):
        fps = bench_sort_scan(method, n)
        results[name + "_fps"] = fps
        log(f"{name}: {fps:.1f} FPS (reference {BASELINES[name]:.0f}) "
            f"[x{fps / BASELINES[name]:.1f}]")

    scene_fps = bench_batch_sort_scan()
    results["batch_sort_64x100_scene_fps"] = scene_fps
    log(f"batch_sort 64 scenes x 100 objects: {scene_fps:.1f} scene-frames/s "
        f"(reference single-stream {BASELINES['batch_sort_iou_100']:.0f}) "
        f"[x{scene_fps / BASELINES['batch_sort_iou_100']:.1f}]")
    log(f"total bench time: {time.time() - t_start:.1f}s")

    headline = scene_fps
    print(
        json.dumps(
            {
                "metric": "batch_sort_scene_fps",
                "value": round(headline, 2),
                "unit": "scene-frames/sec (64 scenes x 100 objects, IoU)",
                "vs_baseline": round(headline / BASELINES["batch_sort_iou_100"], 3),
                "extra": {k: round(v, 2) for k, v in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
