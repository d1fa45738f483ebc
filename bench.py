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
    "sort_iou_oriented_100": 624.0,
    "sort_iou_500": 53.0,
    "batch_sort_iou_100": 618.0,
    "visual_sort_100x512": 173.0,
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


def bench_sort_scan(method: str, n_objects: int, steps=128, reps=5,
                    oriented=False):
    import jax
    import jax.numpy as jnp

    from similari_tpu.trackers.sort_step import SortConfig, compiled_sort_scan
    from similari_tpu.trackers.state import new_sort_state

    cfg = SortConfig(
        method=method, assignment="auction", max_idle_epochs=5,
        oriented=oriented,
    )
    scan = compiled_sort_scan(cfg)
    stream = box_stream(steps, n_objects)
    if oriented:
        rng = np.random.default_rng(7)
        stream = stream.copy()
        stream[..., 2] = rng.uniform(0, 0.6, size=stream.shape[:2])
    stream = jnp.asarray(stream)
    conf = jnp.ones((steps, n_objects), jnp.float32)
    valid = jnp.ones((steps, n_objects), bool)

    state = new_sort_state(4 * n_objects, 1)
    state, out = scan(state, stream, conf, valid, jnp.int32(1))
    jax.block_until_ready(out)  # compile + warmup

    best = 0.0
    for r in range(reps):
        t0 = time.perf_counter()
        state, out = scan(state, stream, conf, valid, jnp.int32((r + 1) * steps + 1))
        jax.block_until_ready(out)
        best = max(best, steps / (time.perf_counter() - t0))
    return best


def bench_batch_sort_scan(n_scenes=64, n_objects=100, steps=32, reps=3):
    import jax
    import jax.numpy as jnp

    from similari_tpu.parallel import batched_sort_scan, new_batched_state
    from similari_tpu.trackers.sort_step import SortConfig

    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5, oriented=False)
    scan = jax.jit(batched_sort_scan(cfg), donate_argnums=(0,))
    flat = box_stream(steps, n_scenes * n_objects)
    stream = jnp.asarray(flat.reshape(steps, n_scenes, n_objects, 5))
    conf = jnp.ones((steps, n_scenes, n_objects), jnp.float32)
    valid = jnp.ones((steps, n_scenes, n_objects), bool)

    states = new_batched_state(n_scenes, 2 * n_objects, 1)
    states, ids = scan(states, stream, conf, valid, jnp.ones((n_scenes,), jnp.int32))
    jax.block_until_ready(ids)

    best = 0.0
    for r in range(reps):
        t0 = time.perf_counter()
        states, ids = scan(
            states, stream, conf, valid,
            jnp.full((n_scenes,), (r + 1) * steps + 1, jnp.int32),
        )
        jax.block_until_ready(ids)
        best = max(best, steps * n_scenes / (time.perf_counter() - t0))
    return best  # scene-frames per second


def bench_visual_scan(n_objects=100, feat_dim=512, gallery=3, steps=64, reps=3):
    """Single-scene VisualSORT at the reference bench scales."""
    import jax
    import jax.numpy as jnp

    from similari_tpu.trackers.visual_state import new_visual_state
    from similari_tpu.trackers.visual_step import (
        VisualConfig,
        compiled_visual_scan,
    )

    cfg = VisualConfig(
        positional_kind="iou",
        visual_kind="euclidean",
        visual_threshold=100.0,
        visual_minimal_track_length=3,
        max_idle_epochs=5,
        assignment="auction",
        oriented=False,
        feature_precision="bf16",
    )
    scan = compiled_visual_scan(cfg)
    rng = np.random.default_rng(0)
    stream = jnp.asarray(box_stream(steps, n_objects))
    feat = jnp.asarray(rng.normal(size=(steps, n_objects, feat_dim)).astype(np.float32))
    ones = jnp.ones((steps, n_objects), jnp.float32)
    tru = jnp.ones((steps, n_objects), bool)

    state = new_visual_state(4 * n_objects, 1, gallery, feat_dim)
    state, out = scan(state, stream, ones, tru, feat, tru, ones, ones, jnp.int32(1))
    jax.block_until_ready(out)
    best = 0.0
    for r in range(reps):
        t0 = time.perf_counter()
        state, out = scan(
            state, stream, ones, tru, feat, tru, ones, ones,
            jnp.int32((r + 1) * steps + 1),
        )
        jax.block_until_ready(out)
        best = max(best, steps / (time.perf_counter() - t0))
    return best


def bench_batch_visual_scan(
    n_scenes=64, n_objects=100, feat_dim=512, gallery=3, steps=16, reps=3
):
    """North-star config: batch VisualSORT, scenes/sec/chip."""
    import jax
    import jax.numpy as jnp

    from similari_tpu.parallel import batched_visual_scan, new_batched_visual_state
    from similari_tpu.trackers.visual_step import VisualConfig

    cfg = VisualConfig(
        positional_kind="iou",
        visual_kind="euclidean",
        visual_threshold=100.0,
        visual_minimal_track_length=3,
        max_idle_epochs=5,
        assignment="auction",
        oriented=False,
        feature_precision="bf16",
    )
    scan = jax.jit(batched_visual_scan(cfg), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    flat = box_stream(steps, n_scenes * n_objects)
    stream = jnp.asarray(flat.reshape(steps, n_scenes, n_objects, 5))
    feat = jnp.asarray(
        rng.normal(size=(steps, n_scenes, n_objects, feat_dim)).astype(np.float32)
    )
    ones = jnp.ones((steps, n_scenes, n_objects), jnp.float32)
    tru = jnp.ones((steps, n_scenes, n_objects), bool)

    states = new_batched_visual_state(n_scenes, 2 * n_objects, 1, gallery, feat_dim)
    states, out = scan(
        states, stream, ones, tru, feat, tru, ones, ones,
        jnp.ones((n_scenes,), jnp.int32),
    )
    jax.block_until_ready(out)
    best = 0.0
    for r in range(reps):
        t0 = time.perf_counter()
        states, out = scan(
            states, stream, ones, tru, feat, tru, ones, ones,
            jnp.full((n_scenes,), (r + 1) * steps + 1, jnp.int32),
        )
        jax.block_until_ready(out)
        best = max(best, steps * n_scenes / (time.perf_counter() - t0))
    return best


def main():
    results = {}
    t_start = time.time()
    import os
    extended = os.environ.get("BENCH_EXTENDED") == "1"
    sort_configs = [
        ("sort_iou_100", "iou", 100),
        ("sort_maha_100", "maha", 100),
    ]
    if extended:
        sort_configs.append(("sort_iou_500", "iou", 500))
    for name, method, n in sort_configs:
        fps = bench_sort_scan(method, n)
        results[name + "_fps"] = fps
        log(f"{name}: {fps:.1f} FPS (reference {BASELINES[name]:.0f}) "
            f"[x{fps / BASELINES[name]:.1f}]")

    fps = bench_sort_scan("iou", 100, oriented=True)
    results["sort_iou_oriented_100_fps"] = fps
    log(f"sort_iou_oriented_100: {fps:.1f} FPS (reference "
        f"{BASELINES['sort_iou_oriented_100']:.0f}) "
        f"[x{fps / BASELINES['sort_iou_oriented_100']:.1f}]")

    scene_fps = bench_batch_sort_scan()
    results["batch_sort_64x100_scene_fps"] = scene_fps
    log(f"batch_sort 64 scenes x 100 objects: {scene_fps:.1f} scene-frames/s "
        f"(reference single-stream {BASELINES['batch_sort_iou_100']:.0f}) "
        f"[x{scene_fps / BASELINES['batch_sort_iou_100']:.1f}]")

    visual_dims = ((128, 262.0), (512, 173.0), (2048, 94.0)) if extended else ((512, 173.0),)
    for dim, base in visual_dims:
        fps = bench_visual_scan(n_objects=100, feat_dim=dim)
        results[f"visual_sort_100x{dim}_fps"] = fps
        log(f"visual_sort 100 obj x {dim}d: {fps:.1f} FPS "
            f"(reference {base:.0f}) [x{fps / base:.1f}]")

    vscene_fps = bench_batch_visual_scan()
    results["batch_visual_64x100x512_scene_fps"] = vscene_fps
    log(f"batch_visual 64 scenes x 100 obj x 512d: {vscene_fps:.1f} "
        f"scene-frames/s (reference single-stream {BASELINES['visual_sort_100x512']:.0f}) "
        f"[x{vscene_fps / BASELINES['visual_sort_100x512']:.1f}]")
    log(f"total bench time: {time.time() - t_start:.1f}s")

    headline = vscene_fps
    print(
        json.dumps(
            {
                "metric": "batch_visual_sort_scene_fps",
                "value": round(headline, 2),
                "unit": "scene-frames/sec (64 scenes x 100 objects x 512-d, gallery 3)",
                "vs_baseline": round(headline / BASELINES["visual_sort_100x512"], 3),
                "extra": {k: round(v, 2) for k, v in results.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
