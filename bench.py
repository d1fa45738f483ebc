#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Scales mirror the reference cargo benches (`/root/reference/benches/`) and the
published numbers in BASELINE.md (Intel i5-7440HQ, 4 cores).  Tracking is
measured as a device-resident pipeline (`lax.scan` over the frame stream).

Timing methodology (IMPORTANT): on the axon dev-TPU tunnel,
`jax.block_until_ready` can return before the computation actually runs
(dispatch-only, lazily relayed), and every true sync costs a ~30 ms RTT.  The
only honest measurement is **scan-length differencing with real d2h fetches**:
run the same compiled pipeline at N_small and N_big steps, sync each run by
fetching one output element, and report
    per_step = (t_big - t_small) / (N_big - N_small).
The RTT, dispatch, state-init and fetch overheads are length-independent and
cancel; the difference is pure device compute.  Verified against the chip's
known bf16 peak (a 4096^3 matmul chain measures ~190 TFLOPS with this method,
vs physically impossible numbers with block_until_ready-based timing).

Diagnostics go to stderr; stdout carries exactly one JSON line for the driver.
"""

import json
import os
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
    "nms_100": 6711.0,
    "nms_oriented_100": 7100.0,
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


def per_step_time(run, n_small, n_big, reps=4, min_delta=0.08, max_big=8192):
    """Honest per-step seconds: fetch-synced runs at two scan lengths.

    If the compute delta between the two lengths is below `min_delta` seconds
    (i.e. within tunnel-RTT jitter), the big length is doubled until the
    signal clears the noise floor.
    """
    import statistics

    run(n_small)  # compile
    while True:
        run(n_big)  # compile
        ts, tb = [], []
        for _ in range(reps):  # interleaved so RTT drift hits both equally
            ts.append(run(n_small))
            tb.append(run(n_big))
        t_s = statistics.median(ts)
        t_b = statistics.median(tb)
        if t_b - t_s >= min_delta or n_big >= max_big:
            break
        n_big *= 2
    return (t_b - t_s) / (n_big - n_small)


def bench_sort_scan(method: str, n_objects: int, oriented=False):
    import jax.numpy as jnp

    from similari_tpu.trackers.sort_step import SortConfig, compiled_sort_scan
    from similari_tpu.trackers.state import new_sort_state

    cfg = SortConfig(
        method=method, assignment="auction", max_idle_epochs=5,
        oriented=oriented,
    )
    scan = compiled_sort_scan(cfg)
    streams = {}

    def run(n):
        if n not in streams:
            s = box_stream(n, n_objects)
            if oriented:
                rng = np.random.default_rng(7)
                s = s.copy()
                s[..., 2] = rng.uniform(0, 0.6, size=s.shape[:2])
            streams[n] = (
                jnp.asarray(s),
                jnp.ones((n, n_objects), jnp.float32),
                jnp.ones((n, n_objects), bool),
            )
        stream, conf, valid = streams[n]
        state = new_sort_state(4 * n_objects, 1)
        t0 = time.perf_counter()
        state, out = scan(state, stream, conf, valid, jnp.int32(1))
        np.asarray(out.track_id[-1, 0])  # true sync
        return time.perf_counter() - t0

    return 1.0 / per_step_time(run, 32, 256)


def bench_batch_sort_scan(n_scenes=64, n_objects=100):
    import jax
    import jax.numpy as jnp

    from similari_tpu.parallel import batched_sort_scan, new_batched_state
    from similari_tpu.trackers.sort_step import SortConfig

    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5,
                     oriented=False)
    scan = jax.jit(batched_sort_scan(cfg))
    streams = {}

    def run(n):
        if n not in streams:
            flat = box_stream(n, n_scenes * n_objects)
            streams[n] = (
                jnp.asarray(flat.reshape(n, n_scenes, n_objects, 5)),
                jnp.ones((n, n_scenes, n_objects), jnp.float32),
                jnp.ones((n, n_scenes, n_objects), bool),
            )
        stream, conf, valid = streams[n]
        states = new_batched_state(n_scenes, 2 * n_objects, 1)
        t0 = time.perf_counter()
        states, ids = scan(states, stream, conf, valid,
                           jnp.ones((n_scenes,), jnp.int32))
        np.asarray(ids[-1, 0, 0])  # true sync
        return time.perf_counter() - t0

    return n_scenes / per_step_time(run, 4, 32)  # scene-frames per second


def bench_visual_scan(n_objects=100, feat_dim=512, gallery=3):
    """Single-scene VisualSORT at the reference bench scales."""
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
    streams = {}

    def run(n):
        if n not in streams:
            streams[n] = (
                jnp.asarray(box_stream(n, n_objects)),
                jnp.asarray(
                    rng.normal(size=(n, n_objects, feat_dim)).astype(np.float32)
                ),
                jnp.ones((n, n_objects), jnp.float32),
                jnp.ones((n, n_objects), bool),
            )
        stream, feat, ones, tru = streams[n]
        state = new_visual_state(4 * n_objects, 1, gallery, feat_dim,
                                 feature_dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        state, out = scan(
            state, stream, ones, tru, feat, tru, ones, ones, jnp.int32(1)
        )
        np.asarray(out.track_id[-1, 0])  # true sync
        return time.perf_counter() - t0

    return 1.0 / per_step_time(run, 32, 256)


def bench_batch_visual_scan(n_scenes=64, n_objects=100, feat_dim=512,
                            gallery=3):
    """North-star config: batch VisualSORT, scene-frames/sec/chip."""
    import jax
    import jax.numpy as jnp

    from similari_tpu.parallel import (
        batched_visual_scan,
        new_batched_visual_state,
    )
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
    scan = jax.jit(batched_visual_scan(cfg))
    rng = np.random.default_rng(0)
    streams = {}

    def run(n):
        if n not in streams:
            flat = box_stream(n, n_scenes * n_objects)
            streams[n] = (
                jnp.asarray(flat.reshape(n, n_scenes, n_objects, 5)),
                jnp.asarray(
                    rng.normal(size=(n, n_scenes, n_objects, feat_dim)).astype(
                        np.float32
                    )
                ),
                jnp.ones((n, n_scenes, n_objects), jnp.float32),
                jnp.ones((n, n_scenes, n_objects), bool),
            )
        stream, feat, ones, tru = streams[n]
        states = new_batched_visual_state(n_scenes, 2 * n_objects, 1, gallery,
                                          feat_dim, feature_dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        states, out = scan(
            states, stream, ones, tru, feat, tru, ones, ones,
            jnp.ones((n_scenes,), jnp.int32),
        )
        np.asarray(out[0][-1, 0, 0])  # true sync
        return time.perf_counter() - t0

    return n_scenes / per_step_time(run, 4, 32)


def bench_nms(n_boxes=100, oriented=False):
    """Device NMS throughput (reference `benches/nms.rs` scales): frames/sec,
    measured as a scan over independent 100-box frames."""
    import jax
    import jax.numpy as jnp

    from similari_tpu.ops.nms import nms_kernel

    rng = np.random.default_rng(3)

    def frames(n):
        b = box_stream(n, n_boxes, seed=5, spread=500.0)
        if oriented:
            b = b.copy()
            b[..., 2] = rng.uniform(0, 0.6, size=b.shape[:2])
        return jnp.asarray(b), jnp.asarray(
            rng.uniform(0.5, 1.0, size=(n, n_boxes)).astype(np.float32)
        )

    valid = jnp.ones((n_boxes,), bool)

    @jax.jit
    def scan_nms(boxes, ranks):
        def body(c, inp):
            b, r = inp
            order = jnp.argsort(-r)
            keep = nms_kernel(b[order], r[order], valid, jnp.float32(0.8))
            return c + jnp.sum(keep), None

        return jax.lax.scan(body, jnp.int32(0), (boxes, ranks))[0]

    cache = {}

    def run(n):
        if n not in cache:
            cache[n] = frames(n)
        boxes, ranks = cache[n]
        t0 = time.perf_counter()
        np.asarray(scan_nms(boxes, ranks))
        return time.perf_counter() - t0

    return 1.0 / per_step_time(run, 32, 256)


def main():
    results = {}
    t_start = time.time()
    extended = os.environ.get("BENCH_EXTENDED") == "1"

    sort_configs = [
        ("sort_iou_100", "iou", 100, False),
        ("sort_maha_100", "maha", 100, False),
        ("sort_iou_oriented_100", "iou", 100, True),
    ]
    if extended:
        sort_configs.append(("sort_iou_500", "iou", 500, False))
    for name, method, n, oriented in sort_configs:
        fps = bench_sort_scan(method, n, oriented=oriented)
        results[name + "_fps"] = fps
        log(f"{name}: {fps:.1f} FPS (reference {BASELINES[name]:.0f}) "
            f"[x{fps / BASELINES[name]:.1f}]")

    scene_fps = bench_batch_sort_scan()
    results["batch_sort_64x100_scene_fps"] = scene_fps
    log(f"batch_sort 64 scenes x 100 objects: {scene_fps:.1f} scene-frames/s "
        f"(reference single-stream {BASELINES['batch_sort_iou_100']:.0f}) "
        f"[x{scene_fps / BASELINES['batch_sort_iou_100']:.1f}]")

    visual_dims = (
        ((128, 262.0), (512, 173.0), (2048, 94.0)) if extended
        else ((512, 173.0),)
    )
    for dim, base in visual_dims:
        fps = bench_visual_scan(n_objects=100, feat_dim=dim)
        results[f"visual_sort_100x{dim}_fps"] = fps
        log(f"visual_sort 100 obj x {dim}d: {fps:.1f} FPS "
            f"(reference {base:.0f}) [x{fps / base:.1f}]")

    if extended:
        for name, ori in (("nms_100", False), ("nms_oriented_100", True)):
            fps = bench_nms(oriented=ori)
            results[name + "_fps"] = fps
            log(f"{name}: {fps:.1f} frames/s (reference "
                f"{BASELINES[name]:.0f}) [x{fps / BASELINES[name]:.1f}]")

        # pod-scale per-chip configs (BASELINE config 5: 1024 streams; the
        # multi-chip shard_map path is validated by dryrun_multichip, this
        # measures the per-chip slice at scale)
        fps = bench_batch_sort_scan(n_scenes=1024, n_objects=100)
        results["batch_sort_1024x100_scene_fps"] = fps
        log(f"batch_sort 1024 scenes x 100 objects: {fps:.1f} scene-frames/s "
            f"[x{fps / BASELINES['batch_sort_iou_100']:.1f}]")
        fps = bench_batch_visual_scan(n_scenes=256)
        results["batch_visual_256x100x512_scene_fps"] = fps
        log(f"batch_visual 256 scenes x 100 obj x 512d: {fps:.1f} "
            f"scene-frames/s [x{fps / BASELINES['visual_sort_100x512']:.1f}]")

    vscene_fps = bench_batch_visual_scan()
    results["batch_visual_64x100x512_scene_fps"] = vscene_fps
    log(f"batch_visual 64 scenes x 100 obj x 512d: {vscene_fps:.1f} "
        f"scene-frames/s (reference single-stream "
        f"{BASELINES['visual_sort_100x512']:.0f}) "
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
