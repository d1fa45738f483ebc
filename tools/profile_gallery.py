#!/usr/bin/env python
"""Profile the cross-shard gallery query: scoring vs gather+merge
(round-5 VERDICT item 5).

`POD_r04.json` showed total gallery qps on the VIRTUAL 8-device CPU mesh
falling ~x7 from n=1 to n=8 — the only workload whose total throughput
declines with mesh size.  This tool separates the two candidate causes by
measuring, at each mesh size, BOTH query forms:

  local  — per-shard scoring + local top-k only (parallel/gallery.py
           local_gallery_query: the n-fold-growing matmul work, zero
           collectives)
  global — the full query (scoring + all_gather of n*k candidates/query
           + global top-k merge)

The difference global − local is the gather+merge layer.  Alongside, the
tool prints the actual collective payload (n·Q·k·16 B per call) and the
real-ICI transfer-time bound for that payload, so §8 can carry the
crossover math instead of a hand-wave.  Medians of --point-reps runs.

Run: python tools/profile_gallery.py [--devices 8] (CPU virtual mesh; on
a real pod slice the same tool reports the real-ICI numbers directly).
"""

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _measure(qfn, states, qs, per_step_time, k_big=64, max_k=16384):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = qfn(states, qs + np.float32(i) * 1e-6)
        np.asarray(out[0].ravel()[0])  # true sync
        return time.perf_counter() - t0

    return per_step_time(run, 1, k_big=k_big, max_k=max_k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--scenes-per-device", type=int, default=32)
    ap.add_argument("--objects", type=int, default=100)
    ap.add_argument("--feat-dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--topk", type=int, default=8)
    ap.add_argument("--point-reps", type=int, default=3)
    ap.add_argument("--counts", type=int, nargs="*", default=None,
                    help="mesh sizes to run (default: 1,2,4,..,devices)")
    ap.add_argument("--out", default="GALLERY_PROFILE_r05.json")
    args = ap.parse_args()

    import dataclasses
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("PROFILE_GALLERY_TPU") != "1":
        # virtual CPU mesh (the only multi-device signal in this env);
        # jax is preimported with the axon backend, so flip via config
        # (bench_pod.py's mechanism), not env vars
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)

    from bench import per_step_time
    from similari_tpu.parallel import (
        new_batched_visual_state,
        scene_mesh,
        shard_batched_state,
    )
    from similari_tpu.parallel.gallery import (
        global_gallery_query,
        local_gallery_query,
    )

    n_avail = len(jax.devices())
    counts = args.counts
    if not counts:
        counts = []
        n = 1
        while n <= min(args.devices, n_avail):
            counts.append(n)
            n *= 2

    rng = np.random.default_rng(1)
    rows = {}
    for n_dev in counts:
        mesh = scene_mesh(n_dev)
        scenes = args.scenes_per_device * n_dev
        gallery = 3
        states = new_batched_visual_state(
            scenes, 2 * args.objects, 1, gallery, args.feat_dim)
        states = dataclasses.replace(
            states,
            feats=jnp.asarray(rng.normal(
                size=states.feats.shape).astype(np.float32)),
            feat_valid=jnp.ones(states.feat_valid.shape, bool),
            active=jnp.ones(states.active.shape, bool),
            track_id=jnp.arange(
                scenes * 2 * args.objects, dtype=jnp.int32
            ).reshape(scenes, 2 * args.objects),
        )
        states = shard_batched_state(states, mesh)
        qs = jnp.asarray(rng.normal(
            size=(args.queries, args.feat_dim)).astype(np.float32))
        gq = global_gallery_query("cosine", args.topk, mesh)
        lq = local_gallery_query("cosine", args.topk, mesh)

        # heavily time-shared big meshes: long chained-call queues can
        # starve one of the n device threads past XLA:CPU's 40 s
        # all-gather rendezvous watchdog (a hard abort) — keep the
        # chains short there and accept the extra noise
        kb, mk = (64, 16384) if n_dev <= 4 else (4, 16)
        full, loc = [], []
        for _ in range(args.point_reps):
            full.append(_measure(gq, states, qs, per_step_time, kb, mk))
            loc.append(_measure(lq, states, qs, per_step_time, kb, mk))
        f_med = statistics.median(full)
        l_med = statistics.median(loc)
        gather_ms = (f_med - l_med) * 1e3
        payload = n_dev * args.queries * args.topk * 16  # 4 arrays x 4 B
        lanes = scenes * 2 * args.objects * gallery
        rows[f"n{n_dev}"] = {
            "full_ms": round(f_med * 1e3, 3),
            "full_spread_ms": [round(min(full) * 1e3, 3),
                               round(max(full) * 1e3, 3)],
            "scoring_ms": round(l_med * 1e3, 3),
            "scoring_spread_ms": [round(min(loc) * 1e3, 3),
                                  round(max(loc) * 1e3, 3)],
            "gather_merge_ms": round(gather_ms, 3),
            "gather_payload_bytes": payload,
            "qps_total": round(args.queries / f_med, 1),
            "gallery_lanes": lanes,
        }
        log(f"n={n_dev}: full {f_med * 1e3:8.3f} ms  scoring "
            f"{l_med * 1e3:8.3f} ms  gather+merge {gather_ms:7.3f} ms  "
            f"payload {payload / 1024:.0f} KiB  "
            f"qps {args.queries / f_med:8.1f} over {lanes} lanes")

    # real-ICI bound for the gathered payload (v5e: ~45 GB/s per direction
    # per link, ring all-gather moves (n-1)/n of the payload per hop)
    for key, r in rows.items():
        n_dev = int(key[1:])
        ici_us = r["gather_payload_bytes"] / 45e9 * 1e6
        r["ici_transfer_bound_us"] = round(ici_us, 2)
    blob = {
        "metric": "gallery_query_profile",
        "backend": jax.default_backend(),
        "config": vars(args),
        "rows": rows,
    }
    Path(args.out).write_text(json.dumps(blob, indent=1))
    print(json.dumps({"metric": "gallery_profile_rows", "value": len(rows)}))


if __name__ == "__main__":
    main()
