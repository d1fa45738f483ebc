#!/usr/bin/env python
"""Measure the batched gallery-merge strategies on the real TPU (round-5
VERDICT item 4).

The batched VisualSORT step spends ~0.70 ms of its 2.50 ms (256 scenes) in
the one-hot state merge; §4c's roofline says ~0.5 ms of that is the
read-modify-write of the big feature arrays (feats [S,T,K,F] bf16 +
hist_feat [S,T,H,F]) to place D rows/scene.  Three candidate forms, timed
at the bench shape with fetch-synced chained-call differencing:

  onehot   — the shipping XLA form (ops/merge.py merge_lane, vmapped)
  scatter  — ONE flattened .at[rows].set over [S*T*K, F] (not vmapped —
             the round-3 finding only condemned VMAPPED scatters)
  pallas   — ops/pallas_merge.lane_merge_inplace: state stays in HBM,
             aliased in->out, D row-DMAs per scene (never touches
             untouched rows)

Run on the dev TPU: python tools/experiment_batch_merge.py
"""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench import per_step_time
    from similari_tpu.ops import merge as mrg
    from similari_tpu.ops.pallas_merge import lane_merge_inplace

    S, T, K, F, D = 256, 200, 3, 512, 128
    L = 16  # scan length
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    feats0 = jnp.asarray(
        rng.normal(size=(S, T, K, F)).astype(np.float32)).astype(dtype)
    src = jnp.asarray(
        rng.normal(size=(L, S, D, F)).astype(np.float32)).astype(dtype)
    # unique slots per (step, scene); lanes random; ~100/128 valid
    slot = np.stack([
        np.stack([rng.permutation(T)[:D] for _ in range(S)])
        for _ in range(L)
    ]).astype(np.int32)
    lane = rng.integers(0, K, size=(L, S, D)).astype(np.int32)
    valid = (rng.random((L, S, D)) < 100 / 128).astype(np.int32)
    slot_j = jnp.asarray(slot)
    lane_j = jnp.asarray(lane)
    valid_j = jnp.asarray(valid)

    interpret = jax.default_backend() == "cpu"

    # ---- variant bodies --------------------------------------------------
    def onehot_body(feats, inp):
        sl, ln, va, sr = inp
        hit = jax.vmap(mrg.writer_hit, in_axes=(0, 0, None))(
            sl, va.astype(bool), T)
        out = jax.vmap(mrg.merge_lane)(feats, sr, ln, hit)
        return out, out[0, 0, 0, 0]

    def scatter_body(feats, inp):
        sl, ln, va, sr = inp
        scene = jnp.arange(S, dtype=jnp.int32)[:, None]
        rows = (scene * T + sl) * K + ln
        rows = jnp.where(va.astype(bool), rows, S * T * K)  # drop invalid
        flat = feats.reshape(S * T * K, F)
        flat = flat.at[rows.reshape(-1)].set(
            sr.reshape(S * D, F), mode="drop", unique_indices=True)
        out = flat.reshape(S, T, K, F)
        return out, out[0, 0, 0, 0]

    def pallas_body(feats, inp):
        sl, ln, va, sr = inp
        rows = sl * K + ln
        out = lane_merge_inplace(
            feats.reshape(S, T * K, F), sr, rows, va, interpret=interpret)
        out = out.reshape(S, T, K, F)
        return out, out[0, 0, 0, 0]

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*",
                    default=["onehot", "scatter", "pallas"])
    args = ap.parse_args()

    results = {}
    all_bodies = {"onehot": onehot_body, "scatter": scatter_body,
                  "pallas": pallas_body}
    for name in args.variants:
        body = all_bodies[name]
        log(f"compiling {name}...")
        # streams ride as ARGUMENTS: closure constants get inlined into
        # the HLO as literals and the 134 MB src stream blows the tunnel
        # remote-compile payload limit (HTTP 413)
        @partial(jax.jit, donate_argnums=0)
        def scan_fn(feats, sl, ln, va, sr, body=body):
            return jax.lax.scan(body, feats, (sl, ln, va, sr))

        def run(k):
            feats = feats0 + 0  # fresh donatable buffer
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                feats, out = scan_fn(feats, slot_j, lane_j, valid_j, src)
            np.asarray(out[-1])  # true sync
            return time.perf_counter() - t0

        try:
            dt = per_step_time(run, L)
            results[name] = dt
            tb = S * (2 * D * F * 2)  # payload r+w bytes per step
            log(f"{name}: {dt * 1e3:.3f} ms/step  "
                f"({S * T * K * F * 2 * 2 / dt / 1e9:.0f} GB/s if full r+w; "
                f"payload-only {tb / dt / 1e9:.0f} GB/s)")
        except Exception as e:
            log(f"{name} FAILED: {e!r}")

    # parity spot check (small shapes, same bodies)
    if "pallas" in results or interpret:
        f0 = np.asarray(feats0[:2, :8]).astype(np.float32)
        pass  # parity covered by tests/test_pallas_merge.py

    if results:
        base = results.get("onehot")
        for k, v in results.items():
            log(f"{k}: x{base / v:.2f} vs onehot")
    print(results)


if __name__ == "__main__":
    main()
