"""Stage ablation for the batched VisualSORT step (roofline evidence).

Times DCE-ablated variants of the real batched step with the honest
scan-length-differencing estimator (see bench.py `per_step_time`,
ARCHITECTURE.md §6) and prints a per-stage cost breakdown:

  full      — the production step (distance + cascade + KF + merge)
  nomerge   — returns the old state: XLA dead-code-eliminates the state
              merge; full - nomerge = merge cost
  votesonly — returns only the visual vote counts: auction, best-fit, KF
              and merge all DCE'd; measures gallery distances + gates
  posonly   — returns only the positional weight matrix: measures the
              IoU + compatibility stage

Ablated variants do NOT donate state (returning the input state aliased
with donation is invalid).  Usage: `python tools/ablate_visual.py [scenes]`.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp

    from similari_tpu.parallel import (
        batched_visual_step,
        new_batched_visual_state,
    )
    from similari_tpu.trackers import visual_step as V
    from similari_tpu.trackers.visual_step import VisualConfig

    scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_objects, feat_dim, gallery, base_len = 100, 512, 3, 8

    cfg = VisualConfig(
        positional_kind="iou", visual_kind="euclidean",
        visual_threshold=100.0, visual_minimal_track_length=3,
        max_idle_epochs=5, assignment="auction", oriented=False,
        feature_precision="bf16",
    )
    rng = np.random.default_rng(0)
    flat = B.box_stream(base_len, scenes * n_objects)
    boxes = jnp.asarray(flat.reshape(base_len, scenes, n_objects, 5))
    feat = jnp.asarray(
        rng.normal(size=(scenes, n_objects, feat_dim)).astype(np.float32))
    ones = jnp.ones((scenes, n_objects), jnp.float32)
    tru = jnp.ones((scenes, n_objects), bool)

    def fresh():
        return new_batched_visual_state(
            scenes, 2 * n_objects, 1, gallery, feat_dim,
            feature_dtype=jnp.bfloat16)

    vstep = batched_visual_step(cfg)

    def scan_of(body):
        @jax.jit
        def scan_fn(states, bstream, epochs0):
            def wrap(st, inp):
                b, i = inp
                return body(st, b, epochs0 + i)
            idx = jnp.arange(bstream.shape[0], dtype=jnp.int32)
            return jax.lax.scan(wrap, states, (bstream, idx))
        return scan_fn

    # --- variants ---------------------------------------------------------
    def body_full(st, b, ep):
        st, out = vstep(st, b, ones, tru, feat, tru, ones, ones, ep)
        return st, out.track_id

    def body_nomerge(st, b, ep):
        _, out = vstep(st, b, ones, tru, feat, tru, ones, ones, ep)
        return st, out.track_id

    def body_votesonly(st, b, ep):
        def per_scene(s_, b_, e_, f_):
            compat = V._compat_matrix(cfg, s_, b_, e_)
            area_ok = b_[:, 3] * b_[:, 4] * b_[:, 4] >= cfg.visual_minimal_area
            use_gate = tru[0] & area_ok
            votes, w = V.visual_votes(cfg, s_, f_, use_gate, compat)
            return jnp.sum(votes) + jnp.sum(w)
        tot = jax.vmap(per_scene)(st, b, ep, feat)
        return st, tot

    def body_posonly(st, b, ep):
        def per_scene(s_, b_, e_):
            compat = V._compat_matrix(cfg, s_, b_, e_)
            P, v = V.positional_weights(cfg, s_, b_, ones[0], compat)
            return jnp.sum(P) + jnp.sum(v)
        tot = jax.vmap(per_scene)(st, b, ep)
        return st, tot

    variants = [
        ("full", body_full),
        ("nomerge", body_nomerge),
        ("votesonly", body_votesonly),
        ("posonly", body_posonly),
    ]
    times = {}
    for name, body in variants:
        scan_fn = scan_of(body)

        def run(k, scan_fn=scan_fn):
            states = fresh()
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                states, out = scan_fn(
                    states, boxes,
                    jnp.full((scenes,), 1 + i * base_len, jnp.int32))
            arr = np.asarray(out)  # true sync
            del arr
            return time.perf_counter() - t0

        dt = B.per_step_time(run, base_len)
        times[name] = dt
        print(f"{name:10s}: {dt * 1e3:8.3f} ms/step "
              f"({dt * 1e6 / scenes:7.2f} us/scene-frame)", flush=True)

    merge = times["full"] - times["nomerge"]
    cascade = times["nomerge"] - times["votesonly"] - times["posonly"]
    print("--- breakdown (per batch step) ---")
    print(f"positional stage : {times['posonly'] * 1e3:8.3f} ms")
    print(f"gallery stage    : {times['votesonly'] * 1e3:8.3f} ms")
    print(f"cascade+KF (rest): {cascade * 1e3:8.3f} ms")
    print(f"state merge      : {merge * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
