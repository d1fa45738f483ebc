"""Stage ablation for the batched VisualSORT step (roofline evidence).

Times compiled stage programs that mirror the production step's structure
with the honest scan-length-differencing estimator (see bench.py
`per_step_time`, ARCHITECTURE.md §6):

  full        — the production step (distance + cascade + KF + merge)
  posonly     — IoU + compatibility weights only (tiny scan carry)
  votesonly   — gallery distances + gates + votes only (per-step feature
                perturbation defeats loop-invariant hoisting)
  auctiononly — the positional auction (solve_voting) on per-step
                perturbed tracking-shaped weights
  mergeonly   — the one-hot state merge with synthetic per-step writers
                (state carried and donated, like production)

Stage variants keep the big state OUT of the scan carry (an unchanged
pass-through carry makes XLA copy the whole state every iteration — the
first version of this tool measured exactly that artifact).

Usage: `python tools/ablate_visual.py [scenes]`.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp

    from similari_tpu.ops import assignment as asg
    from similari_tpu.ops import merge as mrg
    from similari_tpu.parallel import (
        batched_visual_step,
        new_batched_visual_state,
    )
    from similari_tpu.trackers import visual_step as V
    from similari_tpu.trackers.visual_step import VisualConfig

    scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_objects, feat_dim, gallery, base_len = 100, 512, 3, 8
    t_cap = 2 * n_objects

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
            scenes, t_cap, 1, gallery, feat_dim, feature_dtype=jnp.bfloat16)

    # a fixed state snapshot used as a closure constant by stage variants
    # (warmed so galleries are populated and tracks active)
    vstep = batched_visual_step(cfg)
    warm = fresh()
    for i in range(4):
        warm, _ = vstep(warm, boxes[i % base_len], ones, tru, feat, tru,
                        ones, ones, jnp.full((scenes,), 1 + i, jnp.int32))
    warm = jax.tree.map(lambda a: a.copy(), warm)

    times = {}

    def measure(name, run):
        dt = B.per_step_time(run, base_len)
        times[name] = dt
        print(f"{name:12s}: {dt * 1e3:8.3f} ms/step "
              f"({dt * 1e6 / scenes:7.2f} us/scene-frame)", flush=True)

    # ---- full producticon step -------------------------------------------
    @jax.jit
    def scan_full(states, bstream, epochs0):
        def body(st, inp):
            b, i = inp
            st, out = vstep(st, b, ones, tru, feat, tru, ones, ones,
                            epochs0 + i)
            return st, out.track_id
        idx = jnp.arange(bstream.shape[0], dtype=jnp.int32)
        return jax.lax.scan(body, states, (bstream, idx))

    def run_full(k):
        states = fresh()
        out = None
        t0 = time.perf_counter()
        for i in range(k):
            states, out = scan_full(
                states, boxes, jnp.full((scenes,), 1 + i * base_len,
                                        jnp.int32))
        np.asarray(out)
        return time.perf_counter() - t0

    measure("full", run_full)

    # ---- positional stage -------------------------------------------------
    @jax.jit
    def scan_pos(tot0, bstream, epochs0):
        def per_scene(s_, b_, e_):
            compat = V._compat_matrix(cfg, s_, b_, e_)
            P, v = V.positional_weights(cfg, s_, b_, ones[0], compat)
            return jnp.sum(P) + jnp.sum(v)
        def body(tot, inp):
            b, i = inp
            tot = tot + jnp.sum(jax.vmap(per_scene, in_axes=(0, 0, 0))(
                warm, b, epochs0 + i))
            return tot, ()
        idx = jnp.arange(bstream.shape[0], dtype=jnp.int32)
        return jax.lax.scan(body, tot0, (bstream, idx))[0]

    def run_pos(k):
        tot = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(k):
            tot = scan_pos(tot, boxes,
                           jnp.full((scenes,), 1 + i * base_len, jnp.int32))
        np.asarray(tot)
        return time.perf_counter() - t0

    measure("posonly", run_pos)

    # ---- gallery/votes stage ---------------------------------------------
    @jax.jit
    def scan_votes(tot0, bstream, epochs0):
        def per_scene(s_, b_, e_, f_):
            compat = V._compat_matrix(cfg, s_, b_, e_)
            votes, w = V.visual_votes(cfg, s_, f_, tru[0], compat)
            return jnp.sum(votes) + jnp.sum(w)
        def body(tot, inp):
            b, i = inp
            f_i = feat * (1.0 + 1e-6 * i.astype(jnp.float32))
            tot = tot + jnp.sum(jax.vmap(per_scene, in_axes=(0, 0, 0, 0))(
                warm, b, epochs0 + i, f_i))
            return tot, ()
        idx = jnp.arange(bstream.shape[0], dtype=jnp.int32)
        return jax.lax.scan(body, tot0, (bstream, idx))[0]

    def run_votes(k):
        tot = jnp.float32(0)
        t0 = time.perf_counter()
        for i in range(k):
            tot = scan_votes(tot, boxes,
                             jnp.full((scenes,), 1 + i * base_len, jnp.int32))
        np.asarray(tot)
        return time.perf_counter() - t0

    measure("votesonly", run_votes)

    # ---- auction stage ----------------------------------------------------
    # tracking-shaped positional weights from the warm state, perturbed per
    # step so nothing hoists; same solver call as the production step
    @jax.jit
    def base_weights(b0, e0):
        def per_scene(s_, b_, e_):
            compat = V._compat_matrix(cfg, s_, b_, e_)
            P, v = V.positional_weights(cfg, s_, b_, ones[0], compat)
            return jnp.where(v, P, 0.0)
        return jax.vmap(per_scene, in_axes=(0, 0, 0))(warm, b0, e0)

    W0 = base_weights(boxes[0], jnp.full((scenes,), 5, jnp.int32))
    solve = jax.vmap(
        lambda w: asg.solve_voting(
            w, cfg.new_track_threshold, tru[0],
            jnp.ones((t_cap,), bool), "auction"))

    @jax.jit
    def scan_auction(tot0, idxs):
        def body(tot, i):
            w = W0 * (1.0 + 1e-5 * i.astype(jnp.float32))
            col = solve(w)
            return tot + jnp.sum(col), ()
        return jax.lax.scan(body, tot0, idxs)[0]

    def run_auction(k):
        tot = jnp.int32(0)
        t0 = time.perf_counter()
        for i in range(k):
            tot = scan_auction(tot, jnp.arange(base_len, dtype=jnp.int32))
        np.asarray(tot)
        return time.perf_counter() - t0

    measure("auctiononly", run_auction)

    # ---- state-merge stage ------------------------------------------------
    d = n_objects

    @jax.jit
    def scan_merge(states, bstream):
        def body(st, inp):
            b, i = inp
            slot = jnp.broadcast_to(
                (jnp.arange(d, dtype=jnp.int32) + i) % t_cap, (scenes, d))
            def per_scene(s_, b_, sl_):
                hit = mrg.writer_hit(sl_, tru[0], t_cap)
                hix = jnp.zeros((d,), jnp.int32)
                import dataclasses as dc
                return dc.replace(
                    s_,
                    pred_box=mrg.merge_rows(s_.pred_box, b_, hit),
                    obs_box=mrg.merge_rows(s_.obs_box, b_, hit),
                    conf=mrg.merge_rows(s_.conf, ones[0], hit),
                    length=mrg.merge_rows(s_.length, 1 + 0 * sl_, hit),
                    track_id=mrg.merge_rows(s_.track_id, sl_, hit),
                    feats=mrg.merge_lane(s_.feats, feat[0],
                                         jnp.zeros((d,), jnp.int32), hit),
                    feat_quality=mrg.merge_rows(
                        s_.feat_quality,
                        jnp.zeros((d, s_.gallery_size), jnp.float32), hit),
                    hist_feat=mrg.merge_ring(s_.hist_feat, feat[0], hix, hit),
                    collected=mrg.merge_rows(s_.collected, 1 + 0 * sl_, hit),
                )
            st = jax.vmap(per_scene, in_axes=(0, 0, 0))(st, b, slot)
            return st, ()
        idx = jnp.arange(bstream.shape[0], dtype=jnp.int32)
        return jax.lax.scan(body, states, (bstream, idx))[0]

    def run_merge(k):
        states = fresh()
        t0 = time.perf_counter()
        for i in range(k):
            states = scan_merge(states, boxes)
        np.asarray(states.conf[0, 0])
        return time.perf_counter() - t0

    measure("mergeonly", run_merge)

    rest = (times["full"] - times["posonly"] - times["votesonly"]
            - times["auctiononly"] - times["mergeonly"])
    print("--- breakdown (per batch step) ---")
    print(f"positional stage : {times['posonly'] * 1e3:8.3f} ms")
    print(f"gallery stage    : {times['votesonly'] * 1e3:8.3f} ms")
    print(f"auction          : {times['auctiononly'] * 1e3:8.3f} ms")
    print(f"state merge      : {times['mergeonly'] * 1e3:8.3f} ms")
    print(f"KF+bestfit+rest  : {rest * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
