"""Multi-camera identity stitching across scene shards.

The reference demonstrates multi-camera track merging host-side with two
stores and attribute merges (`/root/reference/examples/track_merging.rs`).
At pod scale the same story is three collectives-backed device ops
(`similari_tpu.parallel`):

  1. each camera (scene) tracks locally on its shard — zero cross-shard
     traffic in the per-frame hot path;
  2. when a camera starts a fresh track, a `global_gallery_query`
     (all_gather two-level top-k) asks every shard "have you seen this
     appearance?";
  3. on a hit, `track_merge` stitches the new track into the global
     identity: the gallery rides one psum to the owner, qualities pick the
     surviving top-K features, and the duplicate slot is freed.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from similari_tpu.parallel import (  # noqa: E402
    global_gallery_query,
    new_batched_visual_state,
    scene_mesh,
    shard_batched_state,
    sharded_visual_step,
    track_merge,
)
from similari_tpu.trackers.visual_step import VisualConfig  # noqa: E402


def main():
    n_dev = min(4, len(jax.devices()))
    mesh = scene_mesh(n_dev)
    n_scenes = 2 * n_dev  # two cameras per shard
    d, t, k, f = 4, 16, 3, 64

    cfg = VisualConfig(
        positional_kind="iou",
        visual_kind="cosine",
        visual_threshold=0.3,
        visual_minimal_track_length=1,
        max_idle_epochs=10,
        assignment="auction",
    )
    step = sharded_visual_step(cfg, mesh)
    state = shard_batched_state(
        new_batched_visual_state(n_scenes, t, 2, k, f), mesh
    )

    rng = np.random.default_rng(0)
    signature = rng.normal(size=(f,)).astype(np.float32)  # the person's ReID

    def frame(scene_of_person, epoch, jitter):
        box = np.zeros((n_scenes, d, 5), np.float32)
        feat = np.zeros((n_scenes, d, f), np.float32)
        valid = np.zeros((n_scenes, d), bool)
        box[scene_of_person, 0] = (100 + 3 * epoch + jitter, 80, 0, 0.5, 30)
        feat[scene_of_person, 0] = signature + rng.normal(size=f) * 0.01
        valid[scene_of_person, 0] = True
        ones = jnp.ones((n_scenes, d), jnp.float32)
        return (
            jnp.asarray(box), ones, jnp.asarray(valid), jnp.asarray(feat),
            jnp.asarray(valid), ones, ones,
            jnp.full((n_scenes,), epoch, jnp.int32),
        )

    # --- the person walks through camera 0 for three frames --------------
    for e in range(1, 4):
        state, out, _ = step(state, *frame(0, e, 0.0))
    cam0_id = int(np.asarray(out.track_id)[0, 0])
    print(f"camera 0 tracked the person as id {cam0_id}")

    # --- they appear in the LAST camera (different shard) ----------------
    last = n_scenes - 1
    state, out, _ = step(state, *frame(last, 4, 0.0))
    cam1_id = int(np.asarray(out.track_id)[last, 0])
    print(f"camera {last} opened a fresh track id {cam1_id}")

    # --- global appearance query: who is this, anywhere? -----------------
    # hits are per gallery FEATURE, so ask for a few and dedupe by track
    qfn = global_gallery_query("cosine", k=4, mesh=mesh)
    q = jnp.asarray(signature[None])
    scores, shard, scene, tids = qfn(state, q)
    per_shard = n_scenes // n_dev
    hits = []
    for i in range(4):
        gscene = int(shard[0, i]) * per_shard + int(scene[0, i])
        h = (float(scores[0, i]), gscene, int(tids[0, i]))
        if not any(x[1:] == h[1:] for x in hits):
            hits.append(h)
    print(f"global gallery hits (score, scene, id): {hits}")
    src = next(h for h in hits if h[1] == last)   # the duplicate
    dst = next(h for h in hits if h[1] == 0)      # the original identity

    # --- stitch: merge the duplicate into the original -------------------
    merge = track_merge(mesh)
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    state, ok = merge(
        state, i32([src[1]]), i32([src[2]]), i32([dst[1]]), i32([dst[2]])
    )
    assert bool(np.asarray(ok)[0])
    active = np.asarray(state.active)
    assert active[0].sum() == 1 and active[last].sum() == 0
    collected = int(np.asarray(state.collected)[0].max())
    print(
        f"merged camera-{last} id {src[2]} into camera-0 id {dst[2]}; "
        f"unified gallery holds {collected} collected features"
    )


if __name__ == "__main__":
    main()
