"""TPU-native scaling demo: 64 scenes tracked in one device program.

This is the capability the reference cannot express: the whole multi-scene
batch steps as a single jitted scan on the accelerator.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from similari_tpu.parallel import batched_sort_scan, new_batched_state
from similari_tpu.trackers.sort_step import SortConfig

if __name__ == "__main__":
    if os.environ.get("SIMILARI_EXAMPLE_FAST"):  # CI smoke: small, compile-friendly
        scenes, objects, frames = 8, 16, 8
    else:
        scenes, objects, frames = 64, 50, 32
    cfg = SortConfig(method="iou", assignment="auction", max_idle_epochs=5)
    scan = jax.jit(batched_sort_scan(cfg), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    box = np.zeros((frames, scenes, objects, 5), np.float32)
    xy = rng.uniform(0, 1000, size=(scenes, objects, 2))
    for f in range(frames):
        xy += rng.uniform(-2, 2, size=xy.shape)
        box[f, ..., 0] = xy[..., 0]
        box[f, ..., 1] = xy[..., 1]
        box[f, ..., 3] = 0.5
        box[f, ..., 4] = 30.0

    states = new_batched_state(scenes, 2 * objects, 1)
    states, (ids, _ovf) = scan(
        states,
        jnp.asarray(box),
        jnp.ones((frames, scenes, objects), jnp.float32),
        jnp.ones((frames, scenes, objects), bool),
        jnp.ones((scenes,), jnp.int32),
    )
    ids = np.asarray(ids)
    print("tracked", scenes, "scenes x", frames, "frames;")
    print("scene 0 frame 0 ids:", ids[0, 0][:8])
    print("scene 0 frame -1 ids:", ids[-1, 0][:8], "(stable)")
