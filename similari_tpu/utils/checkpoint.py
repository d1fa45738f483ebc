"""Tracker state checkpoint/resume.

The reference has no checkpointing (SURVEY.md §5) — track state leaves the
system only through `wasted()` snapshots.  SoA tensor stores make this
trivial: the whole tracker (device state + host bookkeeping) round-trips
through one compressed npz per scene.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np


def _flatten_state(state):
    leaves, treedef = jax.tree.flatten(state)
    return [np.asarray(l) for l in leaves], treedef


def save_tracker(tracker, path):
    """Save a Sort or VisualSort tracker (all scenes) to `path` (.npz)."""
    path = Path(path)
    blobs = {}
    meta = {
        "epochs": tracker._epochs,
        "next_track_id": tracker._next_track_id,
        "scenes": [],
        "kind": type(tracker).__name__,
    }
    for scene_id, store in tracker._scenes.items():
        prefix = f"scene_{scene_id}"
        leaves, _ = _flatten_state(store.state)
        for i, leaf in enumerate(leaves):
            blobs[f"{prefix}_leaf_{i}"] = leaf
        blobs[f"{prefix}_custom_ids"] = store.custom_ids
        blobs[f"{prefix}_has_custom"] = store.has_custom
        meta["scenes"].append(
            {
                "scene_id": scene_id,
                "n_leaves": len(leaves),
                "active_count": store.active_count,
                "oriented": bool(store.oriented),
            }
        )
    blobs["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    ).copy()
    np.savez_compressed(path, **blobs)


def load_tracker(tracker, path):
    """Restore state saved by `save_tracker` into a freshly-built tracker of
    the same configuration.  Returns the tracker."""
    import jax.numpy as jnp

    data = np.load(Path(path))
    meta = json.loads(bytes(data["meta"]).decode())
    tracker._epochs = {int(k): int(v) for k, v in meta["epochs"].items()}
    tracker._next_track_id = int(meta["next_track_id"])
    for scene in meta["scenes"]:
        scene_id = int(scene["scene_id"])
        prefix = f"scene_{scene_id}"
        store = tracker._get_store(scene_id)
        # capacity/feature-dim of the stored state wins
        template = store.state
        leaves, treedef = jax.tree.flatten(template)
        loaded = [
            jnp.asarray(data[f"{prefix}_leaf_{i}"])
            for i in range(scene["n_leaves"])
        ]
        store.state = jax.tree.unflatten(treedef, loaded)
        store.custom_ids = data[f"{prefix}_custom_ids"].copy()
        store.has_custom = data[f"{prefix}_has_custom"].copy()
        store.active_count = int(scene["active_count"])
        # sticky rotated-box flag must survive the round trip, or restored
        # rotated tracks would silently run the axis-aligned kernel
        store.oriented = bool(scene.get("oriented", False))
        # loaded leaves are device arrays: reset any host-engine residue so
        # the next predict converts/rebuilds cleanly
        store.host = False
        store.session = None
        if hasattr(store.state, "feats") and hasattr(tracker, "_feature_dim"):
            tracker._feature_dim = int(store.state.feats.shape[-1])
    return tracker
