"""Host (NumPy) VisualSORT engine vs the jitted step: identical semantics."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from similari_tpu.trackers import host_sort, host_visual
from similari_tpu.trackers.visual_state import new_visual_state
from similari_tpu.trackers.visual_step import VisualConfig, visual_step

CONFIGS = [
    VisualConfig(
        positional_kind="iou", oriented=False, assignment="hungarian",
        visual_kind="euclidean", visual_threshold=5.0,
        visual_minimal_track_length=2, max_idle_epochs=5,
    ),
    VisualConfig(
        positional_kind="maha", oriented=False, assignment="hungarian",
        visual_kind="cosine", visual_threshold=0.6,
        visual_minimal_track_length=1, visual_min_votes=2,
        visual_minimal_quality_use=0.4, visual_minimal_quality_collect=0.5,
        max_idle_epochs=4,
    ),
    VisualConfig(
        positional_kind="iou", oriented=False, assignment="hungarian",
        visual_kind="euclidean", visual_threshold=4.0,
        visual_minimal_track_length=2, max_idle_epochs=5,
        constraints=((1, 1.5), (4, 3.0)),
    ),
]


def stream(seed, steps, d, f, drop=0.2):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 350, (d, 2)).astype(np.float32)
    ident = rng.normal(size=(d, f)).astype(np.float32)
    frames = []
    for s in range(steps):
        xy += rng.uniform(-2, 2, xy.shape).astype(np.float32)
        keep = rng.uniform(size=d) >= (drop if s else 0.0)
        n = max(int(keep.sum()), 1)
        idx = np.flatnonzero(keep)[:n]
        box = np.zeros((n, 5), np.float32)
        box[:, 0] = xy[idx, 0]
        box[:, 1] = xy[idx, 1]
        box[:, 3] = 0.8
        box[:, 4] = 28.0
        feat = (ident[idx] + 0.04 * rng.normal(size=(n, f))).astype(np.float32)
        fvalid = rng.uniform(size=n) > 0.15
        conf = rng.uniform(0.5, 1.0, n).astype(np.float32)
        qual = rng.uniform(0.3, 1.0, n).astype(np.float32)
        frames.append((box, conf, feat, fvalid, qual))
    return frames


@pytest.mark.parametrize("cfg_ix", [0, 1, 2])
@pytest.mark.parametrize("seed", [0, 1])
def test_host_visual_matches_device_step(cfg_ix, seed):
    cfg = CONFIGS[cfg_ix]
    d0, f, t, k = 10, 24, 48, 3
    frames = stream(seed, steps=10, d=d0, f=f)

    sx = new_visual_state(t, 2, k, f)
    sh = host_sort.state_to_host(new_visual_state(t, 2, k, f))
    for e, (box, conf, feat, fvalid, qual) in enumerate(frames, start=1):
        n = len(box)
        oa = np.ones((n,), np.float32)
        sx, ox = visual_step(
            cfg, sx, jnp.asarray(box), jnp.asarray(conf),
            jnp.ones((n,), bool), jnp.asarray(feat), jnp.asarray(fvalid),
            jnp.asarray(qual), jnp.asarray(oa), jnp.int32(e))
        sh, oh = host_visual.host_visual_step(
            cfg, sh, box, conf, feat, fvalid, qual, oa, e)
        np.testing.assert_array_equal(
            oh["track_id"], np.asarray(ox.track_id), err_msg=f"epoch {e}")
        np.testing.assert_array_equal(
            oh["voting_type"], np.asarray(ox.voting_type),
            err_msg=f"epoch {e}")
        np.testing.assert_array_equal(oh["slot"], np.asarray(ox.slot))
        np.testing.assert_allclose(
            oh["pred_box"], np.asarray(ox.pred_box), rtol=2e-4, atol=1e-3)
    # end-state parity
    np.testing.assert_array_equal(sh.active, np.asarray(sx.active))
    np.testing.assert_array_equal(sh.track_id, np.asarray(sx.track_id))
    np.testing.assert_array_equal(sh.collected, np.asarray(sx.collected))
    np.testing.assert_array_equal(sh.feat_valid, np.asarray(sx.feat_valid))
    live = np.asarray(sx.feat_valid)
    np.testing.assert_allclose(
        np.where(live[..., None], sh.feats, 0),
        np.where(live[..., None], np.asarray(sx.feats), 0),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        sh.pred_box, np.asarray(sx.pred_box), rtol=2e-4, atol=1e-3)
    assert int(sh.next_id) == int(sx.next_id)
