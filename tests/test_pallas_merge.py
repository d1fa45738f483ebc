"""Parity tests for the in-place Pallas batch merge (ops/pallas_merge.py).

Interpret mode on the CPU mesh; on hardware the kernel is compiled and the
batched engine's id-exactness is covered by the same comparisons.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from similari_tpu.ops.pallas_merge import lane_merge_inplace
from similari_tpu.parallel import (
    batched_visual_step,
    new_batched_visual_state,
)
from similari_tpu.parallel.mesh import batched_visual_step_inplace
from similari_tpu.trackers.visual_step import VisualConfig


def test_lane_merge_inplace_matches_loop():
    rng = np.random.default_rng(0)
    s, r, f, d = 4, 24, 128, 8
    state = rng.normal(size=(s, r, f)).astype(np.float32)
    src = rng.normal(size=(s, d, f)).astype(np.float32)
    row = np.stack([rng.permutation(r)[:d] for _ in range(s)]).astype(
        np.int32)
    valid = (rng.random((s, d)) < 0.7).astype(np.int32)
    expect = state.copy()
    for i in range(s):
        for j in range(d):
            if valid[i, j]:
                expect[i, row[i, j]] = src[i, j]
    out = lane_merge_inplace(jnp.asarray(state), jnp.asarray(src),
                             jnp.asarray(row), jnp.asarray(valid),
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(out), expect)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_batched_inplace_step_matches_onehot(dtype):
    cfg = VisualConfig(
        positional_kind="iou", visual_kind="euclidean",
        visual_threshold=100.0, visual_minimal_track_length=2,
        max_idle_epochs=5, assignment="auction", oriented=False,
        feature_precision="f32", recycle_idle=True,
    )
    # bf16 rides as packed int32 words: F must be 256-aligned there
    s, t, d, k = 3, 16, 8, 3
    f = 256 if dtype == jnp.bfloat16 else 128
    rng = np.random.default_rng(1)
    ref = new_batched_visual_state(s, t, 1, k, f, feature_dtype=dtype)
    # dtype-preserving copy (a + 0 would promote the bool masks to int32
    # and silently break every ~mask in the step)
    alt = jax.tree.map(lambda a: a.copy(), ref)
    vstep = batched_visual_step(cfg)
    istep = batched_visual_step_inplace(cfg, interpret=True)
    for step_i in range(4):
        box = np.zeros((s, d, 5), np.float32)
        box[..., 0] = rng.uniform(0, 300, (s, d))
        box[..., 1] = rng.uniform(0, 300, (s, d))
        box[..., 3] = 1.0
        box[..., 4] = rng.uniform(20, 40, (s, d))
        conf = np.ones((s, d), np.float32)
        valid = rng.random((s, d)) < 0.9
        feat = rng.normal(size=(s, d, f)).astype(np.float32)
        fv = rng.random((s, d)) < 0.8
        qual = rng.uniform(0.5, 1.0, (s, d)).astype(np.float32)
        oa = np.ones((s, d), np.float32)
        args = tuple(map(jnp.asarray, (box, conf, valid, feat, fv, qual,
                                       oa)))
        ep = jnp.full((s,), step_i + 1, jnp.int32)
        ref, out_r = vstep(ref, *args, ep)
        alt, out_i = istep(alt, *args, ep)
        np.testing.assert_array_equal(np.asarray(out_r.track_id),
                                      np.asarray(out_i.track_id))
        for name in ("feats", "hist_feat", "feat_valid", "collected"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ref, name)),
                np.asarray(getattr(alt, name)), err_msg=name)
