"""Property test: device SORT must reproduce the literal reference pipeline.

The oracle (tests/reference_sort.py) follows the reference Rust code
object-for-object with scipy Hungarian; the device tracker is the fused
SoA/auction implementation.  On random detection streams both must assign
identical track ids (up to rare f32 near-ties on dense scenes).
"""

import numpy as np
import pytest

from reference_sort import RefSort
from similari_tpu.trackers import PositionalMetricType, Sort


def run_stream(method, seed, n_objects, steps, density=200.0, drop_prob=0.0,
               oriented=False):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, density, size=(n_objects, 2)).astype(np.float32)
    wh = rng.uniform(20, 40, size=(n_objects, 2)).astype(np.float32)
    ang = (
        rng.uniform(0.05, 1.2, size=n_objects).astype(np.float32)
        if oriented
        else np.zeros(n_objects, np.float32)
    )

    dev = Sort(
        shards=1,
        bbox_history=1,
        max_idle_epochs=5,
        method=(
            PositionalMetricType.iou(0.3)
            if method == "iou"
            else PositionalMetricType.maha()
        ),
        assignment_backend="hungarian",
    )
    ref = RefSort(method=method, max_idle_epochs=5, oriented=oriented)

    mismatches = 0
    total = 0
    for step in range(steps):
        xy += rng.uniform(-3, 3, size=xy.shape).astype(np.float32)
        wh += rng.uniform(-0.3, 0.3, size=wh.shape).astype(np.float32)
        if oriented:
            ang += rng.uniform(-0.05, 0.05, size=ang.shape).astype(np.float32)
        keep = rng.uniform(size=n_objects) >= drop_prob
        if not keep.any():
            continue
        boxes = np.zeros((int(keep.sum()), 5), np.float32)
        boxes[:, 0] = xy[keep, 0]
        boxes[:, 1] = xy[keep, 1]
        boxes[:, 2] = ang[keep]
        boxes[:, 3] = wh[keep, 0] / wh[keep, 1]
        boxes[:, 4] = wh[keep, 1]
        confs = np.ones(boxes.shape[0], np.float32)

        _, dev_ids, _, _, _ = dev.predict_arrays(0, boxes, confs)
        ref_ids = ref.predict(boxes, confs)
        total += len(boxes)
        mismatches += int((dev_ids != ref_ids).sum())
    return mismatches, total


@pytest.mark.parametrize("method", ["iou", "maha"])
@pytest.mark.parametrize("seed", [0, 1])
def test_sparse_scene_exact(method, seed):
    mism, total = run_stream(method, seed, n_objects=12, steps=12, density=400.0)
    assert mism == 0, f"{mism}/{total} id mismatches"


def test_oracle_self_check_poly_iou():
    """A broken oracle must never masquerade as a device regression: the f64
    SH oracle must satisfy iou(b, b) == 1 and agree with the device
    Green's-theorem kernel on random rotated pairs (`bbox.rs:476-535`)."""
    import jax.numpy as jnp

    from reference_sort import poly_iou
    from similari_tpu.ops.geometry import universal_iou_matrix

    rng = np.random.default_rng(42)
    boxes = np.zeros((64, 5), np.float32)
    boxes[:, 0:2] = rng.uniform(0, 60, size=(64, 2))
    boxes[:, 2] = rng.uniform(0, 2 * np.pi, size=64)
    boxes[:, 3] = rng.uniform(0.3, 3.0, size=64)
    boxes[:, 4] = rng.uniform(5, 30, size=64)

    for b in boxes[:8]:
        assert abs(poly_iou(b, b) - 1.0) < 1e-9, "oracle iou(b,b) != 1"

    iou, _valid = universal_iou_matrix(
        jnp.asarray(boxes), jnp.asarray(boxes), oriented=True
    )
    dev = np.asarray(iou)
    for i in range(16):
        for j in range(16):
            ref = poly_iou(boxes[i], boxes[j])
            assert abs(dev[i, j] - ref) < 1e-3, (
                f"device vs oracle IoU mismatch at ({i},{j}): {dev[i,j]} vs {ref}"
            )


@pytest.mark.parametrize("seed", [0, 2])
def test_oriented_scene_exact(seed):
    """Rotated boxes end-to-end: device Green's-theorem IoU kernel vs an
    independent f64 Sutherland–Hodgman oracle (`bbox.rs:476-535`); the KF
    tracks the angle component through the same 5-dim state."""
    mism, total = run_stream(
        "iou", seed, n_objects=12, steps=12, density=400.0, oriented=True
    )
    assert mism == 0, f"{mism}/{total} id mismatches"


@pytest.mark.parametrize("seed", [0, 1])
def test_oriented_maha_scene_exact(seed):
    """Oriented boxes under the Mahalanobis metric: the KF carries the angle
    in dim 2 of the 5-dim observed state (`kalman_2d_box.rs:86-148`), and the
    gate/cost pipeline is angle-agnostic apart from the state itself."""
    mism, total = run_stream(
        "maha", seed, n_objects=12, steps=12, density=400.0, oriented=True
    )
    assert mism == 0, f"{mism}/{total} id mismatches"


@pytest.mark.parametrize("method", ["iou", "maha"])
def test_dense_scene_with_dropouts(method):
    mism, total = run_stream(
        method, seed=7, n_objects=30, steps=15, density=250.0, drop_prob=0.2
    )
    # near-ties may break differently in f32; must stay rare
    assert mism <= 0.01 * total, f"{mism}/{total} id mismatches"
