"""Metric implementation sanity + end-to-end tracking accuracy on synthetic MOT."""

import numpy as np
import pytest

from similari_tpu.eval import (
    clear_metrics,
    generate_sequence,
    identity_metrics,
    run_sequence_device,
)


def test_metrics_perfect_on_identity():
    gt, _ = generate_sequence(n_objects=8, n_frames=30, seed=1, p_miss=0.0,
                              fp_per_frame=0.0)
    clear = clear_metrics(gt, gt)
    ident = identity_metrics(gt, gt)
    assert clear["MOTA"] == pytest.approx(1.0)
    assert clear["IDSW"] == 0
    assert ident["IDF1"] == pytest.approx(1.0)


def test_metrics_detect_id_switch():
    gt = {
        1: [(1, 0, 0, 10, 10), (2, 100, 0, 10, 10)],
        2: [(1, 0, 0, 10, 10), (2, 100, 0, 10, 10)],
        3: [(1, 0, 0, 10, 10), (2, 100, 0, 10, 10)],
    }
    pred = {
        1: [(5, 0, 0, 10, 10), (6, 100, 0, 10, 10)],
        2: [(5, 0, 0, 10, 10), (6, 100, 0, 10, 10)],
        3: [(6, 0, 0, 10, 10), (5, 100, 0, 10, 10)],  # swap
    }
    clear = clear_metrics(gt, pred)
    assert clear["IDSW"] == 2
    assert clear["MOTA"] == pytest.approx(1.0 - 2 / 6)
    ident = identity_metrics(gt, pred)
    assert ident["IDF1"] == pytest.approx(4 / 6)


def test_metrics_fp_fn():
    gt = {1: [(1, 0, 0, 10, 10)]}
    pred = {1: [(1, 0, 0, 10, 10), (2, 50, 50, 10, 10)]}
    clear = clear_metrics(gt, pred)
    assert clear["TP"] == 1 and clear["FP"] == 1 and clear["FN"] == 0


@pytest.mark.parametrize("method", ["iou", "maha"])
def test_synthetic_tracking_accuracy(method):
    """Device tracker must achieve high MOTA/IDF1 on realistic synthetic data."""
    gt, dets = generate_sequence(
        n_objects=15, n_frames=60, seed=3, p_miss=0.05, fp_per_frame=0.3
    )
    pred, fps = run_sequence_device(dets, method=method, report_observed=True)
    clear = clear_metrics(gt, pred)
    ident = identity_metrics(gt, pred)
    assert clear["MOTA"] > 0.85, clear
    assert ident["IDF1"] > 0.8, ident
    assert fps > 0


def test_clean_detections_near_perfect():
    gt, dets = generate_sequence(
        n_objects=10, n_frames=40, seed=5, p_miss=0.0, fp_per_frame=0.0,
        pos_noise=0.2, wh_noise=0.1,
    )
    pred, _ = run_sequence_device(dets, method="iou", report_observed=True)
    clear = clear_metrics(gt, pred)
    ident = identity_metrics(gt, pred)
    assert clear["MOTA"] > 0.99, clear
    assert clear["IDSW"] == 0
    assert ident["IDF1"] > 0.99, ident


def test_visual_sequence_device_accuracy():
    """Config-4 path: VisualSORT with ReID features on a noisy synthetic
    sequence; appearance should hold identities through heavy dropouts."""
    from similari_tpu.eval import run_sequence_device_visual

    gt, dets, feats = generate_sequence(
        n_objects=12, n_frames=50, seed=11, p_miss=0.15, fp_per_frame=0.3,
        feature_dim=32,
    )
    pred, fps = run_sequence_device_visual(dets, feats)
    clear = clear_metrics(gt, pred)
    ident = identity_metrics(gt, pred)
    assert clear["MOTA"] > 0.75, clear
    assert ident["IDF1"] > 0.75, ident
    assert fps > 0


def test_mota_idf1_parity_with_reference_oracle():
    """North-star accuracy criterion (BASELINE.json): the device tracker's
    MOTA/IDF1 must be within 0.5 pts of the reference pipeline on the same
    sequence.  The oracle is the literal NumPy port of the reference SORT
    (`tests/reference_sort.py`, exact Hungarian + exact metric semantics)."""
    from reference_sort import RefSort

    from similari_tpu.eval import clear_metrics, identity_metrics
    from similari_tpu.eval.mot import ltwh_to_vec5, run_sequence_device

    gt, dets = generate_sequence(
        n_objects=15, n_frames=60, seed=11, p_miss=0.08, fp_per_frame=0.5
    )
    pred_dev, _ = run_sequence_device(dets, method="iou", report_observed=True)

    ref = RefSort(method="iou", max_idle_epochs=5)
    pred_ref = {}
    for f in sorted(dets):
        arr = np.asarray(dets[f], np.float32)
        ids = ref.predict(ltwh_to_vec5(arr), np.clip(arr[:, 4], 0.0, 1.0))
        pred_ref[f] = [
            (int(i), *map(float, arr[k, :4])) for k, i in enumerate(ids)
        ]

    cd, cr = clear_metrics(gt, pred_dev), clear_metrics(gt, pred_ref)
    idd, idr = identity_metrics(gt, pred_dev), identity_metrics(gt, pred_ref)
    assert abs(cd["MOTA"] - cr["MOTA"]) <= 0.005, (cd, cr)
    assert abs(idd["IDF1"] - idr["IDF1"]) <= 0.005, (idd, idr)


def test_visual_sequence_pallas_engine_matches_xla():
    """engine="pallas" (fused VisualSORT-on-chip kernel) produces the same
    track ids as the XLA step through the public pipeline API."""
    from similari_tpu.eval import run_sequence_device_visual

    gt, dets, feats = generate_sequence(
        n_objects=8, n_frames=20, seed=3, p_miss=0.1, fp_per_frame=0.2,
        feature_dim=16,
    )
    pred_x, _ = run_sequence_device_visual(dets, feats, capacity=64)
    pred_p, _ = run_sequence_device_visual(
        dets, feats, capacity=64, engine="pallas")
    assert sorted(pred_x) == sorted(pred_p)
    for f in pred_x:
        assert pred_x[f] == pred_p[f], (f, pred_x[f], pred_p[f])


def test_device_runner_overflow_is_loud():
    """A sequence with more live tracks than capacity must raise, never
    silently drop (round-2 verdict Weak#3); enough capacity => clean run."""
    _, dets = generate_sequence(n_objects=12, n_frames=20, seed=9,
                                p_miss=0.0, fp_per_frame=0.0)
    with pytest.raises(RuntimeError, match="overflow"):
        run_sequence_device(dets, method="iou", capacity=8)
    out, _ = run_sequence_device(dets, method="iou", capacity=32)
    assert len(out) == 20


def test_device_runner_recycles_churn():
    """Churny stream (fresh objects every few frames): cumulative tracks far
    exceed capacity, but recycling keeps live tracks within it."""
    rng = np.random.default_rng(11)
    dets = {}
    for c in range(12):  # 12 cohorts x 6 objects = 72 cumulative tracks
        base = rng.uniform(0, 300, size=(6, 2)) + c * 5_000.0
        for f in range(c * 5, (c + 1) * 5):
            rows = []
            for i in range(6):
                x, y = base[i]
                rows.append((x + f, y, 20.0, 40.0, 1.0))
            dets[f + 1] = rows
    out, _ = run_sequence_device(dets, method="iou", capacity=16,
                                 max_idle_epochs=2)
    ids = {tid for rows in out.values() for tid, *_ in rows}
    assert len(ids) == 72  # every cohort tracked, none silently dropped


def test_sort_sequence_pallas_engine_matches_xla():
    """run_sequence_device(engine="pallas") must be id-exact vs the XLA scan
    (fused SORT kernel in interpret mode on CPU, compiled on TPU)."""
    _, dets = generate_sequence(n_objects=7, n_frames=24, seed=4,
                                p_miss=0.1, fp_per_frame=0.3)
    out_x, _ = run_sequence_device(dets, method="iou", capacity=64)
    out_p, _ = run_sequence_device(dets, method="iou", capacity=64,
                                   engine="pallas")
    assert out_x.keys() == out_p.keys()
    for f in out_x:
        np.testing.assert_array_equal(
            [r[0] for r in out_x[f]], [r[0] for r in out_p[f]],
            err_msg=f"frame {f}")


def test_frame_gaps_age_tracks_in_every_runner():
    """Regression (round-3 review): empty-frame GAPS must advance the epoch
    clock (max_idle_epochs is defined in epochs); previously the runners
    compressed a 10-frame gap into one step and kept stale ids."""
    from similari_tpu.eval.mot import run_sequence_interactive
    from similari_tpu.trackers import PositionalMetricType, Sort

    dets = {}
    for f in list(range(1, 4)) + list(range(14, 17)):  # 10-frame gap
        dets[f] = [(100.0 + f, 50.0, 20.0, 40.0, 1.0)]

    for engine in ("xla", "pallas"):
        out, _ = run_sequence_device(dets, method="iou", capacity=16,
                                     max_idle_epochs=5, engine=engine)
        id_before = out[3][0][0]
        id_after = out[14][0][0]
        assert id_after != id_before, engine  # track aged out across the gap

    tr = Sort(shards=1, bbox_history=1, max_idle_epochs=5,
              method=PositionalMetricType.iou(0.3))
    out_i = run_sequence_interactive(tr, dets)
    assert out_i[14][0][0] != out_i[3][0][0]

    # and WITHOUT a real gap the id must survive
    dets2 = {f: [(100.0 + f, 50.0, 20.0, 40.0, 1.0)] for f in range(1, 8)}
    out2, _ = run_sequence_device(dets2, method="iou", capacity=16,
                                  max_idle_epochs=5)
    assert out2[7][0][0] == out2[1][0][0]


def test_empty_detections_return_empty():
    out, fps = run_sequence_device({}, method="iou", capacity=16)
    assert out == {} and fps == 0.0
