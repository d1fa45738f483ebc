"""Auction vs exact Hungarian on tracking-shaped voting matrices.

VERDICT r1 asked for the ±eps near-tie argument to be a *measured* bound on
the actual `distance_weights` output distribution rather than prose.  The
matrices here are harvested from the literal NumPy reference pipeline
(`tests/reference_sort.py`) running on synthetic MOT streams — i.e. exactly
the augmented [D, D+T] matrices the reference's `kuhn_munkres` sees
(`/root/reference/src/trackers/sort/voting.rs:44-86`).

Assertions encode the bounds cited in ARCHITECTURE.md §2:
* objective optimality gap of the device auction <= 0.1% relative;
* per-row decision disagreement (match-vs-new or different target) <= 1%
  averaged over frames, for both IoU and Mahalanobis weight distributions;
* the analytic-fallback solver agrees with the dense-diagonal auction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import reference_sort as R
from similari_tpu.eval import generate_sequence
from similari_tpu.eval.mot import ltwh_to_vec5
from similari_tpu.ops import assignment as A


def _harvest(method, seed, n_objects=20, n_frames=40):
    """Run the reference oracle and capture every augmented voting matrix."""
    captured = []
    orig = R.linear_sum_assignment

    def spy(W, maximize):
        captured.append(W.copy())
        return orig(W, maximize=maximize)

    gt, dets = generate_sequence(
        n_objects=n_objects, n_frames=n_frames, seed=seed,
        p_miss=0.08, fp_per_frame=0.5,
    )
    ref = R.RefSort(method=method, max_idle_epochs=5)
    R.linear_sum_assignment = spy
    try:
        for f in sorted(dets):
            arr = np.asarray(dets[f], np.float32)
            ref.predict(ltwh_to_vec5(arr), np.clip(arr[:, 4], 0.0, 1.0))
    finally:
        R.linear_sum_assignment = orig
    return captured


def _decisions(cols, d):
    """Per-row decision: -1 = new track, else matched track index."""
    return np.where(cols < d, -1, cols - d)


@pytest.mark.parametrize("method", ["iou", "maha"])
def test_auction_on_reference_voting_matrices(method):
    mats = _harvest(method, seed=23 if method == "iou" else 29)
    assert len(mats) >= 30
    thr = 0.3 if method == "iou" else 1.0

    total_rows = 0
    disagree_rows = 0
    worst_rel_gap = 0.0
    for W in mats:
        d = W.shape[0]
        t = W.shape[1] - d
        if d == 0:
            continue
        exact = A._hungarian_np(W)
        cols = np.asarray(A.auction_lap(jnp.asarray(W)))
        obj_e = float(W[np.arange(d), exact].sum())
        obj_a = float(W[np.arange(d), cols].sum())
        gap = (obj_e - obj_a) / max(obj_e, 1e-6)
        worst_rel_gap = max(worst_rel_gap, gap)
        assert gap <= 1e-3, (gap, d, t)

        dec_e = _decisions(exact, d)
        dec_a = _decisions(cols, d)
        total_rows += d
        disagree_rows += int((dec_e != dec_a).sum())

        if t > 0:
            # analytic-fallback solver must make the same decisions as the
            # dense-diagonal auction on its own matrix formulation
            body = jnp.asarray(W[:, d:])
            fb = np.asarray(
                A.auction_lap_fallback(body, jnp.float32(thr))
            )
            dec_fb = _decisions(fb, d)
            obj_fb = float(
                np.where(dec_fb < 0, thr, W[np.arange(d), d + np.maximum(dec_fb, 0)]).sum()
            )
            assert (obj_e - obj_fb) / max(obj_e, 1e-6) <= 1e-3

    rate = disagree_rows / max(total_rows, 1)
    print(f"\n[{method}] frames={len(mats)} rows={total_rows} "
          f"disagreement={rate:.4%} worst_rel_gap={worst_rel_gap:.2e}")
    assert rate <= 0.01, rate


@pytest.mark.parametrize("method", ["iou", "maha"])
def test_auction_mota_idf1_delta_vs_exact(method):
    """End-to-end accuracy budget: synthetic MOTA/IDF1 of the device auction
    pipeline within 0.5 pts of the exact-Hungarian reference oracle
    (BASELINE.json parity budget).  Extends `test_eval.py`'s IoU-only parity
    to Mahalanobis."""
    from similari_tpu.eval import clear_metrics, identity_metrics
    from similari_tpu.eval.mot import run_sequence_device

    gt, dets = generate_sequence(
        n_objects=15, n_frames=60, seed=31, p_miss=0.08, fp_per_frame=0.5
    )
    pred_dev, _ = run_sequence_device(dets, method=method, report_observed=True)

    ref = R.RefSort(method=method, max_idle_epochs=5)
    pred_ref = {}
    for f in sorted(dets):
        arr = np.asarray(dets[f], np.float32)
        ids = ref.predict(ltwh_to_vec5(arr), np.clip(arr[:, 4], 0.0, 1.0))
        pred_ref[f] = [
            (int(i), *map(float, arr[k, :4])) for k, i in enumerate(ids)
        ]

    cd, cr = clear_metrics(gt, pred_dev), clear_metrics(gt, pred_ref)
    idd, idr = identity_metrics(gt, pred_dev), identity_metrics(gt, pred_ref)
    print(f"\n[{method}] device MOTA={cd['MOTA']:.4f} ref MOTA={cr['MOTA']:.4f} "
          f"device IDF1={idd['IDF1']:.4f} ref IDF1={idr['IDF1']:.4f}")
    assert abs(cd["MOTA"] - cr["MOTA"]) <= 0.005, (cd, cr)
    assert abs(idd["IDF1"] - idr["IDF1"]) <= 0.005, (idd, idr)
