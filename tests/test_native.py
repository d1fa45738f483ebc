"""Native C++ LAP solver: builds, matches scipy exactly, batch path works."""

import numpy as np
import pytest

from similari_tpu import native
from scipy.optimize import linear_sum_assignment


def total(W, cols):
    return float(W[np.arange(W.shape[0]), cols].sum())


def test_native_builds():
    assert native.available(), "C++ toolchain present but native build failed"


@pytest.mark.parametrize("seed", range(6))
def test_lap_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    r = int(rng.integers(1, 40))
    c = r + int(rng.integers(0, 40))
    W = rng.uniform(-5, 100, size=(r, c)).astype(np.float32)
    cols = native.lap_max(W)
    assert len(set(cols.tolist())) == r
    rr, cc = linear_sum_assignment(W, maximize=True)
    assert total(W, cols) == pytest.approx(total(W, np.asarray(
        [cc[list(rr).index(i)] for i in range(r)])), abs=1e-3)


def test_lap_batch():
    rng = np.random.default_rng(0)
    W = rng.uniform(0, 10, size=(16, 20, 35)).astype(np.float32)
    cols = native.lap_max_batch(W)
    for b in range(16):
        rr, cc = linear_sum_assignment(W[b], maximize=True)
        assert total(W[b], cols[b]) == pytest.approx(float(W[b][rr, cc].sum()), abs=1e-3)


def test_lap_rectangular_tracking_shape():
    """Augmented tracking matrix: diagonal threshold + sparse matches."""
    metric = np.zeros((4, 6), np.float32)
    metric[0, 2] = 0.9
    metric[1, 2] = 0.8  # contested
    metric[2, 5] = 0.5
    d = 4
    W = np.zeros((d, d + 6), np.float32)
    np.fill_diagonal(W[:, :d], 0.3)
    W[:, d:] = metric
    cols = native.lap_max(W)
    assert cols[0] == d + 2  # winner of the contested track
    assert cols[1] == 1  # loser goes to its diagonal
    assert cols[2] == d + 5
    assert cols[3] == 3


def _write_mot_csv(path, rng, frames=12, max_dets=9, gaps=True, trailing=True):
    """Synthetic MOT det csv: variable per-frame counts, frame gaps, optional
    x,y,z trailing columns, CRLF mix."""
    rows = []
    for f in range(1, frames + 1):
        if gaps and f % 5 == 0:
            continue  # frame with no detections at all
        for _ in range(int(rng.integers(1, max_dets + 1))):
            l, t = rng.uniform(0, 500, size=2)
            w, h = rng.uniform(10, 80, size=2)
            conf = rng.uniform(0.1, 1.0)
            tail = ",-1,-1,-1" if trailing else ""
            rows.append(f"{f},-1,{l:.2f},{t:.2f},{w:.2f},{h:.2f},{conf:.4f}{tail}")
    text = "\r\n".join(rows[: len(rows) // 2]) + "\n" + "\n".join(rows[len(rows) // 2:])
    path.write_text(text + "\n")
    return rows


def test_mot_loader_matches_python_reader(tmp_path):
    from similari_tpu.eval.mot import ltwh_to_vec5, read_detections

    rng = np.random.default_rng(7)
    p = tmp_path / "det.txt"
    _write_mot_csv(p, rng)

    frames, box, conf, valid = native.load_sequence_soa(p)
    dets = read_detections(p)
    assert frames.tolist() == sorted(dets)
    dmax = max(len(v) for v in dets.values())
    assert box.shape[1] >= dmax and box.shape[1] % 8 == 0
    for s, f in enumerate(frames.tolist()):
        ref = np.asarray(dets[f], np.float32)
        n = len(ref)
        assert valid[s, :n].all() and not valid[s, n:].any()
        np.testing.assert_allclose(box[s, :n], ltwh_to_vec5(ref), rtol=1e-6)
        np.testing.assert_allclose(conf[s, :n], ref[:, 4], rtol=1e-6)
        assert (conf[s, n:] == 0).all()


def test_mot_loader_fallback_agrees(tmp_path):
    rng = np.random.default_rng(8)
    p = tmp_path / "det.txt"
    _write_mot_csv(p, rng, frames=7, trailing=False)
    f1, b1, c1, v1 = native.load_sequence_soa(p)
    f2, b2, c2, v2 = native._load_sequence_soa_numpy(p)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_allclose(b1, b2, rtol=1e-6)
    np.testing.assert_allclose(c1, c2, rtol=1e-6)
    np.testing.assert_array_equal(v1, v2)


def test_mot_loader_missing_conf(tmp_path):
    p = tmp_path / "det.txt"
    p.write_text("1,-1,10,20,30,40\n1,-1,50,60,20,10,0.5\n2,-1,0,0,8,8,0.25\n")
    frames, box, conf, valid = native.load_sequence_soa(p)
    assert frames.tolist() == [1, 2]
    # missing conf column parses as 1.0 and must NOT swallow the next line
    assert conf[0, 0] == 1.0 and conf[0, 1] == np.float32(0.5)
    assert valid[0, :2].all() and valid[1, 0]
    assert conf[1, 0] == np.float32(0.25)
    np.testing.assert_allclose(box[0, 0, :2], [10 + 15, 20 + 20])


def test_run_sequence_device_from_file(tmp_path):
    """End-to-end: path input (native loader) == dict input (python reader)."""
    from similari_tpu.eval.mot import read_detections, run_sequence_device

    rng = np.random.default_rng(9)
    p = tmp_path / "det.txt"
    _write_mot_csv(p, rng, frames=6, max_dets=5, gaps=False)
    out_path, _ = run_sequence_device(p, capacity=64)
    out_dict, _ = run_sequence_device(read_detections(p), capacity=64)
    assert out_path.keys() == out_dict.keys()
    for f in out_path:
        assert out_path[f] == out_dict[f]


def test_numpy_mot_fallback_handles_six_column_files(tmp_path):
    """Regression (round-3 review): the numpy fallback silently dropped every
    row of 6-column MOT files (missing conf), which the native loader parses
    as conf=1.0."""
    from similari_tpu.native import _load_sequence_soa_numpy

    p = tmp_path / "det6.txt"
    p.write_text("1,1,10,20,30,40\n1,2,50,60,30,40\n2,1,11,21,30,40\n")
    frames, box, conf, valid = _load_sequence_soa_numpy(p)
    assert list(frames) == [1, 2]
    assert valid[0].sum() == 2 and valid[1].sum() == 1
    np.testing.assert_allclose(conf[0, :2], [1.0, 1.0])
    np.testing.assert_allclose(box[0, 0, :2], [25.0, 40.0])  # xc, yc


def test_rotated_iou_pairs_matches_numpy_oracle():
    """The native f32 clip (clip.h) vs the NumPy transliteration of the
    device kernel (trackers/host_geometry.py), at the ulp scale.

    The id-level fuzz suites (test_host_sort.py) can't pin the clip's float
    behavior; this locks it across clip.h refactors (the round-5 branchless
    16-lane tail was verified bitwise-stable on 2M pairs with this surface).
    Native uses FMA contraction, so up to a few ulp vs NumPy is expected —
    the bound here is ~1e-7 absolute on IoU in [0, 1].
    """
    if not native.sort_step_available():
        pytest.skip("native library unavailable")
    from similari_tpu.trackers.host_geometry import rotated_iou_matrix_np

    rng = np.random.default_rng(17)
    n = 256

    def boxes(k):
        b = np.zeros((k, 5), np.float32)
        b[:, 0] = rng.uniform(0, 100, k)
        b[:, 1] = rng.uniform(0, 100, k)
        b[:, 2] = rng.uniform(-np.pi, np.pi, k)
        b[:, 3] = rng.uniform(0.2, 5.0, k)
        b[:, 4] = rng.uniform(1, 60, k)
        return b

    a, b = boxes(n), boxes(n)
    b[: n // 2, :2] = a[: n // 2, :2] + rng.uniform(
        -20, 20, (n // 2, 2)).astype(np.float32)  # force real overlaps
    a[:8, 4] = 0.0       # degenerate: zero height
    b[8:16, 3] = 0.0     # degenerate: zero aspect
    b[16:24] = a[16:24]  # identical boxes -> IoU exactly 1
    out = native.rotated_iou_pairs(a, b)
    iou_m, _ = rotated_iou_matrix_np(a, b)
    diag = np.diag(iou_m).astype(np.float32)
    # identical boxes: IoU 1 to within the integral's own roundoff (the
    # oracle itself lands at 1 +- 1 ulp).  The pre-fix contraction bug gave
    # exactly 0 or ~1/eps here, so a 1e-5 band is a sharp discriminator.
    np.testing.assert_allclose(out[16:24], 1.0, atol=1e-5, rtol=0)
    np.testing.assert_allclose(out, diag, atol=2e-6, rtol=0)
