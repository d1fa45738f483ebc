"""MOTChallenge kit end-to-end on a synthetic MOT-format directory."""

import numpy as np
import pytest

from similari_tpu.eval import generate_sequence, write_csv
from similari_tpu.motchallenge import run_and_evaluate


@pytest.fixture
def mot_dir(tmp_path):
    for s, seed in (("SEQ-01", 11), ("SEQ-02", 12)):
        gt, dets = generate_sequence(
            n_objects=10, n_frames=40, seed=seed, p_miss=0.03, fp_per_frame=0.2
        )
        seq = tmp_path / s
        (seq / "det").mkdir(parents=True)
        (seq / "gt").mkdir(parents=True)
        det_rows = []
        for f in sorted(dets):
            for (l, t, w, h, conf) in dets[f]:
                det_rows.append((f, -1, round(l, 2), round(t, 2), round(w, 2),
                                 round(h, 2), round(conf, 3), -1, -1, -1))
        gt_rows = []
        for f in sorted(gt):
            for (tid, l, t, w, h) in gt[f]:
                gt_rows.append((f, tid, round(l, 2), round(t, 2), round(w, 2),
                                round(h, 2), 1, 1, 1.0))
        write_csv(seq / "det" / "det.txt", det_rows)
        write_csv(seq / "gt" / "gt.txt", gt_rows)
    return tmp_path


def test_kit_end_to_end(mot_dir, tmp_path):
    out = tmp_path / "results"
    results = run_and_evaluate(mot_dir, out, method="iou")
    assert set(results) == {"SEQ-01", "SEQ-02"}
    for seq, m in results.items():
        assert m["MOTA"] > 0.8, (seq, m)
        assert m["IDF1"] > 0.75, (seq, m)
    assert (out / "SEQ-01.txt").exists()
    assert (out / "processing_stats.csv").exists()
