"""YAML-config-driven MOTChallenge kit run on a synthetic sequence."""

import numpy as np
import pytest

from similari_tpu.eval import generate_sequence
from similari_tpu.eval.mot import write_csv
from similari_tpu.motchallenge import load_config, run_from_config


def _write_mot_dir(tmp_path, seq_name="SYN-01", seed=3):
    gt, dets = generate_sequence(
        n_objects=10, n_frames=30, seed=seed, p_miss=0.05, fp_per_frame=0.2
    )
    seq = tmp_path / "data" / seq_name
    (seq / "det").mkdir(parents=True)
    (seq / "gt").mkdir(parents=True)
    det_rows = []
    for f in sorted(dets):
        for l, t, w, h, conf in dets[f]:
            det_rows.append((f, -1, round(l, 2), round(t, 2), round(w, 2),
                             round(h, 2), round(conf, 3), -1, -1, -1))
    gt_rows = []
    for f in sorted(gt):
        for tid, l, t, w, h in gt[f]:
            gt_rows.append((f, tid, round(l, 2), round(t, 2), round(w, 2),
                            round(h, 2), 1, 1, 1))
    write_csv(seq / "det" / "det.txt", det_rows)
    write_csv(seq / "gt" / "gt.txt", gt_rows)
    return tmp_path / "data"


def test_config_driven_eval(tmp_path):
    data = _write_mot_dir(tmp_path)
    out = tmp_path / "out"
    cfg_file = tmp_path / "eval.yml"
    cfg_file.write_text(
        f"""
name: syn-sort-iou
data_path: {data}
output_path: {out}
tracker:
  type: sort
  params:
    method: iou
    iou_threshold: 0.3
    max_idle_epochs: 5
evaluator:
  threshold: 0.5
"""
    )
    cfg = load_config(cfg_file)
    assert cfg.name == "syn-sort-iou"
    assert cfg.tracker.params["method"] == "iou"

    results = run_from_config(cfg_file)
    assert "SYN-01" in results
    m = results["SYN-01"]
    assert m["MOTA"] > 0.8, m
    assert m["IDF1"] > 0.8, m
    # MOT-format results + stats were written (reference `__main__.py:32,79-81`)
    assert (out / "SYN-01.txt").exists()
    assert (out / "processing_stats.csv").exists()


def test_config_validation(tmp_path):
    bad = tmp_path / "bad.yml"
    bad.write_text("name: x\n")  # missing data_path
    with pytest.raises(ValueError, match="data_path"):
        load_config(bad)

    bad2 = tmp_path / "bad2.yml"
    bad2.write_text(
        "name: x\ndata_path: /tmp\ntracker:\n  type: nope\n"
    )
    with pytest.raises(ValueError, match="unknown tracker type"):
        load_config(bad2)

    bad3 = tmp_path / "bad3.yml"
    bad3.write_text("name: x\ndata_path: /tmp\nbogus_key: 1\n")
    with pytest.raises(ValueError, match="unknown keys"):
        load_config(bad3)
