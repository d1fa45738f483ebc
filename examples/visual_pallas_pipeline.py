"""VisualSORT whole-sequence pipeline on the fused Pallas tracker kernel.

`run_sequence_device_visual(engine="pallas")` runs the entire tracker —
ReID gallery distances, cascade voting, Kalman updates, gallery
maintenance — as one VMEM-resident TPU kernel per frame chunk
(`ops/pallas_visual.py`), the fastest single-scene path (×1.3–1.45 over
the XLA step on v5e; ARCHITECTURE.md §5).  Both engines are id-exact, as
this demo asserts.  On CPU the kernel runs in interpret mode.
"""

import os

from similari_tpu.eval import run_sequence_device_visual
from similari_tpu.eval.synthetic import generate_sequence

if __name__ == "__main__":
    if os.environ.get("SIMILARI_EXAMPLE_FAST"):  # CI smoke (CPU interpret)
        objects, frames, fdim = 6, 12, 8
    else:
        objects, frames, fdim = 20, 100, 128
    gt, dets, feats = generate_sequence(
        n_objects=objects, n_frames=frames, seed=7,
        p_miss=0.1, fp_per_frame=0.2, feature_dim=fdim,
    )
    pred_xla, fps_xla = run_sequence_device_visual(dets, feats, capacity=64)
    pred_pls, fps_pls = run_sequence_device_visual(
        dets, feats, capacity=64, engine="pallas"
    )
    assert pred_xla == pred_pls, "engines must agree on every track id"
    n_tracks = len({tid for rows in pred_pls.values() for tid, *_ in rows})
    print(
        f"{frames} frames x {objects} objects: {n_tracks} tracks; "
        f"xla {fps_xla:.0f} FPS, pallas {fps_pls:.0f} FPS (id-exact)"
    )
