"""`nms()` host API with reference-parity semantics (`src/utils/nms.rs:32-72`,
pyo3 surface `src/utils/nms/nms_py.rs:41-63`)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_kernel
from .pad import pad_pow2
from .bbox import Universal2DBox


def nms(
    detections: Sequence[Tuple[Universal2DBox, Optional[float]]],
    nms_threshold: float,
    score_threshold: Optional[float] = None,
) -> List[Universal2DBox]:
    """Greedy NMS; rank = score or box height; returns kept boxes rank-desc."""
    score_threshold = (
        score_threshold if score_threshold is not None else float(np.finfo(np.float32).min)
    )
    cands = []
    for bb, score in detections:
        s = score if score is not None else np.float32(np.finfo(np.float32).max)
        if s > score_threshold and bb.height > 0.0 and bb.aspect > 0.0:
            rank = score if score is not None else bb.height
            cands.append((rank, bb))
    if not cands:
        return []
    cands.sort(key=lambda e: -e[0])
    n = len(cands)

    # small frames: the native scalar loop (native/nms.cpp) runs a 10-box
    # frame in ~2 us — device dispatch alone costs orders of magnitude more
    # (ARCHITECTURE.md §4b reasoning; same engine split as Sort)
    if n <= 64:
        from .. import native

        boxes = np.stack([bb.to_vec5() for _, bb in cands]).astype(np.float32)
        oriented = bool(np.any(boxes[:, 2] != 0.0))
        keep = native.nms_host(boxes, nms_threshold, oriented)
        if keep is not None:
            return [bb for (m, (_, bb)) in zip(keep, cands) if m]

    npad = pad_pow2(n)
    boxes = np.zeros((npad, 5), np.float32)
    valid = np.zeros((npad,), bool)
    for i, (_rank, bb) in enumerate(cands):
        boxes[i] = bb.to_vec5()
        valid[i] = True

    # static per-call oriented flag (like the Sort API's auto-flip): the
    # axis-aligned kernel is exact when no box carries an angle
    oriented = bool(np.any(boxes[:, 2] != 0.0))
    keep = np.asarray(
        nms_kernel(
            jnp.asarray(boxes), jnp.asarray(valid),
            jnp.float32(nms_threshold), oriented,
        )
    )[:n]
    return [bb for (m, (_, bb)) in zip(keep, cands) if m]
