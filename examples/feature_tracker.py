"""Generic feature-similarity tracking: re-identify objects by embeddings.

The workload of the reference's generic-engine benchmark
(`/root/reference/benches/feature_tracker.rs`): no boxes, no Kalman — each
object is just a drifting feature vector, matched to its track by euclidean
distance over a 3-observation gallery with TopN voting.  `FeatureTracker`
is the vectorized engine for exactly this (`trackers/feature.py`); the
object-for-object `core/` engine remains available for custom metrics.
"""

import numpy as np

from similari_tpu import FeatureTracker

if __name__ == "__main__":
    rng = np.random.default_rng(7)
    n, dim = 16, 128
    tracker = FeatureTracker(dim, gallery=3, max_distance=100.0)

    # 16 objects with well-separated identities, drifting a little per epoch
    base = rng.normal(scale=200.0, size=(n, dim)).astype(np.float32)
    first = None
    for epoch in range(12):
        base += rng.normal(scale=0.5, size=base.shape).astype(np.float32)
        ids = tracker.predict(base)
        if first is None:
            first = ids.copy()
        assert (ids == first).all(), "identity lost"
    print(f"{n} identities stable over 12 epochs: ids {ids[:8]} ...")

    # a new object appears -> new track id; an old one keeps its id
    extended = np.concatenate(
        [base, rng.normal(scale=200.0, size=(1, dim)).astype(np.float32)]
    )
    ids2 = tracker.predict(extended)
    assert (ids2[:n] == first).all() and ids2[n] == n + 1
    print(f"new object joined as track {ids2[n]}; gallery of track 1:",
          tracker.gallery_of(1).shape)
