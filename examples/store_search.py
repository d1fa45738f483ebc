"""Similarity search over the generic track store (round-4 arrays API).

The reference benches this workload in `benches/simple_search.rs`: a store
of N feature tracks queried with a fresh candidate.  The record API
(`foreign_track_distances`) streams `ObservationMetricOk` objects for
API parity; the arrays API (`foreign_track_distances_arrays`) returns the
same query as one matrix via the store's columnar feature index — the
production search path (~6x faster at 10k tracks, see PARITY.md).
"""

import numpy as np

from similari_tpu.core.examples import (
    BatchedSimpleMetric,
    SimpleAttributeUpdate,
    SimpleAttrs,
)
from similari_tpu.core.store import TrackStoreBuilder
from similari_tpu.core.track import ObservationBuilder

if __name__ == "__main__":
    rng = np.random.default_rng(0)
    dim, count = 64, 500

    db = (
        TrackStoreBuilder(4)
        .default_attributes(SimpleAttrs())
        .metric(BatchedSimpleMetric())  # declares supports_batch_features
        .build()
    )
    for i in range(count):
        db.add(i, 0, 1.0, rng.normal(size=dim).astype(np.float32),
               SimpleAttributeUpdate())

    cand = (
        db.new_track(count + 1)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(1.0)
            .observation(rng.normal(size=dim).astype(np.float32))
            .track_attributes_update(SimpleAttributeUpdate())
            .build()
        )
        .build()
    )

    # record API (reference-parity surface)
    records, errors = db.foreign_track_distances([cand], 0, True)
    print(f"record API: {len(records)} ObservationMetricOk records")

    # arrays API (production search path: one sgemm over the store index)
    to_id, obs_ix, dist = db.foreign_track_distances_arrays(cand, 0, True)
    k = np.argsort(dist[0])[:5]
    print("top-5 nearest tracks:",
          [(int(to_id[j]), round(float(dist[0, j]), 3)) for j in k])
