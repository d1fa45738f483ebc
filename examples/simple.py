"""Generic engine demo: store + TopN voting (parity with /root/reference/examples/simple.rs)."""

from similari_tpu.core import (
    NoopNotifier,
    ObservationBuilder,
    TopNVoting,
    TrackStoreBuilder,
)
from similari_tpu.core.examples import (
    FeatGen,
    SimpleAttributeUpdate,
    SimpleAttrs,
    SimpleMetric,
)

if __name__ == "__main__":
    store = (
        TrackStoreBuilder(2)
        .default_attributes(SimpleAttrs())
        .metric(SimpleMetric())
        .notifier(NoopNotifier())
        .build()
    )
    voting = TopNVoting(topn=1, max_distance=1.0, min_votes=1)

    # populate the store with drifting-feature tracks
    gens = [FeatGen(float(i) * 5.0, 16, 0.1, seed=i) for i in range(5)]
    for tid, gen in enumerate(gens, start=1):
        for _ in range(3):
            obs = next(gen)
            store.add(tid, 0, 0.5, obs.feature(), SimpleAttributeUpdate() if _ == 0 else None)

    # query with a fresh observation near track 3's feature space
    query = (
        store.new_track(1000)
        .observation(
            ObservationBuilder(0)
            .observation_attributes(0.5)
            .observation(next(gens[2]).feature())
            .track_attributes_update(SimpleAttributeUpdate())
            .build()
        )
        .build()
    )
    dists, errs = store.foreign_track_distances([query], 0, False)
    winners = voting.winners(dists)
    print("winner for query:", winners[1000][0].winner_track)
