"""Incremental track building with the generic engine
(parity with /root/reference/examples/incremental_track_build.rs)."""

from similari_tpu.core import NoopNotifier, Track
from similari_tpu.core.examples import (
    FeatGen,
    SimpleAttributeUpdate,
    SimpleAttrs,
    SimpleMetric,
)

if __name__ == "__main__":
    track = Track(SimpleAttrs(), SimpleMetric(), NoopNotifier(), track_id=7)
    gen = FeatGen(1.0, 16, 0.05, seed=0)
    for step in range(5):
        obs = next(gen)
        track.add_observation(
            0, 0.5, obs.feature(),
            SimpleAttributeUpdate() if step == 0 else None,
        )
        print(f"step {step}: observations={len(track.get_observations(0))}")
    print("merge history:", track.get_merge_history())
    print("baked:", track.get_attributes().baked(track.observations))
