from .mesh import (  # noqa: F401
    SCENE_AXIS,
    batched_sort_scan,
    batched_sort_step,
    new_batched_state,
    scene_mesh,
    shard_batched_state,
    sharded_sort_step,
)
