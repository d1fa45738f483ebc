from .mesh import (  # noqa: F401
    DEVICE_AXIS,
    HOST_AXIS,
    SCENE_AXIS,
    batched_sort_scan,
    batched_sort_step,
    batched_sort_step_chunked,
    batched_visual_scan,
    batched_visual_step,
    batched_visual_step_chunked,
    new_batched_state,
    new_batched_visual_state,
    pod_mesh,
    pod_scene_spec,
    pod_sharded_sort_scan,
    scene_mesh,
    shard_batched_state,
    sharded_sort_scan,
    sharded_sort_step,
    sharded_visual_scan,
    sharded_visual_step,
)
from .gallery import global_gallery_query  # noqa: F401
from .handoff import track_merge, track_migration  # noqa: F401
