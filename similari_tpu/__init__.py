"""similari_tpu — TPU-native multi-object tracking & similarity-search engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
insight-platform/Similari (mounted read-only at /root/reference): SORT /
BatchSORT / VisualSORT trackers, batched Kalman filters, rotated-box geometry,
NMS, polygon clipping, and a generic track/store engine — with the hot path as
pure jitted SoA-tensor functions instead of per-track Rust objects.

The public surface mirrors the reference `similari` Python module
(`/root/reference/src/lib.rs:117-161`).
"""

# Pin the BLAS threadpool to ONE thread: this package always coexists with a
# live JAX client whose own (spinning) threadpool starves OpenBLAS workers —
# measured 16.4 ms vs 0.44 ms for a [100,256]x[256,300] sgemm on a 2-core
# host once the XLA CPU client is up.  Host-engine gemms are small; losing
# BLAS-internal parallelism is far cheaper than the oversubscription thrash.
# The limiter object must stay referenced or the limit is rolled back.
try:  # pragma: no cover - environment-dependent
    from threadpoolctl import threadpool_limits as _tpl

    _BLAS_LIMIT = _tpl(limits=1, user_api="blas")
except Exception:  # noqa: BLE001 - soft dependency
    _BLAS_LIMIT = None

from .version import __version__, version  # noqa: F401
from .utils.bbox import (  # noqa: F401
    BoundingBox,
    GenericBBoxConversionError,
    Polygon,
    Universal2DBox,
)
from .utils.clipping import (  # noqa: F401
    exclusively_owned_areas,
    exclusively_owned_areas_normalized_shares,
    intersection_area,
    sutherland_hodgman_clip,
)
from .utils.nms import nms  # noqa: F401
from .utils.kalman import (  # noqa: F401
    Point2DKalmanFilter,
    Point2DKalmanFilterState,
    Universal2DBoxKalmanFilter,
    Universal2DBoxKalmanFilterState,
    Vec2DKalmanFilter,
)
from .ops.distances import cosine, euclidean  # noqa: F401
from .trackers import (  # noqa: F401
    BatchSort,
    BatchVisualSort,
    FeatureTracker,
    PositionalMetricType,
    PredictionBatchResult,
    SortPredictionBatchRequest,
    VisualSortPredictionBatchRequest,
    Sort,
    SortTrack,
    SpatioTemporalConstraints,
    VisualSort,
    VisualSortMetricType,
    VisualSortObservation,
    VisualSortObservationSet,
    VisualSortOptions,
    VotingType,
    WastedSortTrack,
    WastedVisualSortTrack,
)
