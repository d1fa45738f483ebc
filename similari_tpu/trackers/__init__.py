from .constraints import SpatioTemporalConstraints  # noqa: F401
from .sort import (  # noqa: F401
    PositionalMetricType,
    Sort,
    SortTrack,
    VotingType,
    WastedSortTrack,
)
