from . import assignment, distances, geometry, kalman  # noqa: F401
