from . import assignment, distances, geometry, kalman, ownarea  # noqa: F401
