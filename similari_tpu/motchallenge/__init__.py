from .trackers import SimilariTPUSort, SimilariTPUVisualSort, Tracker  # noqa: F401
from .evaluator import evaluate_sequences, run_and_evaluate  # noqa: F401
