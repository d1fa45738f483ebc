from .metrics import clear_metrics, identity_metrics, iou_matrix_ltwh  # noqa: F401
from .mot import (  # noqa: F401
    ltwh_to_vec5,
    read_detections,
    read_gt,
    run_sequence_device,
    run_sequence_device_visual,
    run_sequence_interactive,
    vec5_to_ltwh,
    write_csv,
)
from .synthetic import generate_sequence  # noqa: F401
from ..native import load_sequence_soa  # noqa: F401  (C++ MOT csv loader)
