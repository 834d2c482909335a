"""Evaluation: on-device GCD metrics and hierarchical inference (layer L6)."""

from .infer import (
    HierarchyArrays,
    hierarchical_log_probs,
    mean_tta_logits,
    predict_all,
    predict_hierarchical,
    predict_per_partitioning,
)
from .engine import InferenceEngine, format_accuracy_table
from .metrics import (
    DEFAULT_THRESHOLDS_KM,
    EARTH_RADIUS_KM,
    GcdAccumulator,
    gcd_threshold_accuracy,
    gcd_threshold_counts,
    great_circle_distance,
)
