from .blueprint import BlueprintPlan
from .metrics import classification_metrics, regression_metrics
from .pipeline import SliceResult, build_node_features, minimum_slice
from .tuning import run_trials

__all__ = [
    "BlueprintPlan",
    "run_trials",
    "SliceResult",
    "build_node_features",
    "classification_metrics",
    "minimum_slice",
    "regression_metrics",
]
