from .blueprint import BlueprintPlan
from .metrics import classification_metrics, regression_metrics
from .pipeline import SliceResult, build_node_features, minimum_slice

__all__ = [
    "BlueprintPlan",
    "SliceResult",
    "build_node_features",
    "classification_metrics",
    "minimum_slice",
    "regression_metrics",
]
