from .blueprint import BlueprintPlan
from .metrics import classification_metrics, regression_metrics
from .pipeline import SliceResult, build_node_features, minimum_slice
from .stack import EdgeLayerSpec, predict_relational_stack, train_relational_stack
from .training import (
    TrainResult,
    assemble_training_frame,
    train_relational_classifier,
    train_relational_minibatch,
    train_relational_regressor,
    train_relational_two_layer,
)
from .tuning import run_trials

__all__ = [
    "BlueprintPlan",
    "EdgeLayerSpec",
    "run_trials",
    "SliceResult",
    "TrainResult",
    "assemble_training_frame",
    "build_node_features",
    "classification_metrics",
    "minimum_slice",
    "regression_metrics",
    "train_relational_classifier",
    "train_relational_minibatch",
    "train_relational_regressor",
    "predict_relational_stack",
    "train_relational_stack",
    "train_relational_two_layer",
]
