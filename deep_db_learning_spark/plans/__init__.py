from .blueprint import BlueprintPlan
from .metrics import classification_metrics, regression_metrics
from .pipeline import SliceResult, build_node_features, minimum_slice
from .persistence import load_stack_model, save_stack_model
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
    "load_stack_model",
    "predict_relational_stack",
    "save_stack_model",
    "train_relational_stack",
    "train_relational_two_layer",
]
