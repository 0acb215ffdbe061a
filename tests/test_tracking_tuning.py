"""N25 experiment-tracking sink and N29 search strategies."""

import math

from deep_db_learning_spark.plans.tracking import ExperimentTracker, load_runs
from deep_db_learning_spark.plans.tuning import (
    run_trials,
    sample_space,
    successive_halving,
)


def test_tracker_best_and_roundtrip(tmp_path):
    p = str(tmp_path / "run.jsonl")
    with ExperimentTracker(p, "t1", modes={"loss": "min", "acc": "max"}) as tr:
        tr.log_params({"lr": 0.1, "layers": 2})
        tr.log_metrics({"loss": 1.0, "acc": 0.5})
        tr.log_metrics({"loss": 0.4, "acc": 0.7})
        tr.log_metrics({"loss": 0.6, "acc": 0.6})
        assert tr.best == {"loss": 0.4, "acc": 0.7}
    events = load_runs(p)
    kinds = [e["kind"] for e in events]
    assert kinds == ["params", "metrics", "metrics", "metrics", "best"]
    assert events[-1]["metrics"] == {"loss": 0.4, "acc": 0.7}
    assert events[1]["step"] == 0 and events[3]["step"] == 2


def test_sample_space_deterministic():
    space = {"lr": [0.1, 0.01], "dim": [8, 16, 32]}
    a = sample_space(space, 5, seed=1)
    b = sample_space(space, 5, seed=1)
    assert a == b
    assert all(c["lr"] in space["lr"] and c["dim"] in space["dim"] for c in a)


def test_run_trials_isolates_failures():
    def fn(p):
        if p["x"] == 2:
            raise ValueError("boom")
        return p["x"] * 10

    out = run_trials(fn, [{"x": 1}, {"x": 2}, {"x": 3}])
    assert out[0][1] == 10 and out[2][1] == 30
    assert isinstance(out[1][1], ValueError)


def test_successive_halving_converges():
    # score = -(x - 3)^2, noiseless: halving must keep x=3
    def fn(p, budget):
        return -((p["x"] - 3) ** 2) * 1.0

    out = successive_halving(
        fn, {"x": [0, 1, 2, 3, 4, 5]}, n_trials=12, rungs=3, seed=0
    )
    assert out[0][0]["x"] == 3
    assert not math.isnan(out[0][1])


def test_successive_halving_minimize():
    def fn(p, budget):
        return (p["x"] - 2) ** 2 * 1.0

    out = successive_halving(
        fn, {"x": [0, 1, 2, 3, 4]}, n_trials=10, rungs=3, seed=3, maximize=False
    )
    assert out[0][0]["x"] == 2


def test_sparsemax_extremes():
    import numpy as np

    from deep_db_learning_spark.operators.kernels import sparsemax

    # one dominant logit -> one-hot
    p = sparsemax(np.array([[100.0, 0.0, -100.0]]))
    assert p[0].tolist() == [1.0, 0.0, 0.0]
    # translation invariance (projection property)
    z = np.array([[0.3, -1.2, 2.0, 0.0]])
    assert np.allclose(sparsemax(z), sparsemax(z + 7.5))


def test_trial_sweep_over_minibatch_trainer(db, tmp_path):
    """The reference's experiment loop end-to-end (Ray trials over
    blueprint training + MLflow logging, blueprint_mlflow.py:335-377):
    concurrent driver-thread trials run the REAL minibatch trainer at
    different learning rates, each logging to its own tracker run;
    results are deterministic, so the sweep's best pick is too."""
    from deep_db_learning_spark.plans.tracking import ExperimentTracker, load_runs
    from deep_db_learning_spark.plans.training import train_relational_minibatch
    from deep_db_learning_spark.plans.tuning import run_trials

    def trial(params):
        res = train_relational_minibatch(
            db.tables, db.primary_keys, db.foreign_keys,
            epochs=1, n_batches=2, seed=42, neighbor_budget=5,
            lr=params["lr"],
        )
        with ExperimentTracker(
            str(tmp_path / f"run_lr{params['lr']}.jsonl")
        ) as tr:
            tr.log_params(params)
            for i, loss in enumerate(res.losses):
                tr.log_metrics({"train_loss": loss}, step=i)
            tr.log_metrics({"test_acc": res.accuracy["test"]})
        return res.losses[-1]

    grid = [{"lr": 0.1}, {"lr": 0.5}]
    results = run_trials(trial, grid, max_concurrency=2)
    assert len(results) == 2
    finals = {params["lr"]: r for params, r in results}
    assert all(isinstance(v, float) for v in finals.values())
    # determinism: re-running one trial reproduces its loss exactly
    assert trial({"lr": 0.5}) == finals[0.5]
    # every trial left a readable tracker run with its params + metrics
    for lr in (0.1, 0.5):
        events = load_runs(str(tmp_path / f"run_lr{lr}.jsonl"))
        kinds = {e["kind"] for e in events}
        assert {"params", "metrics"} <= kinds
