"""Driver-side trial grid (SURVEY N29-lite).

The reference runs Ray Tune + Optuna with 4 concurrent trials
(``experiments/blueprint_mlflow.py:335-377``). Hyperparameter search is
out of the relational engine's scope, but the shape matters: each trial
is an independent Spark job chain, so trials submit from concurrent
driver threads exactly like the profiling prefetch — the cluster
interleaves their stages. This module is that minimal harness.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable


def run_trials(
    trial_fn: Callable[[dict], Any],
    grid: list[dict],
    max_concurrency: int = 4,
) -> list[tuple[dict, Any]]:
    """Run ``trial_fn(params)`` for every params dict in ``grid`` from
    up to ``max_concurrency`` driver threads (the reference's 4
    concurrent Ray trials). Returns [(params, result)...] in grid
    order; a failed trial records its exception."""

    def one(params: dict):
        try:
            return trial_fn(params)
        except Exception as exc:  # a failed trial must not kill the sweep
            return exc

    with ThreadPoolExecutor(min(max_concurrency, max(1, len(grid)))) as pool:
        results = list(pool.map(one, grid))
    return list(zip(grid, results))
