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


def sample_space(
    space: dict[str, list], n_trials: int, seed: int = 42
) -> list[dict]:
    """Random search: draw ``n_trials`` independent configs from a
    discrete space (the reference's Optuna samplers explore continuous
    spaces; discrete grids are what its actual search spaces contain —
    ``experiments/blueprint_mlflow.py:151-200``). Deterministic via a
    seeded RNG so sweeps are reproducible."""
    import random

    rng = random.Random(seed)
    return [
        {k: rng.choice(vs) for k, vs in sorted(space.items())}
        for _ in range(n_trials)
    ]


def successive_halving(
    trial_fn: Callable[[dict, int], float],
    space: dict[str, list],
    n_trials: int = 8,
    rungs: int = 3,
    keep: float = 0.5,
    seed: int = 42,
    maximize: bool = True,
    max_concurrency: int = 4,
) -> list[tuple[dict, float]]:
    """Successive-halving scheduler (the ASHA shape the reference gets
    from Ray Tune): run every config at a small budget, keep the best
    ``keep`` fraction, double the budget, repeat for ``rungs`` rungs.
    ``trial_fn(params, budget)`` returns a score (NaN/-inf on failure).
    Returns surviving (params, score) sorted best-first."""
    configs = sample_space(space, n_trials, seed)
    budget = 1
    scores: list[tuple[dict, float]] = [(c, float("nan")) for c in configs]
    for _ in range(rungs):
        results = run_trials(
            lambda p: trial_fn(p, budget), [c for c, _ in scores], max_concurrency
        )
        scored = [
            (p, r if isinstance(r, (int, float)) else float("-inf" if maximize else "inf"))
            for p, r in results
        ]
        scored.sort(key=lambda t: t[1], reverse=maximize)
        survivors = max(1, int(len(scored) * keep))
        scores = scored[:survivors]
        budget *= 2
        if len(scores) == 1:
            break
    return scores
