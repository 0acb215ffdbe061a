"""Deployment-gated lineage cutting.

Several operators (iterative BFS / label propagation, dedup loser
sets, the training frame, streaming snapshot merges) must materialize
an intermediate and *cut its lineage* — a bare ``persist()`` is not
enough when the next step re-derives the frame from a source that is
about to be overwritten, or when the plan would otherwise grow without
bound across iterations.

``localCheckpoint`` is the fast way to do that, but its blocks are
stored only on the executors that computed them, unreplicated and
non-recomputable: on a real cluster, losing one executor makes every
downstream action fail permanently instead of recomputing lineage.
That is acceptable in ``local[N]`` (one JVM — if it dies the job is
gone anyway) but a fault-tolerance regression at 100 TB scale.

``cut_lineage`` gates on deployment: when the caller has configured a
reliable checkpoint directory (``sc.setCheckpointDir('hdfs://...')`` /
S3), it uses ``DataFrame.checkpoint`` — replicated, storage-backed,
survives executor loss. Otherwise it falls back to ``localCheckpoint``.
Cluster jobs therefore opt into fault tolerance with one line of
session setup and no operator changes.

Storage hygiene: reliable checkpoint files are NOT removed when their
frames are garbage-collected unless
``spark.cleaner.referenceTracking.cleanCheckpoints`` is on —
:func:`~deep_db_learning_spark.session.make_session` sets it, so the
iterative callers (BFS frontiers, label propagation, streaming
snapshot merges) do not leak the checkpoint dir over a long job. Set
it yourself if you build the session elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its logical plan.

    Uses a reliable ``checkpoint()`` when a checkpoint dir is set on
    the SparkContext (cluster posture), else ``localCheckpoint()``
    (local posture — fast, in-memory, non-recoverable).
    """
    sc = df.sparkSession.sparkContext
    try:
        ckpt_dir = sc.getCheckpointDir()
    except Exception:  # pragma: no cover - very old API surface
        ckpt_dir = None
    if ckpt_dir:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
