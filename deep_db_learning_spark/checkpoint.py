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

Storage hygiene: "checkpoint blocks are reclaimed on GC" holds
unconditionally only for ``localCheckpoint`` (ContextCleaner drops the
RDD blocks). Reliable ``checkpoint()`` FILES are removed at frame GC
only when ``spark.cleaner.referenceTracking.cleanCheckpoints`` is on —
a static driver-startup conf (default false), so it cannot be flipped
here after the session exists.
:func:`~deep_db_learning_spark.session.make_session` sets it; a
session built elsewhere with a checkpoint dir but without the conf
accumulates checkpoint files for the session lifetime across the
iterative callers (BFS frontiers, label propagation, streaming
snapshot merges) — :func:`cut_lineage` warns once when it detects that
posture.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_WARNED_UNCLEANED = False


def cut_lineage(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its logical plan.

    Uses a reliable ``checkpoint()`` when a checkpoint dir is set on
    the SparkContext (cluster posture), else ``localCheckpoint()``
    (local posture — fast, in-memory, non-recoverable).

    Idempotent per frame OBJECT (r14): a frame this function already
    returned is tagged and comes back as-is — re-checkpointing an
    already-materialized, already-truncated frame only costs an extra
    job. The tag lives on that exact DataFrame object; any derived
    frame (filter/select/join) is a new object and cuts normally.
    """
    if df.__dict__.get("_ddl_lineage_cut") is True:
        return df
    sc = df.sparkSession.sparkContext
    try:
        ckpt_dir = sc.getCheckpointDir()
    except Exception:  # pragma: no cover - very old API surface
        ckpt_dir = None
    if ckpt_dir:
        global _WARNED_UNCLEANED
        if not _WARNED_UNCLEANED and (
            sc.getConf().get(
                "spark.cleaner.referenceTracking.cleanCheckpoints", "false"
            )
            != "true"
        ):
            _WARNED_UNCLEANED = True
            warnings.warn(
                "cut_lineage: a checkpoint dir is set but "
                "spark.cleaner.referenceTracking.cleanCheckpoints is off — "
                "reliable checkpoint files will accumulate until the "
                "session ends. Set the conf at session build "
                "(make_session does) to reclaim them at frame GC.",
                RuntimeWarning,
                stacklevel=2,
            )
        out = df.checkpoint(eager=eager)
        out.__dict__["_ddl_lineage_cut"] = True
        return out
    out = df.localCheckpoint(eager=eager)
    out.__dict__["_ddl_lineage_cut"] = True
    return out
