"""Streaming quality routing — the trained LR quality filter
(``operators/quality_filter``) applied to an ARRIVING corpus: every
micro-batch of documents is scored and routed keep/drop, the front
door of a continuously-fed curation funnel (crawl → score → keep
stream feeds dedup-on-arrival, ``streaming/crawl.py``).

Design (the repo's stream-maintainer pattern): scoring runs the BATCH
operator inside ``foreachBatch`` — the identical
``quality_logit_scores`` codegen path (broadcast dec9 weight table +
exact decimal logit fold), so a streamed batch's scores are
bit-identical to scoring the same rows in batch BY CONSTRUCTION, not
by test luck. Routing writes ``keep/batch=<id>`` and
``drop/batch=<id>`` OVERWRITE partitions: a replayed batch rewrites
the same rows, so the router is replay-idempotent without a cursor
(the partdir layout). Rows whose text is NULL are routed to ``drop``
with a NULL logit (they are outside the scoring corpus convention —
never silently kept).

Model lifecycle mirrors the qhist cut-set lifecycle: the weights are
FROZEN at stream start (that is what makes replay deterministic);
retrain on drift (e.g. a ``stream_cut_drift_monitor`` over the logit
column against cuts frozen at deployment) and start a new router
generation — new checkpoint, new output path. Scores from different
model generations are not comparable; never mix them in one area.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.quality_filter import QFModel, quality_logit_scores


def stream_quality_route(
    stream: DataFrame,
    model: QFModel,
    out_path: str,
    checkpoint: str,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_name: str = "quality_router",
):
    """Route an arriving document stream by trained-filter logit:
    ``qf_logit ≥ threshold`` → ``keep/batch=<id>``, else (including
    NULL text ⇒ NULL logit) → ``drop/batch=<id>``. Each batch costs
    one scoring pass (broadcast weights, one fold shuffle) and two
    partition writes. Returns the started query."""

    def route(batch_df: DataFrame, batch_id: int) -> None:
        scored = batch_df.join(
            quality_logit_scores(
                batch_df, model, text_col=text_col, id_col=id_col,
                spread=False,
            ).select(id_col, "qf_logit"),
            id_col,
            "left",
        )
        keep = scored.where(F.col("qf_logit") >= F.lit(float(threshold)))
        drop = scored.where(
            F.col("qf_logit").isNull()
            | (F.col("qf_logit") < F.lit(float(threshold)))
        )
        keep.write.mode("overwrite").parquet(
            os.path.join(out_path, "keep", f"batch={batch_id}")
        )
        drop.write.mode("overwrite").parquet(
            os.path.join(out_path, "drop", f"batch={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(route)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_routed(spark, out_path: str, area: str) -> DataFrame | None:
    """Read one routed area (``keep``/``drop``) across all batches;
    ``None`` when the area doesn't exist yet. Only the missing-path
    analysis error is swallowed (the vector_store lesson: a broad
    except here would mask real read failures)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.option(
            "basePath", os.path.join(out_path, area)
        ).parquet(os.path.join(out_path, area, "batch=*"))
    except AnalysisException:
        return None
