"""Composed corpus-cleaning pipeline — the end-to-end shape a training
-data run actually executes, built entirely from this package's
operators (no new primitives):

    PII redaction → exact document dedup → cross-doc paragraph/
    boilerplate removal → quality + repetition filtering →
    (optionally) overlapping chunking

Each stage is a DataFrame→DataFrame pass, so the whole pipeline is ONE
declarative plan until an action runs; Catalyst fuses the row-local
stages (redaction, scoring) into the scans, and only the corpus-level
stages (doc dedup, paragraph counts) shuffle. Stage order matters
twice over: redact first (row-local, normalizes PII variants so
otherwise-identical docs dedup together), and exact DOC dedup before
PARAGRAPH dedup — identical documents must collapse to one copy
first, or their shared paragraphs count as cross-document boilerplate
and the duplicate docs are wiped to empty instead of deduped. The doc
dedup also shrinks the paragraph-stage shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from .dedup import dedup_paragraphs, exact_dedup_keep_rows


@dataclass
class CleanStats:
    """Row counts after each stage (one count job per stage — call
    ``clean_corpus(..., with_stats=True)`` only when auditing).

    ``after_paragraph_dedup`` counts documents with NON-BLANK text
    after boilerplate removal — the stage is row-count-preserving
    (fully-boilerplate docs come back as empty strings), so a raw row
    count would always equal ``after_exact_dedup`` and never show the
    stage's effect."""

    input_docs: int
    after_exact_dedup: int
    after_paragraph_dedup: int
    after_quality_filter: int


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    redact: bool = True,
    boilerplate_min_docs: int | None = 2,
    min_quality: float = 0.3,
    max_dup_token_frac: float = 0.9,
    chunk_size: int | None = None,
    chunk_overlap: int = 64,
    with_stats: bool = False,
) -> DataFrame | tuple[DataFrame, CleanStats]:
    """Run the standard cleaning cascade; returns the cleaned documents
    (or chunks when ``chunk_size`` is set), plus per-stage row counts
    when ``with_stats``.

    Filters: exact dedup keeps the min-id representative of each
    distinct (redacted) text; blank/whitespace-only documents
    (including those emptied by boilerplate removal), documents scoring
    below ``min_quality``
    (:func:`~..functions.text.quality_score`), and documents more
    repetitive than ``max_dup_token_frac``
    (:func:`~..functions.text.duplicate_token_fraction`) are dropped.

    Only ``(id_col, text_col)`` flow through — metadata columns are
    dropped at the first select; re-join them on ``id_col`` afterwards
    (the stages reorder/regroup rows, so carrying wide payloads through
    every shuffle would be pure cost).

    ``with_stats`` runs one extra ``count()`` job per stage over a
    persisted snapshot of that stage (audit mode — the plain call runs
    no extra jobs and persists nothing).

    Span-level substring excision
    (:func:`~..operators.dedup.remove_duplicate_spans`, r6 — the Lee
    et al. 2022 pass) is deliberately NOT a default stage: it is
    destructive and an order of magnitude heavier than the
    paragraph-level boilerplate removal here; run it as its own pass
    before or after this cascade when the corpus calls for it.
    """
    if boilerplate_min_docs is not None and boilerplate_min_docs < 2:
        raise ValueError(
            f"boilerplate_min_docs must be >= 2 (got {boilerplate_min_docs}): "
            "at 1 every paragraph is 'shared' and the whole corpus empties"
        )
    persisted = []

    def stage_persist(frame):
        # persist before counting so later stages (and the final
        # action) reuse this prefix instead of recomputing the whole
        # lineage once per stats job
        persisted.append(frame.persist())
        return frame

    try:
        n_in = df.count() if with_stats else 0

        out = df.select(id_col, text_col)
        if redact:
            out = out.withColumn(text_col, T.redact_pii(F.col(text_col)))
        out = exact_dedup_keep_rows(out, text_col, id_col)
        n_dedup = stage_persist(out).count() if with_stats else 0

        if boilerplate_min_docs is not None:
            out = dedup_paragraphs(
                out, text_col, id_col, min_dup_docs=boilerplate_min_docs
            )
            # count docs that still HAVE text — the stage preserves row
            # count, so only the emptied-doc count shows its effect
            n_para = (
                stage_persist(out).filter(F.trim(F.col(text_col)) != "").count()
                if with_stats
                else 0
            )
        else:
            n_para = n_dedup

        # blank docs (born blank, or emptied by boilerplate removal)
        # never reach the output — quality_score('') ties the default
        # threshold, so an explicit guard is needed, not just the score
        # filter
        out = out.filter(
            (F.trim(F.col(text_col)) != "")
            & (T.quality_score(F.col(text_col)) >= min_quality)
            & (T.duplicate_token_fraction(F.col(text_col)) <= max_dup_token_frac)
        )
        n_qual = stage_persist(out).count() if with_stats else 0

        if chunk_size is not None:
            out = T.chunk_documents(
                out, text_col, id_col, size=chunk_size, overlap=chunk_overlap
            )
        if with_stats:
            out = out.persist()
            try:
                out.count()
            except Exception:
                out.unpersist()
                raise
            return out, CleanStats(n_in, n_dedup, n_para, n_qual)
        return out
    finally:
        # a mid-cascade failure must not leak pinned stage frames; on
        # success this runs after the final materializing count, so the
        # returned (separately persisted) frame is unaffected
        for p in persisted:
            p.unpersist()
