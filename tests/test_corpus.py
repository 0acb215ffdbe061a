"""Composed corpus-cleaning pipeline (operators/corpus.py)."""

from pyspark.sql import functions as F

from deep_db_learning_spark.operators.corpus import clean_corpus


def _corpus(spark):
    license_line = "shared license header across docs"
    body_a = "the quick brown fox jumps over the lazy dog and runs far away into the hills " * 3
    body_b = "the slow green turtle walks under the bright sun and rests in the warm sand " * 3
    body_c = "contact me at someone@example.com about the meeting and the plans for it " * 3
    rows = [
        (0, f"{license_line}\n{body_a}"),
        (1, f"{license_line}\n{body_b}"),
        (2, "spam " * 39 + "spam"),    # repetitive: dup fraction 39/40
        (3, "?!?!#@"),                 # low quality
        (4, body_c),                   # original
        (5, body_c),                   # exact duplicate of doc 4
        (6, license_line),             # pure boilerplate
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_clean_corpus_cascade(spark):
    df = _corpus(spark)
    out, stats = clean_corpus(df, with_stats=True)
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert stats.input_docs == 7
    # exact duplicate collapses to the min id FIRST (so the shared body
    # does not get miscounted as cross-doc boilerplate)
    assert stats.after_exact_dedup == 6
    assert 4 in texts and 5 not in texts
    # boilerplate header removed everywhere; the pure-boilerplate doc dies
    assert 6 not in texts
    assert all("shared license header" not in t for t in texts.values())
    # repetitive + junk docs filtered
    assert 2 not in texts and 3 not in texts
    # header-stripped docs keep their unique bodies
    assert texts[0].startswith("the quick brown fox")
    assert texts[1].startswith("the slow green turtle")
    # PII is gone but the document survived
    assert "someone@example.com" not in texts[4] and "<EMAIL>" in texts[4]
    assert sorted(texts) == [0, 1, 4]
    assert stats.after_quality_filter == 3
    # paragraph-stage stat counts docs that still HAVE text (the stage
    # preserves row count): of the 6 post-dedup docs, only the pure
    # -boilerplate doc 6 is emptied
    assert stats.after_paragraph_dedup == 5


def test_clean_corpus_chunked_output(spark):
    df = _corpus(spark)
    chunks = clean_corpus(df, chunk_size=80, chunk_overlap=16)
    rows = chunks.collect()
    assert set(chunks.columns) == {"doc_id", "chunk_id", "chunk_start", "chunk"}
    assert all(len(r["chunk"]) <= 80 for r in rows)
    # surviving docs longer than one chunk produce multiple chunks
    assert max(r["chunk_id"] for r in rows) >= 1


def test_clean_corpus_degenerate_docs_dropped(spark):
    import pytest

    from deep_db_learning_spark.operators.corpus import clean_corpus

    rows = [
        (0, "   "),          # whitespace-only
        (1, ""),             # empty
        (2, None),           # null
        (3, "a perfectly normal document about the weather and the sea " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # with AND without the boilerplate stage, degenerate docs never
    # reach the output (quality_score('') ties the 0.3 default — the
    # explicit blank guard is what drops them)
    for kw in ({}, {"boilerplate_min_docs": None}):
        out = clean_corpus(df, **kw)
        assert [r["doc_id"] for r in out.collect()] == [3]
    with pytest.raises(ValueError, match="boilerplate_min_docs"):
        clean_corpus(df, boilerplate_min_docs=1)
    with pytest.raises(ValueError, match="overlap"):
        clean_corpus(df, chunk_size=100, chunk_overlap=-1)


def test_clean_corpus_stats_failure_unpersists(spark):
    """A mid-cascade failure in audit mode must not leak pinned
    frames: the chunking ValueError fires AFTER three stage persists,
    and the try/finally must release them all."""
    import pytest

    df = _corpus(spark)
    before = dict(spark.sparkContext._jsc.getPersistentRDDs())
    with pytest.raises(ValueError, match="overlap"):
        clean_corpus(df, with_stats=True, chunk_size=10, chunk_overlap=20)
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    leaked = set(after) - set(before)
    assert not leaked, f"persisted frames leaked after failure: {leaked}"
