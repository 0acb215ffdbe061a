"""Distributed suffix array (operators/suffix_array.py): full-array
parity against the independent python twin, LRS parity, and
handcrafted edge semantics (cross-document repeats, identical
documents, null/empty texts)."""

import pytest
from pyspark.sql import functions as F

from deep_db_learning_spark.operators.suffix_array import (
    build_suffix_array,
    longest_repeated_substring,
    longest_repeated_substring_py,
    suffix_array_py,
)


def test_suffix_array_matches_python_twin(db):
    sub = db.df("documents").filter("doc_id < 40")
    ranks, rounds = build_suffix_array(sub)
    got = [
        (r["doc"], r["pos"])
        for r in ranks.orderBy("r", "doc", "pos").collect()
    ]
    texts = {r["doc_id"]: r["text"] for r in sub.collect() if r["text"]}
    want = suffix_array_py(texts)
    assert got == want
    assert len(got) == sum(len(t) for t in texts.values())
    # doubling really terminated: the last round's window covers the
    # longest document
    assert rounds[-1][0] >= max(len(t) for t in texts.values()) or (
        ranks.agg(F.max("r")).first()[0] == len(got)
    )


def test_lrs_matches_python_twin(db):
    sub = db.df("documents").filter("doc_id < 60")
    got = sorted(
        (r["doc_id"], r["pos"], r["lcp"])
        for r in longest_repeated_substring(sub).collect()
    )
    texts = {r["doc_id"]: r["text"] for r in sub.collect() if r["text"]}
    want = longest_repeated_substring_py(texts)
    assert got == want
    assert len(got) >= 2
    # the reported substrings are genuinely equal in the raw text
    length = got[0][2]
    spans = {texts[d][p : p + length] for d, p, _l in got}
    # every maximal pair shares its substring with at least one other
    # position — the multiset of spans has fewer distinct values than
    # positions
    assert len(spans) < len(got)


def test_handcrafted_cross_document_repeat(spark):
    docs = spark.createDataFrame(
        [
            (1, "xxTHE SHARED SEGMENTzz"),
            (2, "aaTHE SHARED SEGMENTbb"),
            (3, "unrelated text here"),
        ],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r["doc_id"], r["pos"], r["lcp"])
        for r in longest_repeated_substring(docs).collect()
    )
    texts = {1: "xxTHE SHARED SEGMENTzz", 2: "aaTHE SHARED SEGMENTbb",
             3: "unrelated text here"}
    assert got == longest_repeated_substring_py(texts)
    assert got[0][2] == len("THE SHARED SEGMENT")
    assert {(d, p) for d, p, _l in got} == {(1, 2), (2, 2)}


def test_identical_documents_tie_break(spark):
    """Two identical documents: every suffix is duplicated, the LRS is
    the whole document, and the equal-rank tie-break by (doc, pos)
    keeps the array a deterministic total order."""
    docs = spark.createDataFrame(
        [(7, "same text"), (9, "same text"), (11, None), (12, "")],
        "doc_id bigint, text string",
    )
    ranks, _rounds = build_suffix_array(docs)
    got = [
        (r["doc"], r["pos"])
        for r in ranks.orderBy("r", "doc", "pos").collect()
    ]
    texts = {7: "same text", 9: "same text"}
    assert got == suffix_array_py(texts)
    lrs = sorted(
        (r["doc_id"], r["pos"], r["lcp"])
        for r in longest_repeated_substring(docs).collect()
    )
    assert lrs == longest_repeated_substring_py(texts)
    assert lrs[0][2] == len("same text")
    assert (7, 0, 9) in lrs and (9, 0, 9) in lrs


def test_no_repeat_corpus(spark):
    """A corpus whose longest repeat is a single character still
    reports it (lcp ≥ 1 whenever any character occurs twice); a
    corpus of fully distinct characters reports nothing."""
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "def")], "doc_id bigint, text string"
    )
    assert longest_repeated_substring(docs).count() == 0
    docs2 = spark.createDataFrame(
        [(1, "abca")], "doc_id bigint, text string"
    )
    rows = sorted(
        (r["doc_id"], r["pos"], r["lcp"])
        for r in longest_repeated_substring(docs2).collect()
    )
    assert rows == longest_repeated_substring_py({1: "abca"})
    assert rows[0][2] == 1


def test_all_null_or_empty_corpus(spark):
    """Zero corpus positions (every text NULL or ''): the build
    returns the empty ranks frame instead of crashing on None
    aggregates, and LRS is empty."""
    from deep_db_learning_spark.operators.suffix_array import (
        build_suffix_array,
        longest_repeated_substring,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id bigint, text string"
    )
    ranks, rounds = build_suffix_array(df)
    assert ranks.count() == 0
    assert len(rounds) == 1
    assert longest_repeated_substring(df).count() == 0
