"""Record linkage (operators/linkage.py) — DuckDB twins for the full
blocking → pairs → scores → best-match → clusters pipeline on part
names, hot-block exclusion, and a dirty-data resolution sanity run."""

import sys

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from tools.selfcheck import canon_rows  # noqa: E402

from deep_db_learning_spark.operators.linkage import (  # noqa: E402
    best_match,
    blocking_keys,
    candidate_pairs,
    entity_clusters,
    pair_scores,
)

# shared DuckDB tokenizer twin
_TOKS = "list_filter(string_split(lower(trim({t})), ' '), t -> t <> '')"

_SCORES = f"""
WITH rec AS (SELECT p_partkey AS id, p_name AS txt FROM part),
keys AS (
  SELECT DISTINCT id,
         array_to_string(list_sort(list_distinct({_TOKS.format(t='txt')}))[1:1], ' ')
           AS block_key
  FROM rec WHERE txt IS NOT NULL AND trim(txt) <> ''
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM keys a JOIN keys b USING (block_key)
  WHERE a.id < b.id
),
sc AS (
  SELECT id_a, id_b, ra.txt AS text_a, rb.txt AS text_b,
         levenshtein(ra.txt, rb.txt) AS lev,
         CASE WHEN greatest(length(ra.txt), length(rb.txt)) = 0 THEN 1.0
              ELSE 1.0 - CAST(levenshtein(ra.txt, rb.txt) AS DOUBLE)
                   / greatest(length(ra.txt), length(rb.txt)) END AS lev_sim,
         CASE WHEN len(list_distinct(list_concat(
                  {_TOKS.format(t='ra.txt')}, {_TOKS.format(t='rb.txt')}))) = 0
              THEN 0.0
              ELSE CAST(len(list_intersect({_TOKS.format(t='ra.txt')},
                                           {_TOKS.format(t='rb.txt')})) AS DOUBLE)
                   / len(list_distinct(list_concat(
                       {_TOKS.format(t='ra.txt')}, {_TOKS.format(t='rb.txt')})))
         END AS token_jaccard
  FROM pairs
  JOIN rec ra ON id_a = ra.id
  JOIN rec rb ON id_b = rb.id
)
SELECT * FROM sc
"""


@pytest.fixture(scope="module")
def part_scores(db):
    rec = db.df("part").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("txt")
    )
    keys = blocking_keys(rec, "id", "txt", strategy="sorted_prefix", n=1)
    pairs, hot = candidate_pairs(keys, "id")
    assert hot.count() == 0  # no hot blocks at sf0.001
    return rec, pair_scores(pairs, rec, "id", "txt")


def _hash(df):
    cols = df.columns
    return canon_rows(cols, [tuple(r) for r in df.collect()])


def test_scores_match_duckdb_twin(part_scores, duck):
    _, scores = part_scores
    sh, slines = _hash(scores)
    res = duck.execute(_SCORES)
    ocols = [d[0] for d in res.description]
    oh, olines = canon_rows(ocols, res.fetchall())
    assert len(slines) == len(olines) and len(slines) > 0
    assert sh == oh, [(a, b) for a, b in zip(slines, olines) if a != b][:3]


def test_best_match_matches_duckdb(part_scores, duck):
    _, scores = part_scores
    got = best_match(scores, k=1).select("id_a", "id_b", "match_rank")
    want = duck.execute(
        _SCORES
        + """
        QUALIFY row_number() OVER (
          PARTITION BY id_a ORDER BY lev_sim DESC, id_b ASC) <= 1
        """
    )
    # project the twin to the same columns
    import pandas as pd  # noqa: F401

    w = [(r[0], r[1], 1) for r in want.fetchall()]
    sh, _ = canon_rows(["id_a", "id_b", "match_rank"], [tuple(r) for r in got.collect()])
    oh, _ = canon_rows(["id_a", "id_b", "match_rank"], w)
    assert sh == oh


def test_entity_clusters_match_recursive_cte(part_scores, duck):
    _, scores = part_scores
    clusters = entity_clusters(scores, threshold=0.75, score_col="lev_sim")
    rows = sorted((r["id"], r["entity_id"]) for r in clusters.collect())
    want = duck.execute(
        f"""
        WITH RECURSIVE sc AS ({_SCORES}),
        e AS (
          SELECT id_a AS src, id_b AS dst FROM sc WHERE lev_sim >= 0.75
        ),
        nodes AS (
          SELECT DISTINCT id_a AS id FROM sc
          UNION SELECT DISTINCT id_b FROM sc
        ),
        sym AS (
          SELECT src, dst FROM e UNION SELECT dst, src FROM e
        ),
        walk AS (
          -- full reachability (UNION dedup terminates); a descent-only
          -- walk misses minima that sit behind a higher-id hop
          SELECT id AS node, id AS reach FROM nodes
          UNION
          SELECT walk.node, sym.dst
          FROM walk JOIN sym ON walk.reach = sym.src
        )
        SELECT node, min(reach) FROM walk GROUP BY node ORDER BY node
        """
    ).fetchall()
    assert rows == [tuple(r) for r in want]
    # every record in scores got an entity; entity ids are members
    ids = {r[0] for r in rows}
    ents = {r[1] for r in rows}
    assert ents <= ids


def test_blocking_strategies(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, t="Red  Widget"),
            Row(id=2, t="widget red"),
            Row(id=3, t="blue bolt"),
            Row(id=4, t=""),
            Row(id=5, t=None),
        ]
    )
    sp = {
        r["id"]: r["block_key"]
        for r in blocking_keys(df, "id", "t", "sorted_prefix", n=2).collect()
    }
    # word order and case do not matter; empties/NULLs emit nothing
    assert sp == {1: "red widget", 2: "red widget", 3: "blue bolt"}
    ft = {
        r["id"]: r["block_key"]
        for r in blocking_keys(df, "id", "t", "first_token").collect()
    }
    assert ft == {1: "red", 2: "widget", 3: "blue"}
    fp = {
        r["id"]: r["block_key"]
        for r in blocking_keys(df, "id", "t", "fingerprint").collect()
    }
    assert fp[1] == fp[2] == "red widget"
    with pytest.raises(ValueError):
        blocking_keys(df, "id", "t", "nope")


def test_hot_block_excluded_not_silent(spark):
    rows = [Row(id=i, block_key="the") for i in range(50)] + [
        Row(id=100, block_key="rare"),
        Row(id=101, block_key="rare"),
    ]
    keys = spark.createDataFrame(rows)
    pairs, hot = candidate_pairs(keys, "id", max_block=10)
    assert [tuple(r) for r in pairs.collect()] == [(100, 101)]
    h = hot.collect()
    assert len(h) == 1 and h[0]["block_key"] == "the" and h[0]["n_records"] == 50


def test_dirty_variants_resolve_together(spark):
    recs = spark.createDataFrame(
        [
            Row(id=1, t="acme anvil corp"),
            Row(id=2, t="acme anvil corp."),   # punctuation drift
            Row(id=3, t="acme anvill corp"),   # typo
            Row(id=4, t="globex gadget ltd"),
            Row(id=5, t="globex gadget ltd"),  # exact dup
        ]
    )
    keys = blocking_keys(recs, "id", "t", "first_token")
    pairs, _ = candidate_pairs(keys, "id")
    scores = pair_scores(pairs, recs, "id", "t")
    ents = {
        r["id"]: r["entity_id"]
        for r in entity_clusters(scores, threshold=0.85).collect()
    }
    assert ents[1] == ents[2] == ents[3] == 1
    assert ents[4] == ents[5] == 4


def test_entity_clusters_all_singletons_at_high_threshold(spark):
    from pyspark.sql import Row as R

    scores = spark.createDataFrame(
        [R(id_a=1, id_b=2, lev_sim=0.5), R(id_a=2, id_b=3, lev_sim=0.4)]
    )
    ents = {r["id"]: r["entity_id"]
            for r in entity_clusters(scores, threshold=0.99).collect()}
    assert ents == {1: 1, 2: 2, 3: 3}  # nobody merges; all self-entities


def test_mutual_best_matches_is_a_matching(spark):
    """Reciprocal-best-hit: chains break (a's best is b, b's best is c
    -> no pair with a), reciprocal pairs survive, and every id appears
    in at most one output pair."""
    from deep_db_learning_spark.operators.linkage import mutual_best_matches

    rows = [
        # chain: 1->2 (0.9), 2->3 (0.95), 3<->2 reciprocal
        (1, 2, 0.9),
        (2, 3, 0.95),
        # isolated reciprocal pair
        (10, 11, 0.8),
        # 20's best is 21; 21's best is 22; 22's best is 21 -> (21,22)
        (20, 21, 0.7),
        (21, 22, 0.75),
    ]
    df = spark.createDataFrame(rows, "id_a bigint, id_b bigint, lev_sim double")
    got = sorted(
        (r["id_a"], r["id_b"], r["lev_sim"])
        for r in mutual_best_matches(df).collect()
    )
    assert got == [(2, 3, 0.95), (10, 11, 0.8), (21, 22, 0.75)]
    ids = [i for a, b, _s in got for i in (a, b)]
    assert len(ids) == len(set(ids))  # a matching: no id twice


def test_mutual_best_matches_tiebreak_deterministic(spark):
    from deep_db_learning_spark.operators.linkage import mutual_best_matches

    # 1 ties between 2 and 3 -> smaller id (2) wins; 2's best is 1
    rows = [(1, 2, 0.5), (1, 3, 0.5)]
    df = spark.createDataFrame(rows, "id_a bigint, id_b bigint, lev_sim double")
    got = [(r["id_a"], r["id_b"]) for r in mutual_best_matches(df).collect()]
    assert got == [(1, 2)]
