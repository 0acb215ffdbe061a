"""Pairwise association rules over (group → item) baskets.

Market-basket analytics — the classic co-occurrence mining pass
(support / confidence / lift for item pairs) a warehouse team runs over
exactly the FK fact tables this engine models (orders × parts, users ×
event types). Pairs only (the useful, tractable core): full frequent-
itemset mining grows exponentially; at 100 TB the pair pass IS the
production shape, with higher orders mined on the filtered pair
survivors.

Shape: one distinct over (group, item), one self-join co-partitioned on
the group key producing pair counts (the ``triangles.cooccurrence``
hot-group cap applies — a degenerate wide basket is quadratic in its
width, so wide groups are EXCLUDED-AND-RETURNED, never silently
joined), one item-count aggregate broadcast onto the pairs, and the
basket total folded in-plan via a 1-row broadcast (no driver collect).

Determinism: every statistic is exact integer counts; support /
confidence / lift are then fixed-order double expressions over those
integers — the DuckDB twin mirrors them term for term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_association_rules(
    facts: DataFrame,
    group_col: str,
    item_col: str,
    min_pair_groups: int = 2,
    max_per_group: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """Association rules for every DIRECTED item pair appearing in at
    least ``min_pair_groups`` baskets:
    ``(antecedent, consequent, n_pair, n_ante, n_cons, support,
    confidence, lift)`` with ``support = n_pair / N`` (N = basket
    count), ``confidence = n_pair / n_ante`` and
    ``lift = n_pair·N / (n_ante·n_cons)`` — both directions of a pair
    emitted (confidence is asymmetric). Returns ``(rules, hot)`` where
    ``hot`` lists the excluded too-wide baskets (the
    ``cooccurrence_edges`` contract)."""
    items = facts.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("__i")
    ).distinct()
    sizes = items.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    hot = sizes.filter(F.col("__n") > max_per_group)
    ok = items.join(F.broadcast(hot.select("__g")), "__g", "left_anti")
    n_groups = ok.groupBy().agg(
        F.countDistinct("__g").alias("__N")
    )
    item_cnt = ok.groupBy(F.col("__i").alias("__item")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    a = ok.select("__g", F.col("__i").alias("__ia"))
    b = ok.select("__g", F.col("__i").alias("__ib"))
    pair_cnt = (
        a.join(b, "__g")
        .filter(F.col("__ia") != F.col("__ib"))
        .groupBy("__ia", "__ib")
        .agg(F.count(F.lit(1)).alias("__np"))
        .filter(F.col("__np") >= min_pair_groups)
    )
    ca = item_cnt.select(
        F.col("__item").alias("__ia"), F.col("__cnt").alias("__na")
    )
    cb = item_cnt.select(
        F.col("__item").alias("__ib"), F.col("__cnt").alias("__nb")
    )
    j = (
        pair_cnt.join(F.broadcast(ca), "__ia")
        .join(F.broadcast(cb), "__ib")
        .crossJoin(F.broadcast(n_groups))
    )
    npd = F.col("__np").cast("double")
    nad = F.col("__na").cast("double")
    nbd = F.col("__nb").cast("double")
    nd = F.col("__N").cast("double")
    rules = j.select(
        F.col("__ia").alias("antecedent"),
        F.col("__ib").alias("consequent"),
        F.col("__np").alias("n_pair"),
        F.col("__na").alias("n_ante"),
        F.col("__nb").alias("n_cons"),
        (npd / nd).alias("support"),
        (npd / nad).alias("confidence"),
        (npd * nd / nad / nbd).alias("lift"),
    )
    return rules, hot.select(
        F.col("__g").alias(group_col), F.col("__n").alias("n_items")
    )


def pair_association_rules_oracle_sql(
    table: str,
    group_col: str,
    item_col: str,
    min_pair_groups: int = 2,
    max_per_group: int = 1000,
) -> str:
    """DuckDB twin of :func:`pair_association_rules` — identical counts
    and fixed-order double expressions."""
    return f"""
        WITH items AS MATERIALIZED (
          SELECT DISTINCT {group_col} AS g, {item_col} AS i FROM {table}
        ), ok AS MATERIALIZED (
          SELECT g, i FROM items
          WHERE g NOT IN (
            SELECT g FROM items GROUP BY g
            HAVING count(*) > {int(max_per_group)})
        ), n AS (
          SELECT count(DISTINCT g) AS N FROM ok
        ), icnt AS (
          SELECT i, count(*) AS cnt FROM ok GROUP BY i
        ), pcnt AS (
          SELECT a.i AS ia, b.i AS ib, count(*) AS np
          FROM ok a JOIN ok b ON a.g = b.g AND a.i <> b.i
          GROUP BY 1, 2
          HAVING count(*) >= {int(min_pair_groups)}
        )
        SELECT pcnt.ia AS antecedent, pcnt.ib AS consequent,
               pcnt.np AS n_pair, ca.cnt AS n_ante, cb.cnt AS n_cons,
               CAST(pcnt.np AS DOUBLE) / CAST(n.N AS DOUBLE) AS support,
               CAST(pcnt.np AS DOUBLE) / CAST(ca.cnt AS DOUBLE)
                 AS confidence,
               CAST(pcnt.np AS DOUBLE) * CAST(n.N AS DOUBLE)
                 / CAST(ca.cnt AS DOUBLE) / CAST(cb.cnt AS DOUBLE) AS lift
        FROM pcnt
        JOIN icnt ca ON ca.i = pcnt.ia
        JOIN icnt cb ON cb.i = pcnt.ib
        CROSS JOIN n
    """
