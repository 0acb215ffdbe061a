"""Extended TPC-H query shapes over the driver testdata schema.

The reference is accuracy-focused and ships no analytic query suite;
SURVEY §2 nevertheless requires "same query capabilities", and the five
headline shapes (Q1/Q3/Q5/Q6/Q18 in ``__spark_entry__``) leave several
canonical relational patterns unexercised. This module adds nine more,
each adapted minimally where the synthetic schema lacks a TPC-H column
(no partsupp, l_shipmode, l_commitdate, c_phone, p_container — each
docstring names the substitution):

- Q4  — EXISTS semi-join with a cross-table predicate
- Q7  — two-role dimension (nation twice) + disjunctive pair filter
- Q8  — market-share ratio of two conditional aggregates
- Q10 — join + agg + deterministic top-k by revenue
- Q13 — LEFT join with join-side predicate + histogram of counts
- Q14 — conditional-aggregate ratio (promo revenue)
- Q15 — aggregate → max-of-aggregate scalar subquery join-back
- Q17 — correlated per-group average threshold (decorrelated to a join)
- Q22 — anti-join (NOT EXISTS) under a global-average scalar filter

Every float aggregate uses the decimal fold (``functions/exact_agg``)
so Spark and the DuckDB twins in :data:`ORACLES` agree bitwise; float
literals cross into SQL as ``CAST('…' AS DOUBLE)`` (bare decimals parse
as DECIMAL in DuckDB). Ratio/threshold arithmetic on top of bit-equal
folds is plain IEEE double math — identical on both engines.

Scale posture: dimension sides (nation, region, filtered part/supplier
sets, the per-part averages of Q17, every scalar aggregate) broadcast;
the only big-table shuffles are the unavoidable fact-side joins and
group-bys on their keys. Top-k uses sort-limit (TakeOrderedAndProject),
never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exact_agg import (
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def tpch_q4(db) -> DataFrame:
    """Q4 order-priority checking. Adaptation: the schema has no
    l_commitdate/l_receiptdate, so "late" is a lineitem shipped more
    than 80 days after the order date (same EXISTS-with-cross-table-
    predicate shape)."""
    o = db.df("orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    li = db.df("lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        # full-timestamp shift (date_add would truncate to DATE and
        # silently diverge from the INTERVAL-based oracle on any
        # non-midnight order timestamp)
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def tpch_q7(db) -> DataFrame:
    """Q7 volume shipping between ASIA and EUROPE (both directions), by
    nation pair and shipping year. The nation+region dimensions play
    two roles (supplier's and customer's) — aliased twice, both
    broadcast. Adaptation: a region pair instead of TPC-H's nation pair
    — the synthetic supplier table is tiny at small SFs and a single
    nation pair can be empty; the two-role/disjunctive shape is
    identical."""
    nr = db.df("nation").join(
        db.df("region"), F.col("n_regionkey") == F.col("r_regionkey")
    )
    n1 = nr.select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"),
        F.col("r_name").alias("supp_region"),
    )
    n2 = nr.select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"),
        F.col("r_name").alias("cust_region"),
    )
    li = db.df("lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    j = (
        li.join(db.df("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(db.df("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(db.df("supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_region") == "ASIA")
                & (F.col("cust_region") == "EUROPE")
            )
            | (
                (F.col("supp_region") == "EUROPE")
                & (F.col("cust_region") == "ASIA")
            )
        )
    )
    return (
        j.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


def tpch_q8(db) -> DataFrame:
    """Q8 national market share: NATION_2's share of PROMO-part volume
    sold into ASIA, per order year (p_type='PROMO' stands in for
    'ECONOMY ANODIZED STEEL'). The ratio divides two bit-equal decimal
    folds — deterministic double division."""
    asia_cust = (
        db.df("customer")
        .join(
            F.broadcast(db.df("nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(db.df("region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = (
        db.df("supplier")
        .join(
            F.broadcast(
                db.df("nation").select("n_nationkey", F.col("n_name").alias("supp_nation"))
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    promo = db.df("part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    j = (
        db.df("lineitem")
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .join(db.df("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("2000-01-01"))
        )
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "leftsemi")
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                exact_sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0.0)))
                / exact_sum(vol)
            ).alias("mkt_share")
        )
    )


def tpch_q10(db) -> DataFrame:
    """Q10 returned-item reporting: top 20 customers by revenue lost to
    returns (l_returnflag='R') for orders placed in 1996H1. Ties broken
    by c_custkey; sort-limit, no global sort."""
    j = (
        db.df("lineitem")
        .filter(F.col("l_returnflag") == "R")
        .join(db.df("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1996-07-01"))
        )
        .join(db.df("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(db.df("nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def tpch_q13(db) -> DataFrame:
    """Q13 customer order-count distribution: LEFT join with the
    predicate ON THE JOIN (priority <> '5-LOW' stands in for the
    comment NOT LIKE filter), then a histogram of per-customer counts.
    Customers with no qualifying orders land in the c_count=0 bucket —
    the semantic a WHERE-side filter would silently drop."""
    o = db.df("orders").filter(F.col("o_orderpriority") != "5-LOW").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        db.df("customer")
        .select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def tpch_q14(db) -> DataFrame:
    """Q14 promotion effect for 1997-09: 100 * promo volume / total
    volume. One row; both sums are decimal folds."""
    li = db.df("lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    j = li.join(
        F.broadcast(db.df("part").select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.agg(
        (
            F.lit(100.0)
            * exact_sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
            / exact_sum(vol)
        ).alias("promo_revenue")
    )


def tpch_q15(db) -> DataFrame:
    """Q15 top supplier(s): per-supplier revenue for 1996Q1, keep the
    max. The scalar max broadcasts back over the aggregate (the view +
    scalar-subquery shape, decorrelated)."""
    li = db.df("lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
        .join(
            db.df("supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")
        )
    )


def tpch_q17(db) -> DataFrame:
    """Q17 small-quantity-order revenue for Brand#23 (no p_container in
    the schema): lineitems under 20% of the part's average quantity,
    yearly-averaged revenue. The correlated per-part AVG decorrelates
    into a broadcast join of a tiny per-part aggregate."""
    parts = db.df("part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = db.df("lineitem").join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        exact_avg("l_quantity").alias("__avg_qty")
    )
    small = li.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("__pk")).filter(
        F.col("l_quantity") < F.lit(0.2) * F.col("__avg_qty")
    )
    return small.agg(
        (exact_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
    )


def tpch_q22(db) -> DataFrame:
    """Q22 global sales opportunity: customers in the odd-key nations
    (standing in for the phone-prefix list) with above-average positive
    balances and no RECENT orders (none since 2000-01-01 — the
    synthetic data gives every customer at least one all-time order, so
    a plain NOT EXISTS would be empty) — the anti-join under a
    global-average scalar filter."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = db.df("customer").filter(F.col("c_nationkey").isin(nations))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        exact_avg("c_acctbal").alias("__avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg_bal")
    )
    no_orders = rich.join(
        db.df("orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "leftanti",
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        exact_sum("c_acctbal").alias("totacctbal"),
    )


QUERIES = {
    "tpch_q4": tpch_q4,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q10": tpch_q10,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q15": tpch_q15,
    "tpch_q17": tpch_q17,
    "tpch_q22": tpch_q22,
}

_VOL = "l_extendedprice * (1 - l_discount)"

ORACLES = {
    "tpch_q4": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY)
        GROUP BY o_orderpriority
    """,
    "tpch_q7": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               {exact_sum_sql(_VOL)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
            OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
        GROUP BY 1, 2, 3
    """,
    "tpch_q8": f"""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {exact_sum_sql(
                   "CASE WHEN sn.n_name = 'NATION_2' THEN " + _VOL
                   + " ELSE CAST('0' AS DOUBLE) END")}
               / {exact_sum_sql(_VOL)} AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '2000-01-01'
          AND EXISTS (
            SELECT 1 FROM customer c
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            JOIN region r ON cn.n_regionkey = r.r_regionkey
            WHERE c.c_custkey = o_custkey AND r.r_name = 'ASIA')
        GROUP BY 1
    """,
    "tpch_q10": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {exact_sum_sql(_VOL)} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey)
        GROUP BY c_count
    """,
    "tpch_q14": f"""
        SELECT CAST('100' AS DOUBLE)
               * {exact_sum_sql(
                   "CASE WHEN p_type = 'PROMO' THEN " + _VOL
                   + " ELSE CAST('0' AS DOUBLE) END")}
               / {exact_sum_sql(_VOL)} AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    "tpch_q15": f"""
        WITH rev AS (
          SELECT l_suppkey, {exact_sum_sql(_VOL)} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    "tpch_q17": f"""
        WITH li AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#23'
        ), avg_q AS (
          SELECT l_partkey AS pk, {exact_avg_sql('l_quantity')} AS avg_qty
          FROM li GROUP BY 1)
        SELECT {exact_sum_sql('l_extendedprice')} / CAST('7' AS DOUBLE)
               AS avg_yearly
        FROM li JOIN avg_q ON l_partkey = pk
        WHERE l_quantity < CAST('0.2' AS DOUBLE) * avg_qty
    """,
    "tpch_q22": f"""
        WITH cust AS (
          SELECT * FROM customer
          WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        SELECT c_nationkey, count(*) AS numcust,
               {exact_sum_sql('c_acctbal')} AS totacctbal
        FROM cust c
        WHERE c_acctbal > (
            SELECT {exact_avg_sql('c_acctbal')} FROM cust
            WHERE c_acctbal > CAST('0' AS DOUBLE))
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c.c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
    """,
}
