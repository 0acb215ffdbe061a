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


def _ps_pairs(db) -> DataFrame:
    """Derived part-supplier catalog — the schema has no ``partsupp``
    (reference registers full tpch, ``ctu_repository_defauts.py:528``),
    so the Q2/Q16/Q20 family derives it from observed lineitems: one
    row per (part, supplier) pair with the pair's MINIMUM observed unit
    price standing in for ``ps_supplycost``. Unit price is a row-local
    double division and MIN is order-independent, so the frame is
    bit-identical to the oracle's CTE with no decimal fold needed."""
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    return (
        db.df("lineitem")
        .select("l_partkey", "l_suppkey", unit.alias("__unit"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("__unit").alias("ps_supplycost"))
    )


def tpch_q2(db) -> DataFrame:
    """Q2 minimum-cost supplier: for each LARGE small-size part, the
    EUROPE supplier(s) offering the minimum derived supply cost. The
    correlated MIN subquery decorrelates into a per-part aggregate over
    the region-restricted pairs, broadcast back onto an equality
    filter (ties return every minimal supplier, as the spec does)."""
    ps = _ps_pairs(db)
    eu = (
        db.df("supplier")
        .join(
            F.broadcast(db.df("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(db.df("region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = db.df("part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_brand")
    cand = ps.join(
        F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey")
    ).join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
    mn = cand.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("ps_supplycost").alias("__min_cost")
    )
    return cand.join(
        F.broadcast(mn),
        (F.col("l_partkey") == F.col("__pk"))
        & (F.col("ps_supplycost") == F.col("__min_cost")),
    ).select(
        "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
        "ps_supplycost",
    )


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


def tpch_q9(db) -> DataFrame:
    """Q9 product-type profit rollup by (supplier nation, order year).
    Adaptation: no ``ps_supplycost``, so cost = 0.5 · p_retailprice ·
    l_quantity (a fixed wholesale fraction — the rollup/join shape is
    the point); parts filtered by name prefix like the spec's
    ``p_name LIKE '%green%'``."""
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        db.df("lineitem")
        .join(
            F.broadcast(
                db.df("part")
                .filter(F.col("p_name").startswith("small"))
                .select("p_partkey", "p_retailprice")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(db.df("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(db.df("supplier").select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(db.df("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("int").alias("o_year"),
    ).agg(exact_sum(profit).alias("sum_profit"))


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


def tpch_q11(db) -> DataFrame:
    """Q11 important stock: per-part inventory value restricted to one
    region's suppliers, kept only where it exceeds a fraction of the
    TOTAL value — the group-by-HAVING-scalar-subquery shape. Value =
    Σ l_extendedprice · l_quantity over ASIA-supplier lineitems
    (deriving inventory from observed flow; no ``ps_availqty``). Both
    the per-part and the global sums are decimal folds, so the
    threshold comparison is bit-identical cross-engine."""
    asia = (
        db.df("supplier")
        .join(
            F.broadcast(db.df("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(db.df("region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    li = db.df("lineitem").join(
        F.broadcast(asia), F.col("l_suppkey") == F.col("s_suppkey"), "leftsemi"
    )
    # multiply IN DECIMAL: a double product can straddle a scale-9
    # boundary between Spark's shortest-repr rounding and DuckDB's
    # true-binary rounding (price·qty does at this SF); 2-decimal price
    # and integral quantity cast exactly, and the decimal product is
    # exact, so the fold is engine-independent
    value = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_quantity"
    ).cast("decimal(3,0)")
    per_part = li.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        exact_sum(value).alias("value")
    )
    total = li.agg(exact_sum(value).alias("__tot"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.lit(0.0001) * F.col("__tot"))
        .select("ps_partkey", "value")
    )


def tpch_q12(db) -> DataFrame:
    """Q12 shipping-priority histogram: for 1996 orders whose lineitem
    shipped more than 60 days late, count critical- vs normal-priority
    orders per return flag (standing in for ``l_shipmode`` — the
    conditional-count CASE shape is the point)."""
    j = (
        db.df("lineitem")
        .join(db.df("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1997-01-01"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            )
        )
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_returnflag").agg(
        F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
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


def tpch_q16(db) -> DataFrame:
    """Q16 supplier-count-per-part-attribute: distinct observed
    (part, supplier) pairs, minus suppliers on the "complaints" list
    (NOT IN — here low-balance suppliers, no comment column), rolled
    up to count-distinct suppliers per (brand, type, size) with the
    spec's negated brand/type/size-set predicate."""
    pairs = db.df("lineitem").select("l_partkey", "l_suppkey").distinct()
    complaints = db.df("supplier").filter(
        F.col("s_acctbal") < 1000.0
    ).select("s_suppkey")
    ok = pairs.join(
        F.broadcast(complaints),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    p = db.df("part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49, 50))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        ok.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
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


def tpch_q19(db) -> DataFrame:
    """Q19 disjunctive-band revenue: three (brand, size-band,
    quantity-band) disjuncts over the lineitem-part join. The predicate
    must reach the scans — Catalyst pushes the common ``l_quantity``
    and ``p_size`` envelopes and broadcasts the part side, so the
    disjunction never forces a full-scan cartesian recheck."""
    j = db.df("lineitem").join(
        F.broadcast(
            db.df("part").select("p_partkey", "p_brand", "p_size")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 40)
            & q.between(20, 30)
        )
    )
    return j.filter(band).agg(
        exact_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue")
    )


def tpch_q20(db) -> DataFrame:
    """Q20 dominant-supplier promotion: ASIA suppliers who shipped,
    for some small-named part, MORE than 30% of that part's total 1997
    quantity (the spec's "availqty > half the shipped quantity" nested
    aggregate, re-anchored to observed flow). Per-pair and per-part
    quantity sums are decimal folds; the supplier list is a semi join
    over the qualifying pairs."""
    li = (
        db.df("lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(
            F.broadcast(
                db.df("part")
                .filter(F.col("p_name").startswith("small"))
                .select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
            "leftsemi",
        )
    )
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        exact_sum("l_quantity").alias("__q_ps")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        exact_sum("l_quantity").alias("__q_p")
    )
    dominant = per_pair.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("__pk")
    ).filter(F.col("__q_ps") > F.lit(0.3) * F.col("__q_p"))
    asia = (
        db.df("supplier")
        .join(
            F.broadcast(db.df("nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(db.df("region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    return asia.join(
        F.broadcast(dominant.select("l_suppkey").distinct()),
        F.col("s_suppkey") == F.col("l_suppkey"),
        "leftsemi",
    ).select("s_suppkey", "s_name")


def tpch_q21(db) -> DataFrame:
    """Q21 suppliers who kept orders waiting: late (>80 days
    ship-after-order, the Q4 lateness) lineitems in MULTI-supplier
    orders where NO other supplier was late — the EXISTS + NOT EXISTS
    chain as one semi join and one anti join over the distinct
    (order, supplier) pair frames, counted per supplier (top 100,
    name-tiebroken)."""
    pairs = db.df("lineitem").select("l_orderkey", "l_suppkey").distinct()
    late = (
        db.df("lineitem")
        .join(
            db.df("orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    other = pairs.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    waiting = late.join(
        other,
        (F.col("l_orderkey") == F.col("__ok"))
        & (F.col("l_suppkey") != F.col("__sk")),
        "leftsemi",
    ).join(
        other_late,
        (F.col("l_orderkey") == F.col("__ok"))
        & (F.col("l_suppkey") != F.col("__sk")),
        "left_anti",
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            F.broadcast(db.df("supplier").select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
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
    "tpch_q2": tpch_q2,
    "tpch_q4": tpch_q4,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q9": tpch_q9,
    "tpch_q10": tpch_q10,
    "tpch_q11": tpch_q11,
    "tpch_q12": tpch_q12,
    "tpch_q13": tpch_q13,
    "tpch_q14": tpch_q14,
    "tpch_q15": tpch_q15,
    "tpch_q16": tpch_q16,
    "tpch_q17": tpch_q17,
    "tpch_q19": tpch_q19,
    "tpch_q20": tpch_q20,
    "tpch_q21": tpch_q21,
    "tpch_q22": tpch_q22,
}

_VOL = "l_extendedprice * (1 - l_discount)"

_PS = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost
    FROM lineitem GROUP BY 1, 2
"""

ORACLES = {
    "tpch_q2": f"""
        WITH ps AS ({_PS})
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               ps_supplycost
        FROM part, ps, supplier, nation, region
        WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
          AND p_type = 'LARGE' AND p_size <= 10
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND ps_supplycost = (
            SELECT min(ps2.ps_supplycost)
            FROM ps ps2, supplier s2, nation n2, region r2
            WHERE ps2.ps_partkey = p_partkey
              AND s2.s_suppkey = ps2.ps_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey
              AND r2.r_name = 'EUROPE')
    """,
    "tpch_q9": f"""
        SELECT nation, o_year, {exact_sum_sql('amount')} AS sum_profit
        FROM (
          SELECT n_name AS nation,
                 CAST(year(o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - CAST('0.5' AS DOUBLE) * p_retailprice * l_quantity
                   AS amount
          FROM lineitem
          JOIN part ON l_partkey = p_partkey AND p_name LIKE 'small%'
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        )
        GROUP BY 1, 2
    """,
    "tpch_q11": f"""
        WITH li AS (
          SELECT l_partkey,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(3,0)) AS v
          FROM lineitem
          WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA')
        )
        SELECT l_partkey AS ps_partkey, {exact_sum_sql('v')} AS value
        FROM li GROUP BY 1
        HAVING {exact_sum_sql('v')} >
               CAST('0.0001' AS DOUBLE) * (SELECT {exact_sum_sql('v')} FROM li)
    """,
    "tpch_q12": """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        GROUP BY l_returnflag
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49, 50)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier
            WHERE s_acctbal < CAST('1000' AS DOUBLE))
        GROUP BY 1, 2, 3
    """,
    "tpch_q19": f"""
        SELECT {exact_sum_sql(_VOL)} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 40
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q20": f"""
        WITH li AS (
          SELECT l_partkey, l_suppkey, l_quantity
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        ), per_pair AS (
          SELECT l_partkey, l_suppkey,
                 {exact_sum_sql('l_quantity')} AS q_ps
          FROM li GROUP BY 1, 2
        ), per_part AS (
          SELECT l_partkey, {exact_sum_sql('l_quantity')} AS q_p
          FROM li GROUP BY 1
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND s_suppkey IN (
            SELECT pp.l_suppkey
            FROM per_pair pp JOIN per_part p ON pp.l_partkey = p.l_partkey
            WHERE pp.q_ps > CAST('0.3' AS DOUBLE) * p.q_p)
    """,
    "tpch_q21": """
        WITH late AS (
          SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_shipdate > o_orderdate + INTERVAL 80 DAY
        ), allp AS (
          SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        )
        SELECT s_name, count(*) AS numwait
        FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (
            SELECT 1 FROM allp l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
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
