"""Scale-safe exact top-k selection — the threshold-cut plan.

``row_number() OVER (ORDER BY key)`` ranks the whole frame through ONE
reducer: at a 100 TB corpus that is billions of (id, key) rows through
a single partition — the one shape that cannot survive a scale-up no
matter how narrow the rows are. This module replaces the global-rank
window in the selection operators (DSIR top-k / Gumbel resampling,
A-ES weighted sampling) with the classic exact threshold cut, the same
recipe as ``operators/sketch.grouped_quantiles``' hot-group escape:

1. **Locate the k-th key exactly** by iterative histogram refinement:
   min/max/count the key frame, bucket it into ``n_bins`` equal-width
   ranges (pure codegen), collect the ``n_bins`` bucket counts
   (BOUNDED driver state), walk from the best side to find the bucket
   holding the k-th value, recurse into that bucket. Each round
   shrinks the candidate set by ~``n_bins``×; when it fits under
   ``collect_cap`` the remaining (value, count) pairs are collected
   and walked exactly. 2–3 rounds cover a trillion rows.
2. **Cut with a codegen filter**: rows strictly better than the k-th
   key ``v*`` are kept outright; the tie set at exactly ``v*`` is
   resolved by the unique ``id`` tie-breaker — collected when small,
   or located by the SAME integer histogram refinement when the tie
   set is huge and the id is integral (the realistic adversary: a
   boundary that falls inside a mass of identically-scored documents,
   e.g. score 0.0 for empty texts). A non-integral id with a tie set
   past ``collect_cap`` raises loudly rather than degrade.

The RETURNED plan is ``df.filter(<literals>)`` — zero windows, zero
added exchanges, zero single-partition stages (plan-pinned in
``tests/test_plans.py``). The probe work (aggregates + histograms)
runs as separate bounded-state jobs over a lineage-cut narrow
``(id, key)`` projection, never over the payload.

Exactness: the kept row SET is identical to the window form —
``ORDER BY key DESC|ASC, id ASC LIMIT k`` — for any frame with unique
ids and non-NULL keys (both preconditions hold at every call site:
keys are decimal-fold scores or hash-derived doubles, ids are
document/row keys). Pytest pins set-equality against the retained
window path at two SFs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpoint import cut_lineage

N_BINS = 2048
COLLECT_CAP = 1 << 17


def kth_boundary(
    keys: DataFrame,
    col: str,
    k: int,
    descending: bool = True,
    n_bins: int = N_BINS,
    collect_cap: int = COLLECT_CAP,
) -> tuple:
    """Exact k-th value of ``keys[col]`` (double, non-NULL) under
    DESC/ASC order, by histogram refinement. Returns
    ``(v_star, n_better, n_equal)``: the k-th value, the count of rows
    STRICTLY better than it, and the count of rows equal to it.
    Driver state per round: ``n_bins`` counts; final round ≤
    ``collect_cap`` distinct (value, count) pairs. Requires
    ``1 ≤ k ≤ count``."""
    pred = F.lit(True)
    n_better = 0
    kk = k
    while True:
        cur = keys.where(pred)
        lo, hi, cnt = cur.agg(
            F.min(col), F.max(col), F.count(F.lit(1))
        ).first()
        if cnt == 0 or kk < 1 or kk > cnt:
            raise ValueError(
                f"kth_boundary: k={k} out of range (remaining {cnt})"
            )
        if lo == hi:
            return lo, n_better, cnt
        width = (float(hi) - float(lo)) / n_bins
        if cnt <= collect_cap or not (width > 0.0 and math.isfinite(width)):
            # small enough to walk exactly — or the denormal-width
            # corner where equal-width bucketing cannot make progress
            if cnt > collect_cap * 16:
                raise RuntimeError(
                    "kth_boundary: key interval too narrow to bucket "
                    f"({lo!r}..{hi!r}) with {cnt} rows — keys are "
                    "denormal-adjacent; rescale the key"
                )
            rows = cur.groupBy(col).agg(F.count(F.lit(1)).alias("c")).collect()
            rows.sort(key=lambda r: r[0], reverse=descending)
            cum = 0
            for r in rows:
                if cum + r["c"] >= kk:
                    return r[0], n_better + cum, r["c"]
                cum += r["c"]
            raise AssertionError("kth_boundary: walk exhausted")  # unreachable
        bexpr = F.least(
            F.greatest(
                F.floor((F.col(col) - F.lit(float(lo))) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        ).cast("int")
        hist = {
            r["__b"]: r["c"]
            for r in cur.groupBy(bexpr.alias("__b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        order = range(n_bins - 1, -1, -1) if descending else range(n_bins)
        cum = 0
        hit = None
        for b in order:
            c = hist.get(b, 0)
            if cum + c >= kk:
                hit = b
                break
            cum += c
        n_better += cum
        kk -= cum
        pred = pred & (bexpr == F.lit(hit))


def kth_boundary_int(
    keys: DataFrame,
    col: str,
    k: int,
    n_bins: int = N_BINS,
    collect_cap: int = COLLECT_CAP,
) -> object:
    """ASC k-th value of an integral UNIQUE-valued column — the id
    tie-breaker path. Integer bucket arithmetic (``div``, exact past
    2^53 where double division would collide). Returns the value."""
    pred = F.lit(True)
    kk = k
    while True:
        cur = keys.where(pred)
        lo, hi, cnt = cur.agg(
            F.min(col), F.max(col), F.count(F.lit(1))
        ).first()
        if cnt == 0 or kk < 1 or kk > cnt:
            raise ValueError(
                f"kth_boundary_int: k={k} out of range (remaining {cnt})"
            )
        if lo == hi:
            return lo
        if cnt <= collect_cap:
            vals = sorted(r[0] for r in cur.select(col).collect())
            return vals[kk - 1]
        width = (int(hi) - int(lo)) // n_bins + 1
        bexpr = F.expr(f"(`{col}` - {int(lo)}) div {width}").cast("int")
        hist = {
            r["__b"]: r["c"]
            for r in cur.groupBy(bexpr.alias("__b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        cum = 0
        hit = None
        for b in sorted(hist):
            c = hist[b]
            if cum + c >= kk:
                hit = b
                break
            cum += c
        kk -= cum
        pred = pred & (bexpr == F.lit(hit))


_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def topk_threshold_cut(
    df: DataFrame,
    key_col: str,
    k: int | None,
    id_col: str,
    descending: bool = True,
    n_bins: int = N_BINS,
    collect_cap: int = COLLECT_CAP,
    fraction: float | None = None,
) -> DataFrame:
    """Exactly the rows ``ORDER BY key DESC|ASC, id ASC LIMIT k``
    would keep, as a pure codegen filter over ``df`` — no global sort,
    no window, no single-partition exchange in the returned plan.
    Preconditions: ``id_col`` unique; rows with a NULL key are OUTSIDE
    the contract (excluded up front — a SQL rank would order them
    last, so the kept sets agree whenever ``k`` ≤ the non-NULL count,
    and "top-k among scored rows" is the only sensible reading of a
    NULL score). ``fraction`` (exclusive with ``k``) selects
    ``k = ⌈fraction · n⌉`` from the SAME count the cut already takes —
    the keep-a-percentage form curation funnels actually use."""
    if (k is None) == (fraction is None):
        raise ValueError("topk_threshold_cut: pass exactly one of k/fraction")
    nn = df.where(F.col(key_col).isNotNull())
    if k is not None and k <= 0:
        return df.limit(0)
    keys = cut_lineage(nn.select(id_col, key_col), eager=True)
    total = keys.count()
    if fraction is not None:
        if not 0.0 < fraction:
            return df.limit(0)
        k = min(total, max(1, math.ceil(total * fraction)))
    df = nn
    if total <= k:
        return df
    v_star, n_better, n_eq = kth_boundary(
        keys, key_col, k, descending, n_bins, collect_cap
    )
    need = k - n_better
    kc = F.col(key_col)
    better = (kc > F.lit(v_star)) if descending else (kc < F.lit(v_star))
    if need >= n_eq:
        return df.where(better | (kc == F.lit(v_star)))
    tied = keys.where(F.col(key_col) == F.lit(v_star))
    if n_eq <= collect_cap:
        ids = sorted(r[0] for r in tied.select(id_col).collect())
        i_star = ids[need - 1]
    elif dict(df.dtypes)[id_col] in _INTEGRAL:
        i_star = kth_boundary_int(tied, id_col, need, n_bins, collect_cap)
    else:
        raise RuntimeError(
            f"topk_threshold_cut: {n_eq} rows tie at key={v_star!r} and "
            f"id column {id_col!r} is non-integral — cannot refine the "
            "tie set without collecting past collect_cap"
        )
    return df.where(
        better | ((kc == F.lit(v_star)) & (F.col(id_col) <= F.lit(i_star)))
    )


def budget_threshold_cut(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget,
    id_col: str,
    descending: bool = True,
    n_bins: int = N_BINS,
    collect_cap: int = COLLECT_CAP,
) -> DataFrame:
    """Budgeted selection — exactly the rows the greedy prefix of
    ``ORDER BY key DESC|ASC, id ASC`` keeps while its CUMULATIVE
    ``weight_col`` stays ≤ ``budget``, as a pure codegen filter. This
    is the curation primitive top-k cannot express: "take the
    best-scoring documents up to a TOKEN budget" selects by document
    quality but pays in tokens, so the boundary lives at a cumulative
    weight, not a row count.

    Same physical contract as :func:`topk_threshold_cut`: histogram
    refinement locates the boundary key with BOUNDED driver state
    (per round: ``n_bins`` weight sums + row counts; final round ≤
    ``collect_cap`` rows of the boundary bucket), and the returned
    plan is ``df.filter(<literals>)`` — zero windows, zero added
    exchanges. Exactness: weights fold as decimal(30,9) (the exact_agg
    discipline — a float cumsum's boundary would depend on
    accumulation order) and the final boundary walk runs driver-side
    over exact decimals, so the kept SET is identical to the window
    cumsum form ``sum(w) OVER (ORDER BY key …, id ROWS UNBOUNDED
    PRECEDING) ≤ budget`` for any frame with unique ids.

    Contract: NULL keys are outside (excluded up front, like the
    top-k form); a NULL or negative weight RAISES (a budget over
    undefined costs is a silent mis-selection — zero weights are fine,
    they ride along free). ``budget`` ≤ 0 returns the empty frame.
    A single tied-key mass past ``collect_cap × 16`` raises loudly
    (unlike the top-k cut there is no id-refinement shortcut here: the
    budget boundary needs the tie set's weights in id order, not just
    an id count)."""
    from decimal import Decimal

    nn = df.where(F.col(key_col).isNotNull())
    budget = Decimal(str(budget))
    if budget <= 0:
        return df.limit(0)
    keys = cut_lineage(
        nn.select(
            id_col,
            key_col,
            F.col(weight_col).cast("decimal(30,9)").alias("__w"),
        ),
        eager=True,
    )
    stats = keys.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("__w").isNull() | (F.col("__w") < 0), 1)).alias(
            "bad"
        ),
        F.sum("__w").alias("tot"),
    ).first()
    if stats["bad"]:
        raise ValueError(
            f"budget_threshold_cut: {stats['bad']} rows have a NULL or "
            f"negative {weight_col} — budget semantics undefined"
        )
    if stats["n"] == 0:
        return nn
    if stats["tot"] is not None and Decimal(stats["tot"]) <= budget:
        return nn
    kc = F.col(key_col)
    spent = Decimal(0)
    cur = keys
    while True:
        lo, hi, cnt = cur.agg(
            F.min(key_col), F.max(key_col), F.count(F.lit(1))
        ).first()
        if lo == hi or cnt <= collect_cap:
            # boundary bucket (or a single tied key mass): exact walk
            # over ≤ collect_cap rows — every equal key shares a
            # bucket, so the tie set is fully inside
            if cnt > collect_cap * 16:
                raise RuntimeError(
                    "budget_threshold_cut: boundary bucket holds "
                    f"{cnt} rows past collect_cap — keys are too "
                    "tie-heavy to refine; rescale the key"
                )
            rows = cur.select(key_col, id_col, "__w").collect()
            # order by (key DESC|ASC, id ASC) — two stable sorts
            rows.sort(key=lambda r: r[1])
            rows.sort(key=lambda r: r[0], reverse=descending)
            acc = spent
            v_star, i_star, kept_any = None, None, False
            for r in rows:
                acc += Decimal(r[2])
                if acc > budget:
                    break
                v_star, i_star, kept_any = r[0], r[1], True
            if not kept_any:
                # nothing in the boundary bucket fits — the kept set
                # is exactly the strictly-better rows whose weight the
                # earlier refinement rounds already accounted (empty
                # at the top level, where no row fits at all)
                return nn.where(_outside_pred(kc, lo, hi, descending))
            better = (kc > F.lit(v_star)) if descending else (kc < F.lit(v_star))
            inside = better | (
                (kc == F.lit(v_star)) & (F.col(id_col) <= F.lit(i_star))
            )
            return nn.where(_outside_pred(kc, lo, hi, descending) | inside)
        width = (float(hi) - float(lo)) / n_bins
        if not (width > 0.0 and math.isfinite(width)):
            raise RuntimeError(
                f"budget_threshold_cut: key interval too narrow to "
                f"bucket ({lo!r}..{hi!r}) with {cnt} rows"
            )
        bexpr = F.least(
            F.greatest(
                F.floor((kc - F.lit(float(lo))) / F.lit(width)), F.lit(0)
            ),
            F.lit(n_bins - 1),
        ).cast("int")
        hist = {
            r["__b"]: (r["c"], Decimal(r["w"] or 0))
            for r in cur.groupBy(bexpr.alias("__b"))
            .agg(F.count(F.lit(1)).alias("c"), F.sum("__w").alias("w"))
            .collect()
        }
        order = range(n_bins - 1, -1, -1) if descending else range(n_bins)
        hit = None
        for b in order:
            c, w = hist.get(b, (0, Decimal(0)))
            if spent + w > budget:
                hit = b
                break
            spent += w
        if hit is None:  # numeric edge: everything fits after all
            return nn
        cur = cur.where(bexpr == F.lit(hit))


def _outside_pred(kc, lo, hi, descending: bool):
    """Rows STRICTLY better than the boundary bucket's key range —
    they were accounted into ``spent`` by earlier refinement rounds
    and are kept wholesale."""
    return (kc > F.lit(hi)) if descending else (kc < F.lit(lo))
