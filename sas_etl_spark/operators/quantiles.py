"""Exact distributed quantiles from value histograms.

Spark's exact ``percentile`` aggregate BUFFERS every value of a group
in executor memory — at 100 TB a single hot group OOMs the executor,
which is why its docs point to percentile_approx. But when exactness
is contractual (SAS audit parity), the buffering is avoidable: an
exact interpolated percentile only needs order statistics x(k), and
x(k) = the smallest value whose cumulative count reaches k — readable
off the per-(group, value) HISTOGRAM. The histogram aggregation is
map-side combined and fully parallel; the prefix-sum window walks the
distinct-value table (bounded by the value domain, not the row
count); and the few-group window trap (one task sorting N/groups
rows) never appears because no row-level window exists at all.

Memory bound: O(distinct values per group) instead of O(rows per
group). For near-unique value domains (ids, exact sums) distinct ~ n
and the histogram degenerates — there, range-bucket the values first
(sketch-guided) so prefix sums nest two levels; this module covers
the common bounded-domain case.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles_hist(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: Mapping[str, float],
    round_dp: int | None = None,
) -> DataFrame:
    """Exact linear-interpolated percentiles per group (the
    ``percentile`` / ``quantile_cont`` definition: rank r = 1+p*(n-1),
    result = x(k) + f*(x(k+1)-x(k)) with k = floor(r), f = r-k),
    computed from the value histogram — no per-group value buffering,
    no row-level sort.

    ``ps`` maps output column names to fractions. Returns one row per
    group with those columns.

    Plan: one map-side-combined groupBy(group, value) count; one
    prefix-sum window over the DISTINCT-VALUE table; one broadcast of
    the per-group n; one final agg where each x(k) materializes as
    ``min(value where cum >= k)`` — a conditional min, mergeable and
    constant-memory. Interpolation arithmetic happens on the two
    order statistics only.
    """
    # NULLs are excluded up front, matching Spark percentile() and
    # DuckDB quantile_cont: a NULL row must not shift cumulative ranks
    # (the conditional min below would skip its value but count it).
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        group_col, value_col, F.sum("_c").over(w).alias("_cum")
    )
    n_tab = hist.groupBy(group_col).agg(F.sum("_c").alias("_n"))
    joined = cum.join(F.broadcast(n_tab), group_col)

    v, n = F.col(value_col).cast("double"), F.col("_n")
    aggs: list[Column] = []
    for name, p in ps.items():
        r = F.lit(1.0) + F.lit(p) * (n - 1).cast("double")
        k = F.floor(r).cast("long")
        f = r - F.floor(r)
        xk = F.min(F.when(F.col("_cum") >= k, v))
        xk1 = F.min(F.when(F.col("_cum") >= F.least(k + 1, n), v))
        # f is constant within a group (pure function of n); min() is
        # just the aggregate wrapper the grouped projection requires
        out = xk + F.min(f) * (xk1 - xk)
        if round_dp is not None:
            out = F.round(out, round_dp)
        aggs.append(out.alias(name))
    return joined.groupBy(group_col).agg(*aggs)


def order_statistics_bucketed(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    positions: DataFrame,
    n_buckets: int = 64,
    out_col: str = "x",
) -> DataFrame:
    """Exact order statistics x(pos) per group for NEAR-UNIQUE value
    domains — the two-level form of the histogram trick: when
    distinct(value) ~ rows, a per-group prefix sum over the distinct
    table serializes exactly like a row window, so rank TWO levels
    instead:

      1. sketch-guided range buckets: percentile_approx cut points
         split each group's value range into ~n_buckets equal-mass
         buckets (the sketch only PLACES boundaries — exactness never
         depends on it);
      2. per-(group, bucket) counts -> bucket offsets via a prefix sum
         over the n_buckets-row table;
      3. each requested position maps to the single bucket containing
         it (offset < pos <= offset + count), with an in-bucket
         residual rank;
      4. ONLY the needed buckets' rows (a broadcast semi-join filter)
         get a local row_number window partitioned by (group, bucket)
         — parallelism = groups x buckets instead of groups, and the
         sorted row count is (needed buckets) x (rows/bucket), not the
         corpus.

    ``positions`` must have columns (group_col, ``_pos``) — distinct
    1-based global ranks to fetch, already clamped to [1, n]. Rows
    with equal values never straddle a bucket (bucketing is by value),
    and in-bucket order is (value, tiebreak), so bucket offset +
    local rank reproduces the global (value, tiebreak) row_number
    exactly. Returns (group_col, _pos, out_col).
    """
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.groupBy(group_col).agg(
        F.percentile_approx(value_col, fracs, 10_000).alias("_cuts")
    )
    bucketed = df.join(F.broadcast(cuts), group_col).withColumn(
        "_bkt",
        F.aggregate(
            "_cuts",
            F.lit(0),
            lambda acc, c: acc
            + F.when(F.col(value_col) >= c, 1).otherwise(0),
        ),
    )
    bcounts = bucketed.groupBy(group_col, "_bkt").agg(
        F.count(F.lit(1)).alias("_bc")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bcounts.withColumn(
        "_off", F.coalesce(F.sum("_bc").over(w_off), F.lit(0))
    )
    located = positions.join(F.broadcast(offsets), group_col).filter(
        (F.col("_pos") > F.col("_off"))
        & (F.col("_pos") <= F.col("_off") + F.col("_bc"))
    ).select(group_col, "_pos", "_bkt", (F.col("_pos") - F.col("_off")).alias("_local"))
    needed = located.select(group_col, "_bkt").distinct()
    w_local = Window.partitionBy(group_col, "_bkt").orderBy(
        value_col, tiebreak_col
    )
    ranked = (
        bucketed.join(F.broadcast(needed), [group_col, "_bkt"])
        .withColumn("_lrn", F.row_number().over(w_local).cast("long"))
    )
    return (
        ranked.join(F.broadcast(located), [group_col, "_bkt"])
        .filter(F.col("_lrn") == F.col("_local"))
        .select(group_col, "_pos", F.col(value_col).alias(out_col))
    )
