"""PROC TRANSPOSE + PROC CORR/UNIVARIATE families (SAS ETL staples
beyond the §2.4 summary stats): wide<->long reshaping and second-
moment statistics, oracle-paired."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query


@query(
    "q_unpivot",
    oracle="""
    select l_orderkey, l_linenumber, 'quantity' as measure, l_quantity as val
    from lineitem
    union all
    select l_orderkey, l_linenumber, 'price', l_extendedprice from lineitem
    union all
    select l_orderkey, l_linenumber, 'discount', l_discount from lineitem
    """,
    tags=("transpose",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long (SAS: PROC TRANSPOSE BY order line). The stack()
    table-generating expression multiplies rows JVM-side in one pass —
    no union of N scans (the oracle's formulation) and no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, "
            "'discount', l_discount) as (measure, val)"
        ),
    )


@query(
    "q_pivot_api",
    oracle="""
    select o_orderpriority,
           cast(sum(case when o_orderstatus = 'F' then 1 else 0 end) as bigint) as F,
           cast(sum(case when o_orderstatus = 'O' then 1 else 0 end) as bigint) as O,
           cast(sum(case when o_orderstatus = 'P' then 1 else 0 end) as bigint) as P
    from orders
    group by o_orderpriority
    """,
    tags=("transpose",),
)
def q_pivot_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide via the pivot API (SAS: PROC TRANSPOSE / PROC FREQ
    crosstab). Pivot values passed explicitly, so Spark skips the
    distinct-values pre-job — one aggregation pass (the 100 TB form).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@query(
    "q_corr_stats",
    oracle="""
    select l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)        as qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 2)  as qty_price_cov,
           round(stddev_samp(l_quantity), 6)                  as qty_std,
           round(var_samp(l_extendedprice), 2)                as price_var
    from lineitem
    group by l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics (SAS: PROC CORR / PROC MEANS STD VAR).
    Pearson correlation, sample covariance/stddev/variance per group —
    single-pass mergeable aggregates (co-moment formulas), so they
    scale exactly like sum/count."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("qty_price_cov"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_std"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("price_var"),
    )


@query(
    "q_univariate_moments",
    oracle="""
    with m as (
      select l_returnflag as g, avg(l_quantity) as mu from lineitem group by 1
    )
    select l_returnflag,
      cast(count(*) as bigint) as n,
      round(avg(l_quantity), 6) as qty_mean,
      round(avg(pow(l_quantity - mu, 3))
            / pow(avg(pow(l_quantity - mu, 2)), 1.5), 6) as qty_skew,
      round(avg(pow(l_quantity - mu, 4))
            / pow(avg(pow(l_quantity - mu, 2)), 2) - 3, 6) as qty_kurt
    from lineitem join m on l_returnflag = m.g
    group by l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_univariate_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment statistics (SAS: PROC UNIVARIATE — skewness,
    kurtosis). Spark's skewness/kurtosis are population moments
    (m3/m2^1.5, m4/m2^2-3) computed in one mergeable streaming pass;
    DuckDB's built-ins apply sample bias corrections, so the oracle
    spells out the same population formulas two-pass. Rounded to 6dp:
    the single-pass and two-pass paths agree to ~1e-12 relative."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("l_quantity"), 6).alias("qty_mean"),
        F.round(F.skewness("l_quantity"), 6).alias("qty_skew"),
        F.round(F.kurtosis("l_quantity"), 6).alias("qty_kurt"),
    )


@query(
    "q_freq_chisq",
    oracle="""
    with c as (
        select o_orderstatus as s, o_orderpriority as p,
               cast(count(*) as double) as o
        from orders group by s, p
    ),
    r as (select s, sum(o) as rt from c group by s),
    k as (select p, sum(o) as ct from c group by p),
    g as (select sum(o) as gt from c)
    select round(sum(pow(o - rt*ct/gt, 2) / (rt*ct/gt)), 6) as chi2,
           cast((count(distinct s) - 1) * (count(distinct p) - 1) as bigint)
               as dof
    from c join r using (s) join k using (p) cross join g
    """,
    tags=("stats",),
)
def q_freq_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROC FREQ TABLES status*priority / CHISQ: Pearson chi-square
    test of independence over the contingency table. One groupBy
    builds the observed cells; row/column/grand totals come from
    re-aggregating those few cells (cardinality = |status|x|priority|,
    small by construction at any data scale) and broadcast back — so
    the only pass over the fact table is the first count, and the
    test statistic itself costs nothing more at 100 TB than at sf0.01.
    """
    orders = load_table(spark, sf_dir, "orders")
    c = (
        orders.groupBy(
            F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    r = c.groupBy("s").agg(F.sum("o").alias("rt"))
    k = c.groupBy("p").agg(F.sum("o").alias("ct"))
    g = c.agg(F.sum("o").alias("gt"))
    e = F.col("rt") * F.col("ct") / F.col("gt")
    return (
        c.join(F.broadcast(r), "s")
        .join(F.broadcast(k), "p")
        .crossJoin(F.broadcast(g))
        .agg(
            F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
            (
                (F.countDistinct("s") - 1) * (F.countDistinct("p") - 1)
            ).alias("dof"),
        )
    )


@query(
    "q_crosstab_pct",
    oracle="""
    with ct as (
        select o_orderstatus, o_orderpriority,
               cast(count(*) as bigint) as n
        from orders
        group by o_orderstatus, o_orderpriority
    ), tot as (select cast(sum(n) as double) as t from ct)
    select o_orderstatus, o_orderpriority, n,
           round(n / cast(sum(n) over (partition by o_orderstatus)
                          as double), 6) as pct_row,
           round(n / cast(sum(n) over (partition by o_orderpriority)
                          as double), 6) as pct_col,
           round(n / t, 6) as pct_all
    from ct cross join tot
    """,
    tags=("transpose", "agg"),
)
def q_crosstab_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way crosstab with row/column/grand-total percentages (SAS:
    PROC FREQ TABLES status*priority — the PERCENT/ROWPCT/COLPCT
    cells; PROC TABULATE PCTN). The detail table is reduced ONCE by a
    keyed agg; every percentage then lives on the crosstab itself:
    row/col shares are windows PARTITIONED by the margin dimension
    (bounded partitions — the crosstab has |status| x |priority|
    cells), and the grand total is a 1-row constant-state aggregate
    broadcast back over the cells. No window or join ever touches
    detail rows — at 100 TB the percentage stages cost O(cells), not
    O(orders)."""
    orders = load_table(spark, sf_dir, "orders")
    ct = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = ct.agg(F.sum("n").cast("double").alias("t"))
    w_row = Window.partitionBy("o_orderstatus")
    w_col = Window.partitionBy("o_orderpriority")
    return ct.crossJoin(F.broadcast(tot)).select(
        "o_orderstatus",
        "o_orderpriority",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_row).cast("double"), 6).alias("pct_row"),
        F.round(F.col("n") / F.sum("n").over(w_col).cast("double"), 6).alias("pct_col"),
        F.round(F.col("n") / F.col("t"), 6).alias("pct_all"),
    )


@query(
    "q_pivot_multi",
    oracle="""
    select o_orderpriority,
           cast(sum(case when o_orderstatus = 'F' then 1 else 0 end)
                as bigint) as F_n,
           round(coalesce(sum(case when o_orderstatus = 'F'
                                   then o_totalprice end), 0), 2) as F_total,
           cast(sum(case when o_orderstatus = 'O' then 1 else 0 end)
                as bigint) as O_n,
           round(coalesce(sum(case when o_orderstatus = 'O'
                                   then o_totalprice end), 0), 2) as O_total,
           cast(sum(case when o_orderstatus = 'P' then 1 else 0 end)
                as bigint) as P_n,
           round(coalesce(sum(case when o_orderstatus = 'P'
                                   then o_totalprice end), 0), 2) as P_total
    from orders
    group by o_orderpriority
    """,
    tags=("transpose", "agg"),
)
def q_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-statistic pivot (SAS: PROC TRANSPOSE with several VAR
    statements / PROC TABULATE status*(N SUM)): one pivot producing
    BOTH a count and a sum per pivoted value — Spark names the columns
    <value>_<aggAlias>, and explicit pivot values keep it a single
    aggregation pass with map-side partials (no distinct-values
    pre-job). The oracle is the equivalent conditional-aggregation
    spelling; both engines fill empty cells with 0."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total"),
        )
        .na.fill(0)
    )
    return out.select(
        "o_orderpriority",
        *[c for v in ("F", "O", "P") for c in (f"{v}_n", f"{v}_total")],
    )


@query(
    "q_linear_regression",
    oracle="""
    with s as (
        select l_returnflag,
               cast(count(*) as double) as n,
               sum(l_quantity) as sx,
               sum(l_extendedprice) as sy,
               sum(l_quantity * l_quantity) as sxx,
               sum(l_extendedprice * l_extendedprice) as syy,
               sum(l_quantity * l_extendedprice) as sxy
        from lineitem
        group by l_returnflag
    )
    select l_returnflag,
           cast(n as bigint) as n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) as slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n,
                 2) as intercept,
           round(pow(n * sxy - sx * sy, 2)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) as r2
    from s
    """,
    tags=("stats", "agg"),
)
def q_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped simple linear regression (SAS: PROC REG BY group — the
    score-and-trend stage countless SAS ETL jobs end with):
    extendedprice ~ quantity per returnflag, closed-form OLS from the
    five co-moment sums — n, Σx, Σy, Σxx, Σyy, Σxy — which are all
    mergeable partial aggregates, so the fit costs exactly one
    grouped scan at any data size (the same one-pass shape as
    PROC MEANS; no iterative solver for the 1-regressor case).
    Slope/intercept/R² computed from the sums with the IDENTICAL
    textbook formulas on both engines; rounding absorbs the ~2-3
    digits the n*Sxx - Sx² cancellation costs at this scale."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.round(slope, 4).alias("slope"),
        F.round((sy - slope * sx) / n, 2).alias("intercept"),
        F.round(
            F.pow(n * sxy - sx * sy, F.lit(2))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# -- Cramér's V -------------------------------------------------------


@query(
    "q_cramers_v",
    oracle="""
    with cells as (
        select o_orderstatus as r, o_orderpriority as c,
               cast(count(*) as double) as obs
        from orders group by o_orderstatus, o_orderpriority
    ),
    rm as (select r, sum(obs) as rtot from cells group by r),
    cm as (select c, sum(obs) as ctot from cells group by c),
    n as (select sum(obs) as total,
                 cast(count(distinct r) as bigint) as nr,
                 cast(count(distinct c) as bigint) as nc
          from cells),
    chi as (
        select sum((cells.obs - rm.rtot * cm.ctot / n.total)
                   * (cells.obs - rm.rtot * cm.ctot / n.total)
                   / (rm.rtot * cm.ctot / n.total)) as chi2
        from cells
        join rm on rm.r = cells.r
        join cm on cm.c = cells.c
        cross join n
    )
    select round(chi.chi2, 4) as chi2,
           cast((n.nr - 1) * (n.nc - 1) as bigint) as dof,
           round(sqrt(chi.chi2 / (n.total
                 * least(n.nr - 1, n.nc - 1))), 6) as cramers_v
    from chi cross join n
    """,
    tags=("stats", "agg"),
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V effect size for a two-way contingency table (SAS:
    PROC FREQ CHISQ prints V alongside chi-square) — the
    normalized-association companion to q_freq_chisq: chi-square says
    WHETHER status and priority are associated, V says HOW MUCH
    (0..1, comparable across table sizes).

    V = sqrt(chi2 / (n * min(r-1, c-1))), chi-square from the reduced
    cell table with margin-product expected counts. Everything
    computes on the O(r*c) cell table; 4dp/6dp rounding covers the
    cell-summation order drift.

    Scale: one conditional agg to cells (map-side combined), margins
    and totals as broadcast joins over the tiny cell table — the
    detail scan is touched exactly once.
    """
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderstatus").alias("r"),
        F.col("o_orderpriority").alias("c"),
    ).agg(F.count(F.lit(1)).cast("double").alias("obs"))
    rm = cells.groupBy("r").agg(F.sum("obs").alias("rtot"))
    cm = cells.groupBy("c").agg(F.sum("obs").alias("ctot"))
    n = cells.agg(
        F.sum("obs").alias("total"),
        F.countDistinct("r").alias("nr"),
        F.countDistinct("c").alias("nc"),
    )
    exp = F.col("rtot") * F.col("ctot") / F.col("total")
    chi = (
        cells.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum((F.col("obs") - exp) * (F.col("obs") - exp) / exp).alias(
                "chi2"
            )
        )
    )
    return chi.crossJoin(F.broadcast(n)).select(
        F.round("chi2", 4).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("total") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )
