"""Hypothesis-test queries — the PROC TTEST / PROC NPAR1WAY /
PROC ANOVA family (round 15).

SAS surface covered here:
- PROC TTEST (CLASS two-sample, Welch/Satterthwaite unequal-variance
  form) -> q_ttest_welch,
- PROC NPAR1WAY WILCOXON (two-sample rank-sum, normal approximation
  with tie correction) -> q_mannwhitney,
- PROC ANOVA / PROC GLM one-way F -> q_anova_oneway.

Cross-engine float parity (registry.py rules): every statistic is a
fixed arithmetic expression over EXACT integer aggregates — cents
(round(price*100) per row, exact: the fixture prices carry two
decimals), integer quantities, and counts — summed as bigint /
decimal(38,0) (hugeint in DuckDB). The float expressions are written
with identical operand order on both sides, so the doubles agree
bit-for-bit before the final 6dp round; no float ever enters a fold
whose order the engines could disagree on. Group-combining steps use
EXPLICIT per-class terms (conditional aggregation into named columns,
then a textual sum), never a second-level float aggregation.

Scale notes inline per query; nothing here uses Python in the data
path, collect(), or a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query

# -- Welch two-sample t-test ------------------------------------------

_TT_A, _TT_B = "BUILDING", "AUTOMOBILE"


@query(
    "q_ttest_welch",
    oracle=f"""
    with base as (
        select o.o_orderpriority, c.c_mktsegment,
               cast(round(o.o_totalprice * 100) as bigint) as cents
        from orders o join customer c on o.o_custkey = c.c_custkey
        where c.c_mktsegment in ('{_TT_A}', '{_TT_B}')
    ),
    g as (
        select o_orderpriority,
               cast(count(*) filter (c_mktsegment = '{_TT_A}') as bigint) as n1,
               cast(count(*) filter (c_mktsegment = '{_TT_B}') as bigint) as n2,
               cast(sum(cents) filter (c_mktsegment = '{_TT_A}')
                    as double) as s1,
               cast(sum(cents) filter (c_mktsegment = '{_TT_B}')
                    as double) as s2,
               cast(sum(cents * cents) filter (c_mktsegment = '{_TT_A}')
                    as double) as q1,
               cast(sum(cents * cents) filter (c_mktsegment = '{_TT_B}')
                    as double) as q2
        from base group by o_orderpriority
    )
    select o_orderpriority, n1, n2,
           round(s1 / n1 / 100.0, 6) as mean1,
           round(s2 / n2 / 100.0, 6) as mean2,
           round((s1 / n1 - s2 / n2)
                 / sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                        + (q2 - s2 * s2 / n2) / (n2 - 1) / n2), 6) as t_stat,
           round(((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                  + (q2 - s2 * s2 / n2) / (n2 - 1) / n2)
                 * ((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                    + (q2 - s2 * s2 / n2) / (n2 - 1) / n2)
                 / ((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                    * ((q1 - s1 * s1 / n1) / (n1 - 1) / n1) / (n1 - 1)
                    + (q2 - s2 * s2 / n2) / (n2 - 1) / n2
                      * ((q2 - s2 * s2 / n2) / (n2 - 1) / n2) / (n2 - 1)),
                 6) as df_welch
    from g order by o_orderpriority
    """,
    tags=("agg", "stats"),
)
def q_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-test per group (SAS: PROC TTEST with CLASS
    c_mktsegment, BY o_orderpriority; the Satterthwaite
    unequal-variance solution PROC TTEST prints alongside pooled):
    does mean order value differ between the BUILDING and AUTOMOBILE
    segments, within each order priority? Emits per-class counts and
    means, the t statistic, and the Welch-Satterthwaite degrees of
    freedom.

    Parity: prices quantize to exact cents per row; per-class sums
    and sums-of-squares accumulate as exact integers via CONDITIONAL
    aggregation into named columns (one map-side-combined pass, no
    pivot shuffle); t and df are one fixed double expression over
    those integers, written operand-for-operand identically in the
    oracle. t is scale-invariant, so it is computed in cents; means
    divide once more by 100 for dollars.

    Scale: a single groupBy over the orders-customer equi-join —
    map-side partial aggregation reduces each partition to
    |priorities| rows of six numbers before the exchange; cents^2
    sums ride decimal(38,0) (hugeint in DuckDB), overflow-free past
    sf100. The join broadcasts customer when small; at 100 TB it is
    an ordinary hash join on the shared key."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("c_mktsegment").isin(_TT_A, _TT_B))
        .select(
            "o_orderpriority",
            "c_mktsegment",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )

    def _cls(col, seg):
        return F.when(F.col("c_mktsegment") == seg, col)

    g = base.groupBy("o_orderpriority").agg(
        F.count(_cls(F.lit(1), _TT_A)).alias("n1"),
        F.count(_cls(F.lit(1), _TT_B)).alias("n2"),
        F.sum(_cls(F.col("cents"), _TT_A)).cast("double").alias("s1"),
        F.sum(_cls(F.col("cents"), _TT_B)).cast("double").alias("s2"),
        F.sum(_cls((F.col("cents") * F.col("cents")).cast("decimal(38,0)"), _TT_A))
        .cast("double")
        .alias("q1"),
        F.sum(_cls((F.col("cents") * F.col("cents")).cast("decimal(38,0)"), _TT_B))
        .cast("double")
        .alias("q2"),
    )
    se1 = "(q1 - s1 * s1 / n1) / (n1 - 1) / n1"
    se2 = "(q2 - s2 * s2 / n2) / (n2 - 1) / n2"
    return g.select(
        "o_orderpriority",
        "n1",
        "n2",
        F.round(F.expr("s1 / n1 / 100.0"), 6).alias("mean1"),
        F.round(F.expr("s2 / n2 / 100.0"), 6).alias("mean2"),
        F.round(
            F.expr(f"(s1 / n1 - s2 / n2) / sqrt({se1} + {se2})"), 6
        ).alias("t_stat"),
        F.round(
            F.expr(
                f"({se1} + {se2}) * ({se1} + {se2})"
                f" / ({se1} * ({se1}) / (n1 - 1)"
                f" + {se2} * ({se2}) / (n2 - 1))"
            ),
            6,
        ).alias("df_welch"),
    ).orderBy("o_orderpriority")


# -- Mann-Whitney / Wilcoxon rank-sum ---------------------------------


@query(
    "q_mannwhitney",
    oracle="""
    with hist as (
        select l_returnflag, cast(l_quantity as bigint) as q,
               cast(count(*) filter (l_linestatus = 'O') as bigint) as c1,
               cast(count(*) filter (l_linestatus = 'F') as bigint) as c2,
               cast(count(*) as bigint) as t
        from lineitem group by l_returnflag, cast(l_quantity as bigint)
    ),
    ranked as (
        select *,
               coalesce(sum(t) over (partition by l_returnflag order by q
                                     rows between unbounded preceding
                                     and 1 preceding), 0) as below
        from hist
    ),
    g as (
        select l_returnflag,
               cast(sum(c1) as bigint) as n1,
               cast(sum(c2) as bigint) as n2,
               cast(sum(cast(c1 as hugeint) * (2 * below + t + 1))
                    as double) / 2.0 as w1,
               cast(sum(cast(t as hugeint) * t * t - t) as double) as ties
        from ranked group by l_returnflag
    )
    select l_returnflag, n1, n2,
           round(w1 - cast(n1 as double) * (n1 + 1) / 2.0, 1) as u1,
           round((w1 - n1 * (cast(n1 as double) + n2 + 1) / 2.0)
                 / sqrt(cast(n1 as double) * n2 / 12.0
                        * ((n1 + n2 + 1)
                           - ties / (cast(n1 + n2 as double)
                                     * (n1 + n2 - 1)))), 6) as z_stat
    from g order by l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum per group (SAS: PROC
    NPAR1WAY WILCOXON with CLASS l_linestatus, BY l_returnflag): does
    the quantity distribution differ between open ('O') and finished
    ('F') line items? Emits class sizes, the U statistic for class
    'O', and the tie-corrected normal-approximation z (no continuity
    correction — the documented definition here).

    Rank computation is the q_spearman histogram idiom: average ranks
    come from the per-(group, value) histogram via the identity
    avg_rank = rows_below + (ties + 1)/2, so the only window runs
    over DISTINCT quantities (50 per group at any SF), never rows.
    The rank-sum W1 = sum(c1 * (2*below + t + 1)) / 2 accumulates as
    an exact integer (the doubled form avoids halves) in
    decimal(38,0) / hugeint — round-16 advice: the doubled sum is
    ~2*n1*N, which would wrap int64 silently (Spark non-ANSI) near
    sf~1000 — and the tie term sum(t^3 - t) rides the same widening
    since t^3 overflows int64 once a (group, value) bucket passes
    ~2M rows. u1's n1*(n1+1) product is likewise evaluated in double
    on both engines.
    z is one fixed double expression over exact integers, identical
    operand order both sides.

    Scale: one map-side-combined histogram groupBy (|groups| x 50
    result rows), a 150-row window, a 150-row final agg — the plan's
    only row-scale work is the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    ).agg(
        F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("c1"),
        F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("c2"),
        F.count(F.lit(1)).alias("t"),
    )
    below_w = (
        Window.partitionBy("l_returnflag")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = hist.withColumn(
        "below", F.coalesce(F.sum("t").over(below_w), F.lit(0))
    )
    g = ranked.groupBy("l_returnflag").agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        (
            F.sum(
                F.col("c1").cast("decimal(38,0)")
                * (2 * F.col("below") + F.col("t") + 1)
            ).cast("double")
            / 2.0
        ).alias("w1"),
        F.sum(
            (
                F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
                - F.col("t")
            )
        )
        .cast("double")
        .alias("ties"),
    )
    return g.select(
        "l_returnflag",
        "n1",
        "n2",
        F.round(F.expr("w1 - cast(n1 as double) * (n1 + 1) / 2.0"), 1).alias(
            "u1"
        ),
        F.round(
            F.expr(
                "(w1 - n1 * (cast(n1 as double) + n2 + 1) / 2.0)"
                " / sqrt(cast(n1 as double) * n2 / 12.0"
                " * ((n1 + n2 + 1)"
                " - ties / (cast(n1 + n2 as double) * (n1 + n2 - 1))))"
            ),
            6,
        ).alias("z_stat"),
    ).orderBy("l_returnflag")


# -- Kruskal-Wallis ---------------------------------------------------

_KW_CLASSES = ("A", "N", "R")


def _kw_terms() -> tuple[str, str]:
    """Fixed-order textual sums over the per-class named columns (the
    same float-fold-divergence answer as _anova_terms)."""
    n = " + ".join(f"n{i}" for i in range(len(_KW_CLASSES)))
    r2_over_n = " + ".join(f"r{i} * r{i} / n{i}" for i in range(len(_KW_CLASSES)))
    return n, r2_over_n


@query(
    "q_kruskal_wallis",
    oracle=f"""
    with hist as (
        select cast(l_quantity as bigint) as q,
               {", ".join(
                   f"cast(count(*) filter (l_returnflag = '{c}') as bigint)"
                   f" as c{i}"
                   for i, c in enumerate(_KW_CLASSES)
               )},
               cast(count(*) as bigint) as t
        from lineitem group by cast(l_quantity as bigint)
    ),
    ranked as (
        select *,
               coalesce(sum(t) over (order by q
                                     rows between unbounded preceding
                                     and 1 preceding), 0) as below
        from hist
    ),
    g as (
        select
        {", ".join(
            f"cast(sum(c{i}) as double) as n{i}, "
            f"cast(sum(cast(c{i} as hugeint) * (2 * below + t + 1))"
            f" as double) / 2.0 as r{i}"
            for i in range(len(_KW_CLASSES))
        )},
               cast(sum(cast(t as hugeint) * t * t - t) as double) as ties
        from ranked
    )
    select cast({_kw_terms()[0]} as bigint) as n_obs,
           {len(_KW_CLASSES)} as k_groups,
           round((12.0 / (({_kw_terms()[0]}) * (({_kw_terms()[0]}) + 1))
                  * ({_kw_terms()[1]})
                  - 3.0 * (({_kw_terms()[0]}) + 1))
                 / (1.0 - ties / (({_kw_terms()[0]}) * ({_kw_terms()[0]})
                                  * ({_kw_terms()[0]}) - ({_kw_terms()[0]}))),
                 6) as h_stat
    from g
    """,
    tags=("agg", "stats"),
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across k groups (SAS: PROC NPAR1WAY WILCOXON
    with a k-level CLASS — the k-sample rank test printed alongside
    the two-sample Wilcoxon): does the quantity distribution differ
    across return-flag classes? Emits N, k, and the tie-corrected H.

    Machinery is q_mannwhitney's histogram-rank idiom extended to k
    classes: per-value conditional counts (one map-side-combined
    groupBy, 50 result rows), a prefix-sum window over DISTINCT
    values only, per-class rank sums via the doubled integer form,
    and H = (12/(N(N+1)) * sum_g(R_g^2/n_g) - 3(N+1)) / (1 -
    sum(t^3-t)/(N^3-N)) as one fixed-order textual expression over
    the named per-class columns (the _anova_terms device). The class
    list is part of the operator definition (PROC NPAR1WAY CLASS
    levels). Both the doubled rank sums and the t^3 tie sums ride
    decimal(38,0) / hugeint (round-16 advice: the doubled form wraps
    int64 near sf~1000 under Spark's non-ANSI arithmetic).

    Scale: identical to q_mannwhitney — the plan's only row-scale
    work is the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy(F.col("l_quantity").cast("long").alias("q")).agg(
        *[
            F.count(F.when(F.col("l_returnflag") == c, 1)).alias(f"c{i}")
            for i, c in enumerate(_KW_CLASSES)
        ],
        F.count(F.lit(1)).alias("t"),
    )
    below_w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn(
        "below", F.coalesce(F.sum("t").over(below_w), F.lit(0))
    )
    aggs = []
    for i in range(len(_KW_CLASSES)):
        aggs.append(F.sum(f"c{i}").cast("double").alias(f"n{i}"))
        aggs.append(
            (
                F.sum(
                    F.col(f"c{i}").cast("decimal(38,0)")
                    * (2 * F.col("below") + F.col("t") + 1)
                ).cast("double")
                / 2.0
            ).alias(f"r{i}")
        )
    aggs.append(
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        )
        .cast("double")
        .alias("ties")
    )
    g = ranked.agg(*aggs)
    n, r2_over_n = _kw_terms()
    k = len(_KW_CLASSES)
    return g.select(
        F.expr(f"cast({n} as bigint)").alias("n_obs"),
        F.lit(k).alias("k_groups"),
        F.round(
            F.expr(
                f"(12.0 / (({n}) * (({n}) + 1)) * ({r2_over_n})"
                f" - 3.0 * (({n}) + 1))"
                f" / (1.0 - ties / (({n}) * ({n}) * ({n}) - ({n})))"
            ),
            6,
        ).alias("h_stat"),
    )


# -- one-way ANOVA ----------------------------------------------------

_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def _anova_terms() -> tuple[str, str, str, str]:
    """Textual per-segment aggregate expressions with a FIXED term
    order (the tuple above), so both engines evaluate the identical
    double expression — no float fold whose order could differ."""
    n = " + ".join(f"n{i}" for i in range(len(_SEGMENTS)))
    s = " + ".join(f"s{i}" for i in range(len(_SEGMENTS)))
    sq_over_n = " + ".join(
        f"s{i} * s{i} / n{i}" for i in range(len(_SEGMENTS))
    )
    q = " + ".join(f"q{i}" for i in range(len(_SEGMENTS)))
    return n, s, sq_over_n, q


@query(
    "q_anova_oneway",
    oracle=f"""
    with base as (
        select c.c_mktsegment,
               cast(round(o.o_totalprice * 100) as bigint) as cents
        from orders o join customer c on o.o_custkey = c.c_custkey
    ),
    g as (
        select
        {", ".join(
            f"cast(count(*) filter (c_mktsegment = '{seg}') as double) as n{i}, "
            f"cast(sum(cents) filter (c_mktsegment = '{seg}') as double) as s{i}, "
            f"cast(sum(cents * cents) filter (c_mktsegment = '{seg}')"
            f" as double) as q{i}"
            for i, seg in enumerate(_SEGMENTS)
        )}
        from base
    )
    select cast({_anova_terms()[0]} as bigint) as n_obs,
           {len(_SEGMENTS)} as k_groups,
           round((({_anova_terms()[2]})
                  - ({_anova_terms()[1]}) * ({_anova_terms()[1]})
                    / ({_anova_terms()[0]})) / 10000.0, 2) as ss_between,
           round((({_anova_terms()[3]}) - ({_anova_terms()[2]})) / 10000.0,
                 2) as ss_within,
           round((({_anova_terms()[2]})
                  - ({_anova_terms()[1]}) * ({_anova_terms()[1]})
                    / ({_anova_terms()[0]})) / ({len(_SEGMENTS)} - 1)
                 / ((({_anova_terms()[3]}) - ({_anova_terms()[2]}))
                    / (({_anova_terms()[0]}) - {len(_SEGMENTS)})), 6) as f_stat
    from g
    """,
    tags=("agg", "stats"),
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F (SAS: PROC ANOVA / PROC GLM, CLASS
    c_mktsegment, MODEL o_totalprice = c_mktsegment): does mean order
    value differ across the five market segments? Emits N, k, the
    between/within sums of squares (dollar^2), and the F statistic.

    Parity: exact cent sums and squared-cent sums per segment land in
    NAMED columns via conditional aggregation (one pass, no pivot);
    SSB = sum_g(S_g^2/n_g) - S^2/N and SSW = sum_g(Q_g) -
    sum_g(S_g^2/n_g) are then textual expressions whose five terms
    appear in one FIXED order on both sides (_anova_terms) — the
    round-15 answer to float-fold divergence when combining per-group
    aggregates across engines. cents^2 sums ride decimal(38,0) /
    hugeint; SS values divide by 1e4 once for dollars^2.

    Scale: single global aggregate with map-side combine — each
    partition reduces to fifteen numbers before the one-row exchange;
    the customer join broadcasts when small. The fixed segment list
    is part of the operator definition (PROC ANOVA class levels),
    not a sampled fact."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    aggs = []
    for i, seg in enumerate(_SEGMENTS):
        m = F.col("c_mktsegment") == seg
        aggs.append(F.count(F.when(m, 1)).cast("double").alias(f"n{i}"))
        aggs.append(F.sum(F.when(m, F.col("cents"))).cast("double").alias(f"s{i}"))
        aggs.append(
            F.sum(
                F.when(m, (F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
            )
            .cast("double")
            .alias(f"q{i}")
        )
    g = base.agg(*aggs)
    n, s, sq_over_n, q = _anova_terms()
    k = len(_SEGMENTS)
    ssb = f"(({sq_over_n}) - ({s}) * ({s}) / ({n}))"
    ssw = f"(({q}) - ({sq_over_n}))"
    return g.select(
        F.expr(f"cast({n} as bigint)").alias("n_obs"),
        F.lit(k).alias("k_groups"),
        F.round(F.expr(f"{ssb} / 10000.0"), 2).alias("ss_between"),
        F.round(F.expr(f"{ssw} / 10000.0"), 2).alias("ss_within"),
        F.round(
            F.expr(f"{ssb} / ({k} - 1) / ({ssw} / (({n}) - {k}))"), 6
        ).alias("f_stat"),
    )
