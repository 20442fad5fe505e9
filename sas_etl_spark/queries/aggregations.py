"""Aggregation queries (SURVEY.md §2.4): PROC MEANS/SUMMARY/FREQ class.

Reference note: /root/reference was empty at survey time (SURVEY.md
§0); SAS construct names below are the reference-class capability
model, verified via the DuckDB oracle instead of reference file:line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.broadcast import broadcast_if_small
from sas_etl_spark.operators.quality_checks import check_suite
from sas_etl_spark.registry import query


@query(
    "q_pricing_summary",
    oracle="""
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                           as sum_qty,
           round(sum(l_extendedprice), 2)                      as sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 2)   as sum_disc,
           round(avg(l_quantity), 6)                           as avg_qty,
           round(avg(l_discount), 6)                           as avg_disc,
           count(*)                                            as cnt
    from lineitem
    where l_shipdate <= timestamp '2000-09-01 00:00:00'
    group by l_returnflag, l_linestatus
    """,
    tags=("bench", "agg"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered group-by with sum/avg/count (SAS: PROC MEANS with CLASS;
    TPC-H Q1 shape). SURVEY.md §2.4 #28.

    Scale: filter + projection push to the parquet scan; partial
    aggregation map-side; 6 output groups -> trivially small shuffle.
    Doubles rounded identically on both sides (summation-order drift).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc"
            ),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "q_pivot_status",
    oracle="""
    select o_orderpriority,
           cast(sum(case when o_orderstatus = 'F' then 1 else 0 end) as bigint) as f_cnt,
           cast(sum(case when o_orderstatus = 'O' then 1 else 0 end) as bigint) as o_cnt,
           cast(sum(case when o_orderstatus = 'P' then 1 else 0 end) as bigint) as p_cnt
    from orders
    group by o_orderpriority
    """,
    tags=("bench", "agg"),
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab via conditional aggregation (SAS: PROC FREQ TABLES
    status*priority). SURVEY.md §2.4 #32.

    Written as explicit sum(case..) rather than df.pivot so the pivot
    column set is static — one aggregation pass, no distinct-values
    pre-job, which is what you want when the fact table is 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")

    def cnt(status: str) -> F.Column:
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0)).alias(
            f"{status.lower()}_cnt"
        )

    return orders.groupBy("o_orderpriority").agg(cnt("F"), cnt("O"), cnt("P"))


@query(
    "q_rollup",
    oracle="""
    select coalesce(l_returnflag, 'ALL') as rf,
           coalesce(l_linestatus, 'ALL') as ls,
           round(sum(l_quantity), 2)     as q
    from lineitem
    group by rollup(l_returnflag, l_linestatus)
    """,
    tags=("bench", "agg"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (SAS: PROC MEANS _TYPE_ / TYPES).
    SURVEY.md §2.4 #30.

    Spark expands rollup into grouping sets inside one aggregation —
    no N-pass scan. The coalesce-to-'ALL' labeling is safe because the
    grouping columns are non-null in the fixtures.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("q"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "q",
        )
    )


@query(
    "q_distinct_count",
    oracle="""
    select c_mktsegment,
           count(distinct c_nationkey) as n_nations,
           count(*) as n_customers
    from customer
    group by c_mktsegment
    """,
    tags=("agg",),
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct count per group (SAS: PROC SQL COUNT(DISTINCT) / PROC
    FREQ NLEVELS). SURVEY.md §2.4 #29.

    Exact countDistinct here (oracle-matchable). At 100 TB the same
    query shape swaps in approx_count_distinct (HLL sketch, one pass,
    mergeable) — exposed as q_approx_distinct (rows-only).
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "q_percentiles",
    oracle="""
    select l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) as p25,
           round(quantile_cont(l_quantity, 0.50), 6) as p50,
           round(quantile_cont(l_quantity, 0.75), 6) as p75
    from lineitem
    group by l_returnflag
    """,
    tags=("agg",),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SAS: PROC MEANS P25 MEDIAN P75 /
    PROC UNIVARIATE with QNTLDEF=4). SURVEY.md §2.4 #31.

    Spark ``percentile`` and DuckDB ``quantile_cont`` both use linear
    interpolation — semantically identical. Round 8: computed via
    operators/quantiles.exact_percentiles_hist instead of the
    ``percentile`` aggregate — the builtin BUFFERS every group value
    in executor memory (the 100 TB OOM risk its own docs warn about),
    while the histogram form needs O(distinct values) state, stays
    map-side combined, and reproduces the same interpolated order
    statistics exactly. ``percentile_approx`` remains the sketch
    option when even the value domain is unbounded.
    """
    from sas_etl_spark.operators.quantiles import exact_percentiles_hist

    li = load_table(spark, sf_dir, "lineitem")
    return exact_percentiles_hist(
        li, "l_returnflag", "l_quantity",
        {"p25": 0.25, "p50": 0.50, "p75": 0.75}, round_dp=6,
    )


@query(
    "q_remerge_share",
    oracle="""
    select l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) /
                 sum(l_extendedprice * (1 - l_discount)) over (partition by l_orderkey),
                 6) as revenue_share
    from lineitem
    """,
    tags=("agg", "window"),
)
def q_remerge_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detail rows with their share of the group total (SAS: PROC SQL
    "remerging summary statistics"). SURVEY.md §2.4 #35.

    SAS silently re-joins the aggregate onto detail rows; the Spark
    expression of that is a window aggregate over an unordered
    partition — one shuffle, no self-join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    w = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(rev / F.sum(rev).over(w), 6).alias("revenue_share"),
    )


@query(
    "q_approx_distinct",
    oracle="""
    select l_returnflag,
           cast(count(distinct l_partkey) as bigint) as exact_parts,
           cast(count(*) as bigint) as n_rows,
           cast(1 as int) as within_bounds
    from lineitem
    group by l_returnflag
    """,
    tags=("agg", "approx", "scale"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counts — the 100 TB path for #29 (HLL++
    sketch: one pass, constant memory, mergeable across partitions;
    exact count-distinct expands then re-shuffles every key).

    Graduated from rows-only in round 6: the HLL estimate itself is
    engine-specific, so the driver-visible result carries the EXACT
    twin (oracle-recomputable) plus ``within_bounds`` = "the sketch
    landed within 5x its configured rsd of exact", which the oracle
    asserts as constant 1 — a hash-verified error-bound attestation,
    not just a row count. Production callers use the approx aggregate
    alone; this registered form is its accuracy harness.

    Round 8: the two aggregates run as SEPARATE plans joined on the
    3-row group key instead of one mixed agg — Spark's mixed
    distinct/non-distinct aggregation shuffles the raw key stream
    alongside the sketch path, and the split form measured 12x faster
    at sf10 (62.5 s -> 5.2 s, identical results; SCALE.md). The join
    is 3 rows x 3 rows — free."""
    li = load_table(spark, sf_dir, "lineitem")
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    agg = sketch.join(exact, "l_returnflag")
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "n_rows",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.10 * F.col("exact_parts")
        )
        .cast("int")
        .alias("within_bounds"),
    )


#: One SQL text, two engines: q_proc_sql submits this string verbatim
#: through spark.sql AND as the DuckDB oracle — dialect-neutral ANSI.
_PROC_SQL_TEXT = """
    select c_nationkey, cast(count(*) as bigint) as n_cust,
           round(sum(c_acctbal), 2) as total_bal
    from customer
    where c_acctbal > 0
    group by c_nationkey
    having count(*) >= 10
    """


@query("q_proc_sql", oracle=_PROC_SQL_TEXT, tags=("agg", "sql"))
def q_proc_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end itself (SAS: PROC SQL). The exact ANSI string
    a PROC SQL user would write — WHERE + GROUP BY + HAVING — is
    submitted verbatim via spark.sql over registered views, and the
    SAME string is the DuckDB oracle: paste-your-SQL-unchanged parity,
    hash-proven. Catalyst plans it identically to the DataFrame form
    (filter pushdown, partial aggregates); views carry no overhead."""
    from sas_etl_spark.catalog import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_PROC_SQL_TEXT)


@query(
    "q_quality_checks",
    oracle="""
    select 'null_custkey' as check,
           cast(sum(case when o_custkey is null then 1 else 0 end) as bigint)
               as n_violations,
           sum(case when o_custkey is null then 1 else 0 end) = 0 as passed
    from orders
    union all
    select 'nonpositive_price',
           cast(sum(case when o_totalprice is null or o_totalprice <= 0
                         then 1 else 0 end) as bigint),
           sum(case when o_totalprice is null or o_totalprice <= 0
                    then 1 else 0 end) = 0
    from orders
    union all
    select 'bad_status',
           cast(sum(case when o_orderstatus is null
                          or o_orderstatus not in ('O', 'F', 'P')
                         then 1 else 0 end) as bigint),
           sum(case when o_orderstatus is null
                     or o_orderstatus not in ('O', 'F', 'P')
                    then 1 else 0 end) = 0
    from orders
    union all
    select 'date_out_of_range',
           cast(sum(case when o_orderdate is null
                          or o_orderdate < timestamp '1992-01-01 00:00:00'
                          or o_orderdate > timestamp '1999-01-01 00:00:00'
                         then 1 else 0 end) as bigint),
           sum(case when o_orderdate is null
                     or o_orderdate < timestamp '1992-01-01 00:00:00'
                     or o_orderdate > timestamp '1999-01-01 00:00:00'
                    then 1 else 0 end) = 0
    from orders
    union all
    select 'unique(o_orderkey)',
           cast(sum(n - 1) as bigint),
           sum(n - 1) = 0
    from (select o_orderkey, count(*) as n from orders group by o_orderkey)
    """,
    tags=("quality", "agg"),
)
def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite over orders (SAS: PROC FREQ /
    PROC SQL count asserts; dbt-test/Deequ analog) — null keys,
    domain membership, range bounds, positivity, and key uniqueness,
    ALL in one scan plus one keyed agg for uniqueness
    (operators/quality_checks.py). The n-checks-one-scan shape is the
    100 TB requirement: a constraint suite must not multiply reads.
    NULL-handling rule pinned by the oracle: an unknown predicate
    counts as a violation."""
    orders = load_table(spark, sf_dir, "orders")
    lo = F.lit("1992-01-01").cast("timestamp")
    hi = F.lit("1999-01-01").cast("timestamp")
    return check_suite(
        orders,
        checks=[
            ("null_custkey", F.col("o_custkey").isNull()),
            ("nonpositive_price", F.col("o_totalprice") <= 0),
            ("bad_status", ~F.col("o_orderstatus").isin("O", "F", "P")),
            (
                "date_out_of_range",
                (F.col("o_orderdate") < lo) | (F.col("o_orderdate") > hi),
            ),
        ],
        unique_keys=[["o_orderkey"]],
    )


@query(
    "q_rfm_segments",
    oracle="""
    with rfm as (
        select o_custkey,
               date_diff('day', max(o_orderdate),
                         timestamp '1998-08-02 00:00:00') as recency,
               cast(count(*) as bigint) as frequency,
               round(sum(o_totalprice), 2) as monetary
        from orders group by o_custkey
    ),
    cuts as (
        select quantile_cont(recency, 0.5) as r_med,
               quantile_cont(frequency, 0.5) as f_med,
               quantile_cont(monetary, 0.5) as m_med
        from rfm
    )
    select o_custkey,
           cast(recency as bigint) as recency, frequency, monetary,
           concat(case when recency <= r_med then 'R' else 'r' end,
                  case when frequency > f_med then 'F' else 'f' end,
                  case when monetary > m_med then 'M' else 'm' end)
               as segment
    from rfm, cuts
    """,
    tags=("agg", "analytics"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency/frequency/monetary; SAS:
    PROC RANK GROUPS= over PROC MEANS output) WITHOUT the global
    ntile window over detail rows — that would sort every ROW through
    one task. Instead: one keyed agg builds the per-customer RFM
    triple, median cuts come from a 1-row aggregate BROADCAST back
    over the triples, and segment letters compare against the cuts.

    Honest scale note (round 6 — found by the fixed SinglePartition
    audit): the EXACT interpolated-percentile cuts still buffer the
    per-customer triples through one ObjectHashAggregate merge task —
    O(customers), the inherent cost of exact global quantiles in any
    engine (DuckDB's quantile_cont pays the same; it is why this
    query can be oracle-exact). This is the one allowlisted
    single-partition funnel in the registry
    (tests/test_plan_audit.py). At 100 TB pass ``exact_cuts=False``
    to _rfm_segments: percentile_approx cuts keep constant state per
    task (accuracy attested by q_approx_percentile's oracle-green
    bound flag), trading cut placement by at most the sketch's 1e-4
    rank error. Integer-day recency / integer frequency / 2dp
    monetary keep the cut arithmetic drift-free on both engines; the
    anchor date is the fixture's max order date."""
    return _rfm_segments(spark, sf_dir, exact_cuts=True)


def _rfm_segments(
    spark: SparkSession, sf_dir: str, exact_cuts: bool = True
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = F.lit("1998-08-02").cast("timestamp")
    rfm = orders.groupBy("o_custkey").agg(
        F.datediff(anchor, F.max("o_orderdate")).cast("long").alias("recency"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    if exact_cuts:
        cuts = rfm.agg(
            F.expr("percentile(recency, 0.5)").alias("r_med"),
            F.expr("percentile(frequency, 0.5)").alias("f_med"),
            F.expr("percentile(monetary, 0.5)").alias("m_med"),
        )
    else:  # mergeable sketch cuts — the 100 TB path
        cuts = rfm.agg(
            F.percentile_approx("recency", 0.5, 10_000).alias("r_med"),
            F.percentile_approx("frequency", 0.5, 10_000).alias("f_med"),
            F.percentile_approx("monetary", 0.5, 10_000).alias("m_med"),
        )
    return rfm.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "recency",
        "frequency",
        "monetary",
        F.concat(
            F.when(F.col("recency") <= F.col("r_med"), "R").otherwise("r"),
            F.when(F.col("frequency") > F.col("f_med"), "F").otherwise("f"),
            F.when(F.col("monetary") > F.col("m_med"), "M").otherwise("m"),
        ).alias("segment"),
    )


@query(
    "q_histogram",
    oracle="""
    select cast(least(floor((o_totalprice - 0) / 50000), 9) as bigint)
               as bucket,
           cast(count(*) as bigint) as n,
           round(min(o_totalprice), 2) as lo,
           round(max(o_totalprice), 2) as hi
    from orders
    group by 1
    """,
    tags=("agg", "stats"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram with a clamped overflow bucket (SAS:
    PROC UNIVARIATE HISTOGRAM / PROC FORMAT range bins). Explicit
    floor((x-lo)/w) arithmetic rather than any engine-specific
    width_bucket builtin, so the bucketing function is identical on
    both engines; one map-side-combinable agg, bucket count fixed at
    plan time — the shape that histograms a 100 TB column in one
    pass."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("long")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "q_weighted_stats",
    oracle="""
    select l_returnflag,
           round(sum(l_quantity), 2) as w_sum,
           round(sum(l_quantity * l_extendedprice) / sum(l_quantity), 6)
               as wmean_price,
           round(sum(l_quantity * l_extendedprice * l_extendedprice)
                   / sum(l_quantity)
                 - pow(sum(l_quantity * l_extendedprice)
                         / sum(l_quantity), 2), 1) as wvar_price
    from lineitem
    group by l_returnflag
    """,
    tags=("agg", "stats"),
)
def q_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted statistics (SAS: PROC MEANS with a WEIGHT statement —
    the frequency/importance weighting every survey and finance ETL
    uses): weighted mean and weighted population variance of
    extendedprice, weight = quantity, via the one-pass algebraic
    identities sum(w*x)/sum(w) and sum(w*x^2)/sum(w) - wmean^2 —
    mergeable partial aggregates, scaling exactly like sum/count (the
    pandas-UDAF spelling of the weighted mean is q_udaf_weighted,
    which demonstrates the UDAF surface; this is the built-in hot
    path). The variance rounds to 1dp: the identity's cancellation
    costs ~1 digit, leaving ~1e-3 absolute agreement on this scale —
    far inside a 0.05 rounding boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    w, x = F.col("l_quantity"), F.col("l_extendedprice")
    sw = F.sum(w)
    swx = F.sum(w * x)
    swxx = F.sum(w * x * x)
    return li.groupBy("l_returnflag").agg(
        F.round(sw, 2).alias("w_sum"),
        F.round(swx / sw, 6).alias("wmean_price"),
        F.round(swxx / sw - F.pow(swx / sw, 2), 1).alias("wvar_price"),
    )


@query(
    "q_argmax",
    oracle="""
    select c_nationkey,
           arg_max(c_name, c_acctbal || '|' || c_name) as richest_name,
           round(max(c_acctbal), 2) as top_bal,
           arg_min(c_name, c_acctbal || '|' || c_name) as poorest_name
    from customer
    group by c_nationkey
    """,
    tags=("agg",),
)
def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin per group (SAS: PROC SUMMARY IDGROUP(MAX(bal)
    OUT(name)) — 'carry the identifying columns of the extreme row'):
    Spark max_by/min_by, one mergeable aggregate, no window and no
    self-join back. Tie determinism: the ordering key is the STRING
    'acctbal|name', so the extreme row is unique even when two
    customers share a balance, and both engines compare the identical
    concatenated key (both render doubles shortest-decimal). The
    ranking is deliberately the string form on BOTH sides — what is
    under test is argmax row-identity parity, not numeric ordering;
    max(c_acctbal) carries the true numeric max alongside."""
    customer = load_table(spark, sf_dir, "customer")
    key = F.concat_ws("|", F.col("c_acctbal").cast("string"), F.col("c_name"))
    return customer.groupBy("c_nationkey").agg(
        F.max_by("c_name", key).alias("richest_name"),
        F.round(F.max("c_acctbal"), 2).alias("top_bal"),
        F.min_by("c_name", key).alias("poorest_name"),
    )


# -- hierarchical share of parent ------------------------------------


@query(
    "q_share_of_parent",
    oracle="""
    with nagg as (
        select r.r_name as region, n.n_name as nation,
               round(sum(c.c_acctbal), 2) as bal
        from customer c
        join nation n on n.n_nationkey = c.c_nationkey
        join region r on r.r_regionkey = n.n_regionkey
        group by r.r_name, n.n_name
    )
    select region, nation, bal,
           round(bal / sum(bal) over (partition by region), 6)
               as share_of_region,
           round(sum(bal) over (partition by region)
                 / sum(bal) over (), 6) as region_share_of_total
    from nagg
    """,
    tags=("agg", "window", "analytics"),
)
def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent rollup: each nation's share of its
    region and each region's share of the total, in one pass (SAS:
    PROC TABULATE PCTSUM<row> / nested PROC MEANS remerges).

    Both windows run over the ALREADY-REDUCED nation aggregate
    (O(nations) rows), so the global-total window's single partition
    holds 25 rows — not a detail-row funnel. Rounding BEFORE the
    share division pins the numerator bit-for-bit on both engines.

    Scale: detail rows are touched once by the grouped agg; the share
    arithmetic is a two-window pass over a dimension-sized table —
    constant work at any fact size.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nagg = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.round(F.sum("c_acctbal"), 2).alias("bal"))
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    return nagg.select(
        "region",
        "nation",
        "bal",
        F.round(F.col("bal") / F.sum("bal").over(wr), 6).alias(
            "share_of_region"
        ),
        F.round(F.sum("bal").over(wr) / F.sum("bal").over(wt), 6).alias(
            "region_share_of_total"
        ),
    )


# -- top-k plus Other rollup -----------------------------------------

TOPK_OTHER_K = 5


@query(
    "q_topk_other",
    oracle=f"""
    with rev as (
        select p.p_type as category,
               round(sum(l.l_extendedprice), 2) as revenue
        from lineitem l join part p on p.p_partkey = l.l_partkey
        group by p.p_type
    ),
    ranked as (
        select category, revenue,
               row_number() over (order by revenue desc, category) as rnk
        from rev
    )
    select case when rnk <= {TOPK_OTHER_K} then category
                else 'OTHER' end as category,
           round(sum(revenue), 2) as revenue,
           cast(min(case when rnk <= {TOPK_OTHER_K} then rnk else 9999 end)
                as bigint) as rnk
    from ranked
    group by 1
    """,
    tags=("agg", "analytics"),
)
def q_topk_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 categories by revenue with everything else rolled into
    ONE 'OTHER' row — the universal reporting idiom (SAS: PROC MEANS
    + a DATA step recode of non-top groups).

    The rank and the Other-rollup both run on the REDUCED category
    table; the deterministic (revenue desc, category) rank order makes
    the top-k boundary engine-exact on the 2dp-rounded revenue.
    OTHER's rank sentinel 9999 keeps the output totally ordered.

    Scale: detail scan -> one grouped agg; ranking a category-sized
    table is O(categories log categories) on one task — fine because
    categories, not facts, bound it. Part GROWS with SF (sf×200k
    rows), so the lineitem⋈part hint is size-gated: broadcast while
    provably small, AQE's strategy choice past the bound.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(broadcast_if_small(part), part.p_partkey == li.l_partkey)
        .groupBy(F.col("p_type").alias("category"))
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("category"))
    ranked = rev.withColumn("rnk", F.row_number().over(w))
    return (
        ranked.select(
            F.when(F.col("rnk") <= TOPK_OTHER_K, F.col("category"))
            .otherwise("OTHER")
            .alias("category"),
            "revenue",
            F.when(F.col("rnk") <= TOPK_OTHER_K, F.col("rnk"))
            .otherwise(9999)
            .alias("rnk0"),
        )
        .groupBy("category")
        .agg(
            F.round(F.sum("revenue"), 2).alias("revenue"),
            F.min("rnk0").cast("long").alias("rnk"),
        )
    )


# -- month-over-month growth -----------------------------------------


@query(
    "q_mom_growth",
    oracle="""
    with m as (
        select o_orderpriority,
               cast(date_trunc('month', o_orderdate) as timestamp) as mo,
               round(sum(o_totalprice), 2) as revenue
        from orders
        group by o_orderpriority, date_trunc('month', o_orderdate)
    )
    select o_orderpriority, mo, revenue,
           round(revenue - lag(revenue) over (partition by o_orderpriority
                                              order by mo), 2) as delta,
           round((revenue - lag(revenue) over (partition by o_orderpriority
                                               order by mo))
                 / lag(revenue) over (partition by o_orderpriority
                                      order by mo) * 100, 4) as pct_change
    from m
    """,
    tags=("agg", "window", "analytics"),
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth per priority class — the
    period-comparison report every finance deck runs (SAS: PROC MEANS
    by month + a DATA-step LAG of the summary dataset).

    The lag runs over the REDUCED month series (O(groups x months)
    rows), never detail rows; deltas and percent changes compute from
    the 2dp-rounded monthly totals so both engines difference
    identical numerators. First month per group yields null
    delta/pct (no prior period) on both sides.

    Scale: one grouped agg over the scan (map-side combined), then a
    window over a tiny series — constant work at any fact size.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", "o_orderdate").alias("mo"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.partitionBy("o_orderpriority").orderBy("mo")
    prev = F.lag("revenue").over(w)
    return m.select(
        "o_orderpriority",
        "mo",
        "revenue",
        F.round(F.col("revenue") - prev, 2).alias("delta"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias(
            "pct_change"
        ),
    )
