"""CUBE/grouping-id and sampling queries — completing the PROC MEANS
TYPES/WAYS surface (SAS _TYPE_) and PROC SURVEYSELECT."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query


@query(
    "q_cube",
    oracle="""
    select coalesce(l_returnflag, 'ALL') as rf,
           coalesce(l_linestatus, 'ALL') as ls,
           cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as bigint) as type_id,
           round(sum(l_quantity), 2) as q,
           count(*) as n
    from lineitem
    group by cube(l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All CLASS-combination subtotals (SAS: PROC MEANS with two CLASS
    vars — all _TYPE_ levels). grouping_id() reproduces _TYPE_ exactly
    (bit per grouped-out column). One aggregation pass expands the 4
    grouping sets internally — never 4 scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("type_id"),
            F.round(F.sum("l_quantity"), 2).alias("q"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "type_id",
            "q",
            "n",
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
    select o_orderstatus, o_orderpriority,
           cast(count(*) as bigint) as n,
           round(sum(o_totalprice), 2) as total,
           cast(grouping(o_orderstatus) as integer) as g_status,
           cast(grouping(o_orderpriority) as integer) as g_prio
    from orders
    group by grouping sets ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (SAS: PROC MEANS TYPES statement picking
    specific _TYPE_ levels) — the third grouping-combination shape
    next to rollup/cube: two disjoint one-column sets in ONE
    aggregation pass over one scan, via Spark 4's native
    DataFrame.groupingSets API. grouping() flags disambiguate which
    set produced each row (a real NULL key vs a grouped-out column)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
    )


@query(
    "q_approx_percentile",
    oracle="""
    select l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) as p25,
           round(quantile_cont(l_quantity, 0.50), 6) as p50,
           round(quantile_cont(l_quantity, 0.75), 6) as p75,
           cast(1 as int) as within_1
    from lineitem
    group by l_returnflag
    """,
    tags=("agg", "approx", "scale"),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles — the 100 TB twin of q_percentiles
    (mergeable, bounded memory; exact percentile buffers each group).

    Graduated from rows-only in round 6: the sketch's picks are
    engine-specific, so the driver-visible result carries the EXACT
    interpolated percentiles (oracle = quantile_cont, the established
    q_percentiles parity) plus ``within_1`` = "every sketch value is
    within 1.0 of its exact percentile", asserted constant-1 by the
    oracle. 1.0 is one unit of the integer l_quantity domain (1..50):
    the sketch guarantees rank error <= 1/accuracy = 1e-4, and a 1e-4
    rank slip moves the value by at most one domain step — so the
    hash comparison attests the sketch's rank-error contract at value
    resolution. Production callers use percentile_approx alone; this
    registered form is its accuracy harness."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10_000).alias("approx_q"),
        F.expr("percentile(l_quantity, 0.25)").alias("e25"),
        F.expr("percentile(l_quantity, 0.50)").alias("e50"),
        F.expr("percentile(l_quantity, 0.75)").alias("e75"),
    )
    within = (
        (F.abs(F.element_at("approx_q", 1) - F.col("e25")) <= 1.0)
        & (F.abs(F.element_at("approx_q", 2) - F.col("e50")) <= 1.0)
        & (F.abs(F.element_at("approx_q", 3) - F.col("e75")) <= 1.0)
    )
    return agg.select(
        "l_returnflag",
        F.round("e25", 6).alias("p25"),
        F.round("e50", 6).alias("p50"),
        F.round("e75", 6).alias("p75"),
        within.cast("int").alias("within_1"),
    )


@query(
    "q_sample",
    oracle="""
    with h as (
        select o_orderkey, o_custkey, o_totalprice,
               list_reduce(
                 list_transform(range(1,16),
                   j -> strpos('0123456789abcdef',
                               substr(sha256('42:' || cast(o_orderkey as varchar)),
                                      j, 1)) - 1),
                 (a,x) -> a*16+x) % 1000 as bucket
        from orders
    )
    select o_orderkey, o_custkey, o_totalprice from h where bucket < 100
    """,
    tags=("scan", "sample"),
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 10% simple random sample (SAS: PROC SURVEYSELECT
    METHOD=SRS SEED=42). Membership is a pure function of
    (seed, o_orderkey) — sha256('42:'||key) bucketed per-mille, see
    operators/sampling.srs_sample — so the oracle reproduces the EXACT
    member rows (graduated from rows-only in round 6: Spark's native
    ``df.sample(fraction, seed)`` draws from a partition-dependent RNG
    stream no other engine can replay, which is also why it is the
    wrong primitive for a reproducible training pipeline). Sampling is
    a codegen filter at the scan: no shuffle, and the unsampled rest
    is never materialized."""
    from sas_etl_spark.operators.sampling import srs_sample

    orders = load_table(spark, sf_dir, "orders")
    return srs_sample(orders, "o_orderkey", 100, seed=42).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "q_split_hash",
    oracle="""
    with b as (
        select case
            when list_reduce(
                   list_transform(range(1,16),
                     j -> strpos('0123456789abcdef',
                                 substr(sha256(cast(doc_id as varchar)), j, 1)) - 1),
                   (a,x) -> a*16+x) % 100 < 80 then 'train'
            when list_reduce(
                   list_transform(range(1,16),
                     j -> strpos('0123456789abcdef',
                                 substr(sha256(cast(doc_id as varchar)), j, 1)) - 1),
                   (a,x) -> a*16+x) % 100 < 90 then 'valid'
            else 'test' end as split
        from documents
    )
    select split, cast(count(*) as bigint) as n from b group by split
    """,
    tags=("sample", "dedup"),
)
def q_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by sha256 of the
    document key (SAS: PROC SURVEYSELECT with a hash stratifier; the
    training-pipeline replacement for seeded sampling). Unlike
    df.sample, assignment is a pure function of doc_id — stable across
    engines, runs, and repartitioning — so the DuckDB oracle recomputes
    the exact same membership (first 15 sha256 hex digits -> 60-bit
    int -> mod 100). Shuffle-free narrow op; verified here by split
    counts (membership itself is pinned by unit test)."""
    from sas_etl_spark.operators.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        deterministic_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_stratified_sample",
    oracle="""
    with h as (
        select o_orderkey, o_orderstatus, o_totalprice,
               list_reduce(
                 list_transform(range(1,16),
                   j -> strpos('0123456789abcdef',
                               substr(sha256(cast(o_orderkey as varchar)), j, 1)) - 1),
                 (a,x) -> a*16+x) % 1000 as bucket
        from orders
    )
    select o_orderkey, o_orderstatus, o_totalprice
    from h
    where bucket < case o_orderstatus
                   when 'O' then 50 when 'F' then 200 else 500 end
    """,
    tags=("sample",),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (SAS: PROC
    SURVEYSELECT STRATA o_orderstatus / SAMPRATE= list): 5% of open
    orders, 20% of finished, 50% of in-progress — the unequal-rates
    shape every training-data curation pipeline uses to oversample
    scarce strata.

    Membership is a pure function of the row key (sha256 bucket in
    [0,1000), same engine-portable hash as q_split_hash), NOT a seeded
    RNG — so the sample is identical across engines, runs, cluster
    sizes, and repartitioning, and the oracle reproduces the exact
    member ROWS, not just counts. Shuffle-free: one codegen Project +
    filter at the scan."""
    from sas_etl_spark.operators.sampling import hash_bucket

    orders = load_table(spark, sf_dir, "orders")
    rate = (
        F.when(F.col("o_orderstatus") == "O", 50)
        .when(F.col("o_orderstatus") == "F", 200)
        .otherwise(500)
    )
    return orders.filter(hash_bucket("o_orderkey", 1000) < rate).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "q_pps_sample",
    oracle="""
    with h as (
        select o_orderkey, o_totalprice,
               least(1.0, o_totalprice / 300000) as p,
               list_reduce(
                 list_transform(range(1,16),
                   j -> strpos('0123456789abcdef',
                               substr(sha256('11:' || cast(o_orderkey as varchar)),
                                      j, 1)) - 1),
                 (a,x) -> a*16+x) % 1000000 as bucket
        from orders
    )
    select o_orderkey, o_totalprice,
           round(1.0 / p, 6) as ht_weight
    from h
    where bucket < p * 1000000
    """,
    tags=("sample", "scale"),
)
def q_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size (Poisson/importance) sampling
    with Horvitz-Thompson weights (SAS: PROC SURVEYSELECT METHOD=PPS;
    the quality-weighted document sampling every training-data
    curation pipeline uses to oversample high-value records):
    inclusion probability p = min(1, size/threshold), membership
    decided by the same seeded engine-portable hash as q_sample
    (per-mille bucket scaled to 1e6 resolution), and each kept row
    carries weight 1/p so any downstream weighted sum is an unbiased
    estimator of the population total (Horvitz-Thompson). Membership
    AND weights are exactly reproducible by the oracle — pure
    codegen filter at the scan, no shuffle, nothing materialized for
    the unsampled rest."""
    from sas_etl_spark.operators.sampling import hash_bucket

    orders = load_table(spark, sf_dir, "orders")
    p = F.least(F.lit(1.0), F.col("o_totalprice") / 300_000)
    return (
        orders.withColumn("p", p)
        .filter(hash_bucket("o_orderkey", 1_000_000, seed=11) < F.col("p") * 1_000_000)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.round(1.0 / F.col("p"), 6).alias("ht_weight"),
        )
    )
