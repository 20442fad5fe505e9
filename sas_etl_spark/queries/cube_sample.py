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


@query("q_approx_percentile", oracle=None, tags=("agg", "approx", "scale"))
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles — the 100 TB twin of q_percentiles
    (mergeable, bounded memory; exact percentile buffers each group).
    Rows-only: accuracy-vs-exact pinned by a unit test instead.

    The sketch returns array<double>; project it to scalar p25/p50/p75
    columns — registry rule: no array/struct/map in a registered query's
    output (the driver's pandas canonicalizer can't hash them)."""
    li = load_table(spark, sf_dir, "lineitem")
    sketch = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 10_000).alias("approx_q")
    )
    return sketch.select(
        "l_returnflag",
        F.element_at("approx_q", 1).alias("p25"),
        F.element_at("approx_q", 2).alias("p50"),
        F.element_at("approx_q", 3).alias("p75"),
    )


@query("q_sample", oracle=None, tags=("scan", "sample"))
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed (SAS: PROC SURVEYSELECT
    METHOD=SRS). Row membership is engine-specific -> rows-only;
    statistical bounds pinned by a unit test. Sampling happens at the
    scan (no shuffle, no materialization of the unsampled rest)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.sample(fraction=0.1, seed=42).select(
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
