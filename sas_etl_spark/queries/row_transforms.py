"""Row-transform queries (SURVEY.md §2.1-2.2): projection, filter,
derived columns, conditional logic, value remapping."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.functions.formats import value_format
from sas_etl_spark.registry import query

SEGMENT_FMT = {
    "AUTOMOBILE": "AUTO",
    "BUILDING": "BLDG",
    "FURNITURE": "FURN",
    "HOUSEHOLD": "HOME",
    "MACHINERY": "MACH",
}


@query(
    "q_project_rename",
    oracle="""
    select c_custkey as cust_id, c_name as cust_name, c_mktsegment as segment
    from customer
    """,
    tags=("scan",),
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename at scan (SAS: KEEP= / RENAME= dataset
    options). SURVEY.md §2.1 #2,#4. Column pruning reaches the parquet
    reader — ReadSchema lists only these three columns.
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "q_filter_pred",
    oracle="""
    select o_orderkey, o_custkey, o_totalprice, o_orderstatus
    from orders
    where o_orderstatus = 'O'
      and o_totalprice between 1000 and 200000
      and o_orderdate >= timestamp '1996-01-01 00:00:00'
    """,
    tags=("scan",),
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound scan-time predicate (SAS: WHERE= dataset option).
    SURVEY.md §2.1 #3, §2.2 #10. All three conjuncts push down to the
    parquet row-group filter.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(1000, 200000)
        & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")


@query(
    "q_derive_cols",
    oracle="""
    select l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount)               as disc_price,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) as charge,
           cast(year(l_shipdate) as bigint)                 as ship_year
    from lineitem
    """,
    tags=("transform",),
)
def q_derive_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns + type extraction (SAS: DATA-step assignment,
    PUT/date functions). SURVEY.md §2.2 #8,#12.

    Row-wise double arithmetic with identical expression trees is
    bit-identical across engines (unlike aggregation) — no rounding
    needed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_price"),
        (disc * (1 + F.col("l_tax"))).alias("charge"),
        F.year("l_shipdate").cast("long").alias("ship_year"),
    )


@query(
    "q_case_when",
    oracle="""
    select case when o_totalprice < 50000  then 'LOW'
                when o_totalprice < 150000 then 'MID'
                else 'HIGH' end as price_band,
           count(*) as cnt,
           round(avg(o_totalprice), 2) as avg_price
    from orders
    group by 1
    """,
    tags=("transform",),
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional logic (SAS: IF/THEN/ELSE, SELECT/WHEN).
    SURVEY.md §2.2 #9."""
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "LOW")
        .when(F.col("o_totalprice") < 150000, "MID")
        .otherwise("HIGH")
    )
    return (
        orders.select(band.alias("price_band"), "o_totalprice")
        .groupBy("price_band")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
    )


@query(
    "q_format_lookup",
    oracle="""
    select case c_mktsegment
             when 'AUTOMOBILE' then 'AUTO'
             when 'BUILDING'   then 'BLDG'
             when 'FURNITURE'  then 'FURN'
             when 'HOUSEHOLD'  then 'HOME'
             when 'MACHINERY'  then 'MACH'
             else c_mktsegment end as segment_code,
           count(*) as cnt
    from customer
    group by 1
    """,
    tags=("transform", "format"),
)
def q_format_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value remapping (SAS: PROC FORMAT + PUT(x, fmt.)).
    SURVEY.md §2.2 #13. Map-literal expression — codegen'd, no join;
    the broadcast-join variant is functions.formats.join_format.
    """
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.select(
            value_format("c_mktsegment", SEGMENT_FMT).alias("segment_code")
        )
        .groupBy("segment_code")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "q_format_ranges",
    oracle="""
    select o.o_orderkey, o.o_totalprice, f.band
    from orders o
    join (values (0.0,      100000.0, 'low'),
                 (100000.0, 300000.0, 'mid'),
                 (300000.0, 1e9,      'high')) as f(lo, hi, band)
      on o.o_totalprice >= f.lo and o.o_totalprice < f.hi
    """,
    tags=("transform", "join"),
)
def q_format_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-based value remapping (SAS: PROC FORMAT VALUE with
    `low-<100000='low'` range bins + PUT) — the format definition kept
    AS DATA, not compiled into a CASE chain: real shops maintain
    hundred-row format catalogs that change without code edits. The
    tiny range table BROADCASTS and the non-equi predicate runs as a
    BroadcastNestedLoopJoin — inner side is the O(bins) format, so the
    per-row cost is a bounded bin scan, shuffle-free at any fact-table
    size (the CASE-expression twin for literal-known formats is
    q_case_when / q_format_lookup)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    fmt = spark.createDataFrame(
        [(0.0, 100_000.0, "low"), (100_000.0, 300_000.0, "mid"),
         (300_000.0, 1e9, "high")],
        "lo double, hi double, band string",
    )
    return orders.join(
        F.broadcast(fmt),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    ).select("o_orderkey", "o_totalprice", "band")
