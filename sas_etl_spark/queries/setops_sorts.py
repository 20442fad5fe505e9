"""Set operations, sorts, limits, dedup (SURVEY.md §2.6-2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.dedup import distinct_rows, dupout, nodupkey
from sas_etl_spark.registry import query


@query(
    "q_union_all",
    oracle="""
    select c_custkey as id, c_name as name, 'customer' as src from customer
    union all
    select s_suppkey as id, s_name as name, 'supplier' as src from supplier
    """,
    tags=("setop",),
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenation by name (SAS: ``SET a b;`` / OUTER UNION CORR).
    SURVEY.md §2.7 #46. unionByName is position-independent — the SAS
    SET statement matches variables by name, not position.
    """
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("src"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("src"),
    )
    return customer.unionByName(supplier)


@query(
    "q_interleave",
    oracle="""
    select nk, id, name, src,
           cast(row_number() over (
               partition by nk order by src_ord, id
           ) as bigint) as seq_in_group
    from (
        select c_nationkey as nk, c_custkey as id, c_name as name,
               'customer' as src, 0 as src_ord from customer
        union all
        select s_nationkey, s_suppkey, s_name, 'supplier', 1 from supplier
    ) t
    """,
    tags=("setop", "window"),
)
def q_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleave (SAS: ``SET a b; BY k;``). SURVEY.md §2.7 #50 — the
    BY-group merge of several sorted datasets: output is ordered by the
    BY key, and WITHIN each BY group dataset ``a``'s observations
    precede ``b``'s, each in original order. ``seq_in_group`` pins that
    within-group interleave order verifiably (row_number over
    (src_ord, unique key) per BY group); the across-group order is
    just the BY key, carried by ``nk``. The window is PARTITIONED by
    the BY key — at 100 TB this is a keyed sort per group (plus
    Spark's range-partitioned orderBy if physical output order is
    demanded), never a single-partition global window."""
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("src"),
        F.lit(0).alias("src_ord"),
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk"),
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("src"),
        F.lit(1).alias("src_ord"),
    )
    w = Window.partitionBy("nk").orderBy("src_ord", "id")
    return (
        customer.unionByName(supplier)
        .withColumn("seq_in_group", F.row_number().over(w).cast("long"))
        .drop("src_ord")
    )


@query(
    "q_union_distinct",
    oracle="""
    select c_nationkey as nk from customer
    union
    select s_nationkey as nk from supplier
    """,
    tags=("setop",),
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION with dedup (SAS: PROC SQL UNION). SURVEY.md §2.7 #47."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "q_intersect",
    oracle="""
    select c_nationkey as nk from customer
    intersect
    select s_nationkey as nk from supplier
    """,
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (SAS: PROC SQL INTERSECT). SURVEY.md §2.7 #48."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "q_except",
    oracle="""
    select c_nationkey as nk from customer
    except
    select s_nationkey as nk from supplier where s_acctbal > 8000
    """,
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (SAS: PROC SQL EXCEPT). SURVEY.md §2.7 #49: nations with
    customers but no high-balance supplier (filter keeps the result
    non-empty — suppliers cover every nation).
    subtract() is EXCEPT DISTINCT — a value present anywhere in the
    right side is removed entirely (exceptAll().distinct() would
    wrongly keep values the left has more occurrences of)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 8000)
        .select(F.col("s_nationkey").alias("nk"))
    )
    return c.subtract(s)


@query(
    "q_topn_sort",
    oracle="""
    select o_orderkey, o_custkey, o_totalprice
    from orders
    order by o_totalprice desc, o_orderkey
    limit 50
    """,
    tags=("sort",),
)
def q_topn_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N by sort (SAS: PROC SORT + OBS=50). SURVEY.md §2.6
    #41-42. orderBy().limit() compiles to TakeOrderedAndProject —
    per-partition heap + k-row driver merge, never a full global sort.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(50)


@query(
    "q_nodupkey",
    oracle="""
    select o_custkey, o_orderkey, o_orderdate from (
        select o_custkey, o_orderkey, o_orderdate,
               row_number() over (
                   partition by o_custkey order by o_orderdate, o_orderkey
               ) as rn
        from orders
    ) t where rn = 1
    """,
    tags=("dedup",),
)
def q_nodupkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First order per customer (SAS: PROC SORT BY custkey date;
    NODUPKEY). SURVEY.md §2.6 #43.

    Deliberately NOT dropDuplicates: its kept row is whichever task
    finishes first. keep-first is defined by an explicit tiebreak so
    results are stable across engines and runs (§4.3).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    return nodupkey(
        orders, keys=["o_custkey"], order_by=[F.col("o_orderdate"), F.col("o_orderkey")]
    )


@query(
    "q_dupout",
    oracle="""
    select o_custkey, o_orderkey from (
        select o_custkey, o_orderkey,
               row_number() over (
                   partition by o_custkey order by o_orderdate, o_orderkey
               ) as rn
        from orders
    ) t where rn > 1
    """,
    tags=("dedup",),
)
def q_dupout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The discarded-duplicates side (SAS: DUPOUT=). SURVEY.md §2.6 #45."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    return dupout(
        orders, keys=["o_custkey"], order_by=[F.col("o_orderdate"), F.col("o_orderkey")]
    ).select("o_custkey", "o_orderkey")


@query(
    "q_distinct_rows",
    oracle="""
    select distinct l_returnflag, l_linestatus from lineitem
    """,
    tags=("dedup",),
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row dedup (SAS: PROC SORT NODUP). SURVEY.md §2.6 #44.
    Hash aggregation with map-side partials — no sort."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    return distinct_rows(li)


@query(
    "q_missing_semantics",
    oracle="""
    with x as (
        select o_orderkey,
               nullif(o_orderstatus, 'P') as st,
               case when o_totalprice < 50000 then null
                    else o_totalprice end as price
        from orders
    ),
    ranked as (
        select st, price,
               row_number() over (partition by o_orderkey % 4
                                  order by st asc nulls first, o_orderkey)
                   as rnk
        from x
    )
    select coalesce(st, '_missing_') as status,
           cast(count(*) as bigint) as n_rows,
           cast(count(price) as bigint) as n_price,
           round(coalesce(sum(price), 0), 2) as sum_price,
           cast(min(rnk) as bigint) as first_rank
    from ranked group by st
    """,
    tags=("sort", "semantics"),
)
def q_missing_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAS missing-value semantics in one query (SURVEY.md §4.3):
    missing SORTS LOW (nulls-first ordering — Spark's asc default,
    explicit NULLS FIRST in the oracle since DuckDB defaults last),
    missing forms its own BY group (null grouping), and the SUM/N
    statistics SKIP missing (count(col)/sum ignore nulls) rather than
    propagate. Nulls are introduced deterministically via nullif/case
    so the demonstration is oracle-exact despite null-free fixtures.
    The rank window is hash-partitioned (missing ranks FIRST within
    every partition, min(rnk)=1 for the null group) — the ordering
    proof without a global single-partition sort."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    x = orders.select(
        "o_orderkey",
        F.nullif("o_orderstatus", F.lit("P")).alias("st"),
        F.when(F.col("o_totalprice") < 50000, None)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    w = Window.partitionBy(F.col("o_orderkey") % 4).orderBy(
        F.asc_nulls_first("st"), F.asc("o_orderkey")
    )
    ranked = x.select(
        "st", "price", F.row_number().over(w).cast("long").alias("rnk")
    )
    return ranked.groupBy("st").agg(
        F.coalesce(F.first("st"), F.lit("_missing_")).alias("status"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("price").alias("n_price"),
        F.round(F.coalesce(F.sum("price"), F.lit(0.0)), 2).alias("sum_price"),
        F.min("rnk").alias("first_rank"),
    ).drop("st")
