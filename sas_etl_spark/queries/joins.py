"""Join queries (SURVEY.md §2.3): MERGE / PROC SQL join class."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query


@query(
    "q_join3_revenue",
    oracle="""
    select n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
    from customer
    join orders   on c_custkey = o_custkey
    join lineitem on l_orderkey = o_orderkey
    join nation   on c_nationkey = n_nationkey
    group by n_name
    """,
    tags=("bench", "join", "flagship"),
)
def q_join3_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation: 3-way equi-join + aggregation (SAS: PROC SQL
    multi-join / MERGE chain + PROC MEANS). SURVEY.md §2.3 #19, #25.

    Scale plan: only the join keys + measures are selected, so the
    parquet scans read 2-3 columns each. nation (25 rows) is broadcast
    explicitly (SAS hash-object analog); lineitem⋈orders and ⋈customer
    shuffle on their keys, where AQE re-plans to broadcast at small SF
    and splits skewed partitions at large SF.
    """
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
