"""Skew-mitigation queries: the salted two-stage aggregation and the
salted (exploded) join registered as driver-attested operators.

These prove the operators in ``sas_etl_spark.operators.skew`` are
RESULT-IDENTICAL to their plain one-stage forms — the oracle is the
plain SQL — while their plans spread a hot key across salt_buckets
reducers. At 100 TB these are the shapes you reach for when one key
holds 30% of the rows and AQE's skew handling can't help (it only
splits join-side shuffle partitions, not a groupBy's hot reducer, and
only at runtime).

Fixture note: l_returnflag x l_linestatus has only 6 hot groups over
60k rows at sf0.01 — exactly the everything-lands-on-6-reducers shape
salting exists for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.skew import explode_salt_join, salted_agg
from sas_etl_spark.registry import query


@query(
    "q_skew_salted_agg",
    oracle="""
    select l_returnflag, l_linestatus,
           cast(count(l_quantity) as bigint) as n,
           round(sum(l_quantity), 2) as total_qty,
           round(max(l_extendedprice), 2) as max_price
    from lineitem
    group by l_returnflag, l_linestatus
    """,
    tags=("agg", "scale"),
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over deliberately hot keys (6
    groups, 60k rows): stage 1 groups by (keys, salt) so each hot key
    spreads over 16 reducers, stage 2 merges partials by the true keys
    — a shuffle of only groups x salt_buckets rows. The oracle is the
    PLAIN one-stage GROUP BY: hash equality proves salting is
    semantics-preserving for mergeable aggregates (sum/count/min/max;
    SAS analog: the manual split-and-union idiom around a hot BY
    group)."""
    items = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        items,
        ["l_returnflag", "l_linestatus"],
        {
            "n": ("count", "l_quantity"),
            "total_qty": ("sum", "l_quantity"),
            "max_price": ("max", "l_extendedprice"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        F.round("total_qty", 2).alias("total_qty"),
        F.round("max_price", 2).alias("max_price"),
    )


@query(
    "q_skew_salted_join",
    oracle="""
    select o.o_orderpriority, cast(count(*) as bigint) as n_items
    from lineitem l join orders o on l.l_orderkey = o.o_orderkey
    group by o.o_orderpriority
    """,
    tags=("join", "scale"),
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the big (skewed) side gets a deterministic-
    per-plan salt, the small side is exploded across all 16 salt
    values, and the join key becomes (key, salt) — so one hot order
    key can no longer pin a single reducer. The oracle is the PLAIN
    join: hash equality proves the salt explode/strip round-trip
    changes data placement, never results. Use when the skew is known
    a priori and the small side is too big to broadcast but cheap to
    replicate 16x."""
    items = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = explode_salt_join(
        items.withColumnRenamed("l_orderkey", "o_orderkey"),
        orders,
        on="o_orderkey",
        salt_buckets=16,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items")
    )
