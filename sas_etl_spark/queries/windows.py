"""Window / ordered queries (SURVEY.md §2.5, §2.9 #57)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.events import session_counts
from sas_etl_spark.operators.windows import top_k_per_group
from sas_etl_spark.registry import query


@query(
    "q_window_rank",
    oracle="""
    select * from (
        select o_custkey, o_orderkey, o_totalprice,
               row_number() over (
                   partition by o_custkey
                   order by o_totalprice desc, o_orderkey
               ) as rn
        from orders
    ) t where rn <= 3
    """,
    tags=("bench", "window"),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (SAS: PROC SORT + FIRST.
    counter / _N_ within BY group). SURVEY.md §2.4 #34, §2.5 #37.

    o_orderkey tiebreak makes the kept rows deterministic across
    engines. Hash-partitioned by customer — scales with key
    cardinality, no global sort.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    ranked = top_k_per_group(
        orders,
        partition_by=["o_custkey"],
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )
    return ranked


@query(
    "q_dedup_firstlast",
    oracle="""
    select user_id, min(ts) as first_ts, max(ts) as last_ts, count(*) as n
    from events
    group by user_id
    """,
    tags=("bench", "agg", "events"),
)
def q_dedup_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event per user (SAS: BY user; FIRST./LAST.
    subsetting). SURVEY.md §2.4 #33.

    min/max, not a window: a whole-row FIRST. would need an ordered
    window; for timestamps alone, min/max aggregates are one partial-
    agg shuffle with no sort.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_sessionize",
    oracle="""
    select user_id, count(*) as sessions from (
        select user_id,
               case when lag(ts) over (partition by user_id order by ts, event_id) is null
                         or ts - lag(ts) over (partition by user_id order by ts, event_id)
                            > interval 30 minute
                    then 1 else 0 end as new_s
        from events
    ) t where new_s = 1
    group by user_id
    """,
    tags=("bench", "window", "events"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessions per user with a 30-minute inactivity gap (SAS: BY
    user + LAG gap logic). SURVEY.md §2.9 #57.

    Batch twin of streaming session_window; gap compared in exact
    integer microseconds. event_id tiebreak pins the lag order.
    """
    events = load_table(spark, sf_dir, "events")
    return session_counts(events, gap_seconds=30 * 60)
