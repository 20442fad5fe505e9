"""Event-stream queries verified in batch (SURVEY.md §2.10).

The reference class is batch-only; the `events` table is a bounded
stream stand-in. These queries are written against expressions whose
streaming twins (F.window / F.session_window + withWatermark) are
built in sas_etl_spark.streaming — same grouping semantics, verified
here against the batch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.registry import query


@query(
    "q_tumbling_counts",
    oracle="""
    select time_bucket(interval 6 hour, ts) as bucket,
           event_type,
           count(*) as n,
           round(sum(value), 2) as total_value
    from events
    group by 1, 2
    """,
    tags=("events", "streaming"),
)
def q_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour window counts per event type (streaming:
    groupBy(F.window(ts, '6 hours')) — same bucketing, batch-verified).
    SURVEY.md §2.10.

    F.window and DuckDB time_bucket both align buckets to the epoch
    (session tz pinned UTC), so bucket starts agree exactly.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "total_value")
    )


@query(
    "q_sliding_window",
    oracle="""
    with buckets as (
        select distinct time_bucket(interval 3 hour, ts) as b from events
    ),
    starts as (
        select distinct wstart from (
            select b as wstart from buckets
            union all
            select b - interval 3 hour as wstart from buckets
        )
    )
    select s.wstart, count(*) as n
    from starts s
    join events e on e.ts >= s.wstart and e.ts < s.wstart + interval 6 hour
    group by s.wstart
    """,
    tags=("events", "streaming"),
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (6h length, 3h slide) event counts — streaming
    twin: F.window(ts, '6 hours', '3 hours'). SURVEY.md §2.10.

    Spark assigns each row to its length/slide = 2 covering windows
    directly (an internal explode — no self-join). The oracle
    reconstructs identical semantics: every emitted window start is an
    observed 3h bucket or that bucket minus 3h, counted over
    [wstart, wstart+6h). Each such window is provably non-empty, and
    Spark emits exactly that start set — so the inner join loses
    nothing.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )
