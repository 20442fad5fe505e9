"""Event-stream operators over ordered event tables.

SAS analog: BY user; LAG/RETAIN gap logic in a DATA step (SURVEY.md
§2.9 #57). Implemented as window expressions so the identical logic
runs per-partition in parallel; the streaming twin
(``F.session_window``) lives in sas_etl_spark.streaming.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Column | str


def session_start_flag(
    ts_col: str,
    partition_by: Sequence[ColumnOrName],
    order_by: Sequence[ColumnOrName],
    gap_seconds: int,
) -> Column:
    """1 when a row opens a new session (first row, or gap > threshold).

    Gap is compared in exact integer microseconds (``unix_micros``) —
    float seconds would lose sub-second precision.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    prev_ts = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    return (
        F.when(prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1))
        .otherwise(F.lit(0))
    )


def with_session_id(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 30 * 60,
    tiebreak: str = "event_id",
    out_col: str = "session_id",
) -> DataFrame:
    """Assign per-user session ids: lag-gap flag -> cumulative sum.

    Two stacked windows on the same (partition, order) keys — Catalyst
    reuses one sort+shuffle for both.
    """
    order = [F.col(ts_col), F.col(tiebreak)]
    flag = session_start_flag(ts_col, [user_col], order, gap_seconds)
    w_cum = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("_new_session", flag).withColumn(
        out_col, F.sum("_new_session").over(w_cum).cast("long")
    ).drop("_new_session")


def session_counts_window(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 30 * 60,
    tiebreak: str = "event_id",
    out_col: str = "sessions",
) -> DataFrame:
    """Sessions per user via the lag-gap window (count of session-start
    rows). Streams through a sort — use when per-user event counts are
    unbounded."""
    order = [F.col(ts_col), F.col(tiebreak)]
    flag = session_start_flag(ts_col, [user_col], order, gap_seconds)
    return (
        df.withColumn("_new_session", flag)
        .filter(F.col("_new_session") == 1)
        .groupBy(user_col)
        .agg(F.count(F.lit(1)).alias(out_col))
    )


#: Max per-user events the aggregation-based counter handles (array
#: slice bound); beyond this use session_counts_window.
_MAX_EVENTS_PER_KEY = 2_000_000


def session_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 30 * 60,
    out_col: str = "sessions",
) -> DataFrame:
    """Sessions per user = 1 + number of sorted adjacent gaps over the
    threshold, computed as ONE hash aggregation (collect_list ->
    sort_array -> zip_with adjacent diff). 2x faster than the window
    form locally: no sort-based window machinery, single shuffle.

    Requires each user's event list to fit in task memory (true when
    key cardinality grows with data — SCALE.md); for unbounded keys
    use session_counts_window. Tiebreak is irrelevant here: gaps
    depend only on the sorted timestamps.
    """
    gap_us = gap_seconds * 1_000_000
    ts_sorted = F.sort_array(F.collect_list(F.unix_micros(ts_col)))
    adjacent_diffs = F.zip_with(
        F.slice(ts_sorted, 2, _MAX_EVENTS_PER_KEY), ts_sorted, lambda a, b: a - b
    )  # last pair zips against null -> null -> dropped by the filter
    n_gaps = F.size(F.filter(adjacent_diffs, lambda d: d > gap_us))
    return df.groupBy(user_col).agg((n_gaps + 1).cast("long").alias(out_col))
