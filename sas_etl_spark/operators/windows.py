"""Ordered/window operators.

SAS analogs (SURVEY.md §2.2 #14-16, §2.4 #33-34, §2.5): BY-group
processing with ``FIRST./LAST.``, ``RETAIN`` running totals, ``LAG``,
``_N_`` row numbering, PROC RANK. SAS relies on physical row order; we
materialize order only inside window frames with explicit keys —
never physical order — so plans stay shuffle-parallel (SURVEY.md §1.3).

Scale note: every window here has a ``partitionBy``. A global window
(no partition) serializes to one task and is banned by the 100 TB
design rule (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

ColumnOrName = Column | str


def ordered_window(
    partition_by: Sequence[ColumnOrName], order_by: Sequence[ColumnOrName]
) -> WindowSpec:
    """Window partitioned + ordered by explicit keys (SAS BY-group)."""
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def row_number_long(w: WindowSpec) -> Column:
    """row_number() as int64 — matches DuckDB/ANSI BIGINT window funcs."""
    return F.row_number().over(w).cast("long")


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[ColumnOrName],
    order_by: Sequence[ColumnOrName],
    k: int,
    rn_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group (SAS: PROC SORT + FIRST. counter).

    ``order_by`` must be a deterministic total order within each group
    (include a unique tiebreak) or the kept rows are engine-dependent.
    """
    w = ordered_window(partition_by, order_by)
    return df.withColumn(rn_col, row_number_long(w)).filter(F.col(rn_col) <= k)


def running_total(
    df: DataFrame,
    value: ColumnOrName,
    partition_by: Sequence[ColumnOrName],
    order_by: Sequence[ColumnOrName],
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative sum (SAS: RETAIN / sum statement within BY group)."""
    w = ordered_window(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(value).over(w))


def moving_avg(
    df: DataFrame,
    value: ColumnOrName,
    partition_by: Sequence[ColumnOrName],
    order_by: Sequence[ColumnOrName],
    preceding: int,
    out_col: str = "moving_avg",
) -> DataFrame:
    """Trailing moving average over the last ``preceding``+1 rows."""
    w = ordered_window(partition_by, order_by).rowsBetween(-preceding, 0)
    return df.withColumn(out_col, F.avg(value).over(w))
