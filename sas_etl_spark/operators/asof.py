"""As-of (most-recent-prior) lookup (SURVEY.md §2.3 #27).

SAS has no first-class as-of join; it is emulated with MERGE+RETAIN
over interleaved sorted rows. The Spark-first design uses exactly that
shape — a single ordered window over the (already unioned) event rows,
carrying the last reference value forward — instead of the naive
``t1 JOIN t2 ON key AND t2.ts < t1.ts`` which blows up quadratically
per key. Cost: one hash-partition + sort per key group; no row
multiplication; survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Column | str


def most_recent_prior(
    df: DataFrame,
    partition_by: Sequence[ColumnOrName],
    order_by: Sequence[ColumnOrName],
    source_pred: Column,
    value: ColumnOrName,
    out_col: str,
) -> DataFrame:
    """Carry the latest ``value`` from rows matching ``source_pred``
    strictly before the current row (per partition, in order).

    Returns all rows of ``df`` with ``out_col`` added (null when no
    prior source row exists).
    """
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    source_val = F.when(source_pred, F.col(value) if isinstance(value, str) else value)
    return df.withColumn(out_col, F.last(source_val, ignorenulls=True).over(w))
