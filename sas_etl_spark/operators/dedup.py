"""Deduplication operators — exact family.

SAS analogs (SURVEY.md §2.6 #43-45, §2.9 #51): PROC SORT
NODUPKEY/NODUP/DUPOUT; LLM-pipeline exact text dedup.

Scale notes (SURVEY.md §4.2):
- All variants are hash-partitioned by the dedup key — no global sort.
- ``nodupkey`` deliberately avoids ``dropDuplicates`` (nondeterministic
  "keep" under parallel execution); keep-first is defined by an
  explicit tiebreak order, so results are stable across runs/engines.
- For very wide rows at 100 TB, dedup on ``xxhash64``/``sha2`` of the
  payload instead of the payload itself (see ``exact_dup_counts``'s
  ``hash_col`` option) to shrink shuffle width.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ColumnOrName = Column | str


def nodupkey(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[ColumnOrName],
) -> DataFrame:
    """Keep the first row per key under an explicit order
    (SAS: PROC SORT NODUPKEY with a prior deterministic sort)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dupout(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[ColumnOrName],
) -> DataFrame:
    """The rows NODUPKEY would discard (SAS: DUPOUT= dataset)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .drop("_rn")
    )


def distinct_rows(df: DataFrame) -> DataFrame:
    """Full-row dedup (SAS: PROC SORT NODUP) — hash-based, no sort."""
    return df.distinct()


def exact_dup_counts(
    df: DataFrame,
    cols: Sequence[str],
    count_col: str = "c",
    hash_col: str | None = None,
) -> DataFrame:
    """Groups occurring more than once (duplicate report).

    With ``hash_col``, group on a 256-bit hash of the columns instead
    of the raw values — same result modulo hash collisions, but the
    shuffle carries 32 bytes/row instead of the full payload (the
    100 TB path for long documents).
    """
    if hash_col is not None:
        keyed = df.withColumn(hash_col, F.sha2(F.concat_ws("\x1f", *cols), 256))
        group_cols: list[str] = [hash_col]
    else:
        keyed = df
        group_cols = list(cols)
    return (
        keyed.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(count_col))
        .filter(F.col(count_col) > 1)
    )
