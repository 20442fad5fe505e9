"""Value remapping — SAS PROC FORMAT + PUT(x, fmt.) (SURVEY.md §2.2 #13).

Two strategies, same semantics:

- ``value_format``: map-literal lookup compiled into the plan. Right
  for hand-written formats (tens/hundreds of entries) — zero join,
  pure expression, whole-stage codegen.
- ``join_format``: broadcast-join against a lookup DataFrame. Right
  when the format itself is data (thousands+ of entries, or loaded
  from a table) — still no shuffle of the fact side.

Unmapped values keep the original (SAS formats print unmapped values
as-is) unless ``default`` is given, which plays the role of an
``OTHER=`` range.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ColumnOrName = Column | str


def value_format(
    col: ColumnOrName, mapping: Mapping[str, str], default: str | None = None
) -> Column:
    """PUT(col, fmt.) as a map-literal expression."""
    c = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    looked_up = F.create_map(*pairs)[c]
    fallback = F.lit(default) if default is not None else c
    return F.coalesce(looked_up, fallback)


def join_format(
    df: DataFrame,
    col: str,
    mapping: Mapping[str, str],
    out_col: str,
    default: str | None = None,
    spark: SparkSession | None = None,
) -> DataFrame:
    """PUT via broadcast lookup join — the data-driven format path."""
    spark = spark or df.sparkSession
    lookup = spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], schema=f"{col} string, {out_col} string"
    )
    fallback = F.lit(default) if default is not None else F.col(col)
    return df.join(F.broadcast(lookup), on=col, how="left").withColumn(
        out_col, F.coalesce(F.col(out_col), fallback)
    )
