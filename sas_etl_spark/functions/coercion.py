"""API ergonomics: accept column names or Column objects everywhere
(pattern adapted from public PySpark wrappers — SNIPPETS.md [1])."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def as_column(x: ColumnOrName) -> Column:
    """Coerce a column name to a Column; pass Columns through."""
    return F.col(x) if isinstance(x, str) else x


def as_columns(xs: tuple[ColumnOrName, ...] | list[ColumnOrName]) -> list[Column]:
    return [as_column(x) for x in xs]
