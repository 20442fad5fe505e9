"""Row-wise statistics with SAS missing-value semantics.

SAS ``SUM(of x1-x3)`` / ``MEAN(of ...)`` skip missing values and
return missing only when ALL arguments are missing — unlike ``+``,
which propagates missing (SURVEY.md §2.8 Math, §4.3). These helpers
reproduce that contract as null-aware column expressions (pure
Catalyst, codegen-friendly; no UDF).
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _cols(cols: tuple[ColumnOrName, ...]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def _all_null(cols: list[Column]) -> Column:
    return functools.reduce(operator.and_, (c.isNull() for c in cols))


def sas_sum(*cols: ColumnOrName) -> Column:
    """SUM(of ...) — null-skipping sum; null only if all-null."""
    cs = _cols(cols)
    total = functools.reduce(operator.add, (F.coalesce(c, F.lit(0.0)) for c in cs))
    return F.when(_all_null(cs), F.lit(None)).otherwise(total)


def sas_mean(*cols: ColumnOrName) -> Column:
    """MEAN(of ...) — null-skipping mean; null only if all-null."""
    cs = _cols(cols)
    total = functools.reduce(operator.add, (F.coalesce(c, F.lit(0.0)) for c in cs))
    n = functools.reduce(
        operator.add, (F.when(c.isNotNull(), 1).otherwise(0) for c in cs)
    )
    return F.when(_all_null(cs), F.lit(None)).otherwise(total / n)


def sas_min(*cols: ColumnOrName) -> Column:
    """MIN(of ...) — ``least`` already skips nulls in Spark."""
    return F.least(*_cols(cols))


def sas_max(*cols: ColumnOrName) -> Column:
    """MAX(of ...) — ``greatest`` already skips nulls in Spark."""
    return F.greatest(*_cols(cols))
