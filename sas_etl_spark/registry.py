"""Query registry: the verified operator surface.

Every operator from SURVEY.md §2 lands here as a ``QuerySpec``:
a named PySpark query callable plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes the
registry to the driver, whose verify compares row-count + schema +
order-insensitive value-hash at sf=0.01.

Parity rules baked into every spec (SURVEY.md §4.3):
- Alias every computed column identically on both sides (the driver
  sorts columns by name before hashing).
- Round floating aggregates identically on both sides: double
  summation order differs between engines, so raw sums can differ in
  the last ulps; round() far above the accumulated error but far below
  data resolution (money sums -> 2dp, unit-scale avgs -> 6dp).
- Cast DuckDB integer sums to BIGINT (DuckDB widens to HUGEINT ->
  arrow decimal128, Spark stays int64).
- Cast Spark row_number()/rank() to long (DuckDB window funcs are
  BIGINT).
- Any LIMIT must sit on a *deterministic total order*: add unique-key
  tiebreaks to every ORDER BY that feeds a LIMIT, on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One verified operator: Spark query + optional DuckDB oracle."""

    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


#: name -> spec; populated by the @query decorator at import time.
QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Register a query function under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so decorators populate QUERIES."""
    import sas_etl_spark.queries  # noqa: F401  (imports submodules)


def queries_map() -> dict[str, QueryFn]:
    """The driver-facing ``queries()`` payload."""
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    """The driver-facing ``oracle_sql()`` payload (SQL-expressible only)."""
    _load_all()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
