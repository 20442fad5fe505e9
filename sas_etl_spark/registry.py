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

#: Driver-facing emission order. The verify harness attests the FIRST 50
#: entries of ``queries()`` in dict order (hard cap, measured in round 1),
#: so each round this list leads with the queries that most need a fresh
#: green row: previously-unattested operators, queries whose plan changed
#: this round, and brand-new queries — followed by a few always-green
#: sentinels to guard regressions. Names not listed keep registration
#: order after the prioritized block; names listed but not registered are
#: an error (pinned by tests/test_registry_order.py).
DRIVER_PRIORITY: tuple[str, ...] = (
    # -- round-1 unattested: row transforms / scalars (SURVEY §2.2, §2.8)
    "q_project_rename",
    "q_filter_pred",
    "q_derive_cols",
    "q_case_when",
    "q_format_lookup",
    "q_string_funcs",
    "q_string_funcs2",
    "q_regex_extract",
    "q_date_funcs",
    "q_date_format",
    "q_math_rowwise",
    "q_array_ops",
    "q_json_extract",
    "q_missing_semantics",
    # -- round-1 unattested: windows (§2.5)
    "q_window_rank",
    "q_sessionize",
    "q_running_total",
    "q_moving_avg",
    "q_rank_ntile",
    "q_rank_ties_mean",
    "q_dedup_firstlast",
    # -- round-1 unattested: sorts / dedup / set ops (§2.6, §2.7)
    "q_topn_sort",
    "q_nodupkey",
    "q_dupout",
    "q_distinct_rows",
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    # -- round-1 unattested: reshapes / stats / UDF lane (§2.4, §2.11)
    "q_unpivot",
    "q_pivot_api",
    "q_corr_stats",
    "q_univariate_moments",
    "q_freq_chisq",
    "q_udf_charge",
    "q_udaf_weighted",
    "q_grouped_zscore",
    # -- changed this round (need re-attestation)
    "q_approx_percentile",
    "q_knn_cosine",
    "q_multimodal_features",
    "q_lang_id",
    # -- new this round
    "q_knn_ivf_exactprobe",
    "q_stream_dedup",
    "q_bucketed_join",
    # -- always-green sentinels (round-1 pass) to catch regressions
    "q_pricing_summary",
    "q_join3_revenue",
    "q_near_dup_minhash",
    "q_merge_in_flags",
    "q_asof_event",
    "q_percentiles",
)


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


def _driver_order() -> list[str]:
    """Registry names, DRIVER_PRIORITY block first, rest in registration order."""
    prioritized = [n for n in DRIVER_PRIORITY if n in QUERIES]
    seen = set(prioritized)
    return prioritized + [n for n in QUERIES if n not in seen]


def queries_map() -> dict[str, QueryFn]:
    """The driver-facing ``queries()`` payload (DRIVER_PRIORITY order)."""
    _load_all()
    return {name: QUERIES[name].fn for name in _driver_order()}


def oracle_sql_map() -> dict[str, str]:
    """The driver-facing ``oracle_sql()`` payload (SQL-expressible only)."""
    _load_all()
    return {
        name: QUERIES[name].oracle
        for name in _driver_order()
        if QUERIES[name].oracle
    }
