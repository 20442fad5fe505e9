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
    # ROUND 11 window. Composition (50 = 4 + 12 + 13 + 21):
    # -- (a) NEW this round: incremental IVF upsert (VERDICT r10
    # item 2), the stdlib-zlib PNG decode lane (item 6), and the
    # capability-gated transformWithState v2 twin (item 7).
    "q_ivf_upsert",
    "q_ivf_upsert_serve",
    "q_png_features",
    "q_stream_stateful_totals_v2",
    # -- (b) code changed this round, re-attest: the sample-trained
    # IVF build + its serve twin (item 3), the four degenerate-input
    # hardenings from ADVICE r10 (bpe encode/train, bootstrap CI,
    # CUSUM integer accumulators -- batch + streaming share the
    # oracle), the BM25 zero-shuffle rewrite + its two dependents
    # (item 5), the span-dedup exchange diet (item 4), and
    # q_image_features (the shared _decoded_image_stats lane).
    "q_ivf_build",
    "q_ivf_serve",
    "q_bpe_encode",
    "q_bpe_train",
    "q_bootstrap_ci",
    "q_cusum",
    "q_stream_cusum",
    "q_bm25",
    "q_rrf_hybrid",
    "q_retrieval_eval",
    "q_span_dedup",
    "q_image_features",
    # -- (c) the stalest attestations (VERDICT r10 item 1): the 11
    # r5-cohort rows displaced from the r10 window (all carry helper
    # drift), q_knn_cosine (r6 + helper drift), and
    # q_cohort_retention (r8, displaced twice).
    "q_union_all",
    "q_udtf_tokens",
    "q_topn_sort",
    "q_string_distance",
    "q_surrogate_key",
    "q_snapshot_upsert",
    "q_sliding_window",
    "q_session_window",
    "q_rollup",
    "q_prefix_join",
    "q_video_frame_sample",
    "q_knn_cosine",
    "q_cohort_retention",
    # -- (d) regression sentinels, oldest-green-first: the r6 cohort,
    # alphabetical (21 of 46; the rest rotate through r12+).
    "q_approx_percentile",
    "q_case_when",
    "q_corr_stats",
    "q_crosstab_pct",
    "q_derive_cols",
    "q_distinct_rows",
    "q_dupout",
    "q_embed_quantize",
    "q_filter_pred",
    "q_fixedwidth_roundtrip",
    "q_format_lookup",
    "q_format_ranges",
    "q_freq_chisq",
    "q_grouped_zscore",
    "q_interleave",
    "q_interp_linear",
    "q_intersect",
    "q_join3_revenue",
    "q_market_basket",
    "q_math_rowwise",
    "q_merge_many_to_many",
)

#: ROUND 11 window bookkeeping rule (learned twice, r7 and r8): NO
#: @query registration lands without, in the SAME commit, (1) a
#: DRIVER_PRIORITY slot — displace the LAST block-(d) sentinel to keep
#: the 50-slot cap, (2) the matching update to
#: tests/test_registry_order.py's must-set, (3) `python
#: scratch/gen_operators_md.py`, and (4) a full-suite rerun on the
#: settled tree. Queries registered this round so far: q_ivf_upsert,
#: q_ivf_upsert_serve, q_png_features, q_stream_stateful_totals_v2
#: (all windowed).
#:
#: ROUND 12 window plan: (1) new/changed queries per the ledger's
#: changed column, then (2) sentinels oldest-green-first — after r11
#: the stalest rows are the remaining 24 r6-cohort rows
#: (q_nodupkey, q_pivot_api, q_pivot_multi, q_pricing_summary,
#: q_project_rename, q_quality_checks, q_rank_ntile, ...; read the
#: full order from OPERATORS.md's Last-attested column).


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
    """Registry names, DRIVER_PRIORITY block first, rest in registration
    order. An unregistered priority name raises: silently skipping it
    would slide other queries into the attestation window and burn the
    slot unnoticed (exactly what happened in round 2)."""
    unknown = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    if unknown:
        raise KeyError(
            f"DRIVER_PRIORITY names unregistered queries: {unknown}; "
            "implement them or remove the names"
        )
    prioritized = list(DRIVER_PRIORITY)
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
