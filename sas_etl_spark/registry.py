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
    # ROUND 7 window (VERDICT r6 item 1: drain the never-attested
    # backlog). Composition (50 = 46 + 4): (a) 46 of the 62 round-6
    # registrations that have never been inside a driver window (all
    # locally hash-green every pytest run via test_oracle_parity),
    # (b) the 4 queries OPERATORS.md's function-level ledger flags as
    # code-changed since their newest green row — q_knn_ivf (k-means
    # refined centroids, nprobe 4->3), q_range_join / q_ship_priority
    # (size-gated broadcasts), and q_jaccard_pairs (the ledger's
    # first catch: edited after its r4 attestation, never re-attested).
    # The 16 deferred backlog names + the 11 timestamp-flip re-attests
    # are the ROUND 8 comment below.
    # -- (b) code changed since newest green row (ledger: "changed")
    "q_knn_ivf",
    "q_range_join",
    "q_ship_priority",
    "q_jaccard_pairs",
    # -- (a) never driver-attested backlog, registration order; the
    # five marked * also changed code this round (broadcast gating /
    # degenerate-division guards), making them doubly due
    "q_linear_regression",
    "q_autocorr",
    "q_argmax",
    "q_schema_evolution",
    "q_rolling_stats",
    "q_business_days",
    "q_pps_sample",
    "q_cogroup_reconcile",
    "q_text_normalize",
    "q_chunk_docs",
    "q_pii_redact",
    "q_keyword_extract",
    "q_mode_per_group",  # *
    "q_outlier_mad",  # *
    "q_ewma",
    "q_partial_agg_merge",
    "q_correlated_subquery",
    "q_top_paths",
    "q_benford",
    "q_psi_drift",
    "q_class_balance",
    "q_forget_user",
    "q_incremental_dedup",
    "q_inverted_index",
    "q_skipgrams",
    "q_embed_dim_stats",
    "q_spearman_corr",
    "q_weighted_median",
    "q_dedup_stats",
    "q_cross_source_dups",
    "q_url_extract",
    "q_fuzzy_match",
    "q_pctldef",
    "q_chunk_dedup",
    "q_point_in_time_join",
    "q_winsorize",
    "q_pagerank",
    "q_stream_cdc_upsert",
    "q_activity_streaks",
    "q_length_histogram_log2",
    "q_referential_integrity",
    "q_share_of_parent",
    "q_topk_other",  # *
    "q_gini",
    "q_hhi",  # *
    "q_anomaly_days",  # *
)

#: ROUND 8 window plan — lead the next rotation with (in addition to
#: anything new/changed in r8; cross-check OPERATORS.md, the ledger
#: computes all of this from CORRECTNESS_r*.json + git):
#: (1) the 16 backlog names deferred from r7's window
#: (q_impute_group_mean, q_cramers_v, q_json_nested,
#: q_sliding_distinct_users, q_kfold_assign, q_date_dim,
#: q_latency_percentiles, q_max_concurrency, q_golden_record,
#: q_hierarchy_flatten, q_systematic_sample, q_new_vs_returning,
#: q_mom_growth, q_bigram_logprob, q_pmi_scores, q_char_entropy —
#: plus q_domain_mixture and q_mixture_epochs, registered in round 7
#: after the window was composed — after r7 these are the ONLY
#: never-attested queries),
#: (2) the timestamp-flip readers whose newest green row predates the
#: round-6 native-TIMESTAMP scan change (q_sessionize, q_asof_event,
#: q_gap_fill, q_moving_avg, q_dedup_firstlast, q_tumbling_counts,
#: q_funnel, q_cohort_retention, q_date_funcs, q_date_format,
#: q_intnx_intck), (3) then r4-green sentinels oldest first.


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
