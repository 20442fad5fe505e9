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
    # ROUND 6 window (VERDICT r5 items 1, 4, 6). Green rows are
    # CUMULATIVE across rounds; after r5 the union covers all queries,
    # but 28 of them haven't had a driver-green row since r2. Window
    # composition (50 = 14 + 4 + 3 + 28 + 1): (a) the 14 queries NEW
    # this round, (b) the 4 graduated rows-only -> oracle-paired,
    # (c) the 3 whose code changed, (d) ALL 28 r2-stale re-attests,
    # (e) one timestamp-flip reader re-attest. Every query's newest
    # green row is r4+ after r6; the remaining timestamp-flip readers
    # (r4/r5-green on the projected-cast plan, value-identical on the
    # native-TIMESTAMP plan, locally parity-proven every pytest run)
    # rotate in r7.
    # -- new in round 6
    "q_interleave",
    "q_rank_tie_modes",
    "q_crosstab_pct",
    "q_repetition_ratio",
    "q_ngram_contamination",
    "q_unigram_logprob",
    "q_embed_quantize",
    "q_format_ranges",
    "q_pivot_multi",
    "q_merge_many_to_many",
    "q_fixedwidth_roundtrip",
    "q_stream_stateful_totals",
    "q_market_basket",
    "q_weighted_stats",
    # -- graduated rows-only -> oracle-paired this round (new oracles)
    "q_sample",
    "q_approx_distinct",
    "q_approx_percentile",
    "q_knn_ivf",
    # -- code changed this round (literal casts NTZ->TIMESTAMP; knn
    # partition-gate rework dropped the .rdd touch)
    "q_quality_checks",
    "q_rfm_segments",
    "q_knn_cosine",
    # -- newest green row is r2: full re-attestation (oldest first)
    "q_join3_revenue",
    "q_pricing_summary",
    "q_window_rank",
    "q_case_when",
    "q_derive_cols",
    "q_filter_pred",
    "q_format_lookup",
    "q_project_rename",
    "q_string_funcs",
    "q_string_funcs2",
    "q_regex_extract",
    "q_math_rowwise",
    "q_rank_ntile",
    "q_rank_ties_mean",
    "q_running_total",
    "q_union_distinct",
    "q_intersect",
    "q_nodupkey",
    "q_distinct_rows",
    "q_dupout",
    "q_udf_charge",
    "q_udaf_weighted",
    "q_grouped_zscore",
    "q_pivot_api",
    "q_unpivot",
    "q_corr_stats",
    "q_univariate_moments",
    "q_freq_chisq",
    # -- timestamp-contract flip: events.ts / o_orderdate / l_shipdate
    # readers whose scan type path changed this round (r4/r5 green
    # rows were recorded on the projected-cast plan)
    # (q_sessionize and q_dedup_firstlast run in bench.py every round
    # regardless; the other timestamp-flip re-attests rotate in r7)
    "q_interp_linear",
)

#: ROUND 7 window backlog — lead the next rotation with these (in
#: addition to anything new/changed in r7): (1) queries registered in
#: late round 6 AFTER the 50 slots filled (q_linear_regression,
#: q_autocorr, q_argmax, q_schema_evolution, q_rolling_stats,
#: q_business_days, q_pps_sample, q_cogroup_reconcile,
#: q_text_normalize, q_chunk_docs, q_pii_redact, q_keyword_extract,
#: q_mode_per_group, q_outlier_mad, q_ewma, q_partial_agg_merge,
#: q_correlated_subquery, q_top_paths, q_benford, q_psi_drift,
#: q_class_balance, q_forget_user, q_incremental_dedup,
#: q_inverted_index, q_skipgrams, q_embed_dim_stats,
#: q_spearman_corr, q_weighted_median, q_dedup_stats,
#: q_cross_source_dups, q_url_extract, q_fuzzy_match, q_pctldef,
#: q_chunk_dedup, q_point_in_time_join, q_winsorize, q_pagerank,
#: q_stream_cdc_upsert, q_activity_streaks, q_length_histogram_log2,
#: q_impute_group_mean, q_cramers_v, q_json_nested,
#: q_sliding_distinct_users, q_referential_integrity, q_kfold_assign,
#: q_share_of_parent, q_topk_other, q_date_dim, q_latency_percentiles,
#: q_max_concurrency, q_golden_record, q_hierarchy_flatten,
#: q_systematic_sample, q_new_vs_returning, q_mom_growth,
#: q_bigram_logprob, q_pmi_scores, q_char_entropy, q_gini, q_hhi,
#: q_anomaly_days —
#: local-parity-proven, never driver-attested), (2) the
#: timestamp-flip readers that ceded r6 slots (q_sessionize,
#: q_asof_event, q_gap_fill, q_moving_avg, q_dedup_firstlast,
#: q_tumbling_counts, q_funnel, q_cohort_retention, q_date_funcs,
#: q_date_format, q_intnx_intck), (3) then r4-green sentinels oldest
#: first.


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
