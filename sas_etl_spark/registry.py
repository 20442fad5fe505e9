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
    # ROUND 8 window (VERDICT r7 item 2: FINISH attestation — after
    # this window every registered query has been driver-proven at
    # least once and nothing is stale across the round-6 timestamp
    # reader change). Composition (50 = 13 + 18 + 17 + 2):
    # -- (a) NEW this round, never attested by construction:
    # q_mixture_apply (executes the mixture plan as rows, VERDICT r7
    # item 5), q_knn_ivf_batch (Q=100 batched ANN, item 7), the
    # retrieval pair (Okapi BM25 + RRF hybrid search, queries/
    # retrieval.py), q_epoch_shuffle (deterministic training order
    # over the mixed corpus — the third leg of the mixture lane), and
    # q_containment_pairs (asymmetric short-in-long dedup) +
    # q_ngram_diversity (corpus-level mode-collapse readout)
    "q_mixture_apply",
    "q_knn_ivf_batch",
    "q_bm25",
    "q_rrf_hybrid",
    "q_epoch_shuffle",
    "q_containment_pairs",
    "q_ngram_diversity",
    # (a, continued) the quality-selection + sampling closers added
    # later in round 8: the Gopher multi-rule gate, per-source quality
    # pruning (the scoring lane's plan->apply step), the span-dedup
    # REWRITE (q_chunk_dedup reports; this produces the deduped
    # corpus), and the fixed-k deterministic reservoir
    "q_gopher_rules",
    "q_quality_prune",
    "q_span_dedup",
    "q_reservoir_sample",
    # (a, continued) the alpha=1/2 temperature mixture (isqrt-exact
    # smoothed domain balancing) and the near-dup cluster APPLY (the
    # dedup lane's plan->apply closure)
    "q_temperature_mixture",
    "q_neardup_apply",
    # -- (b) the 18 queries never inside a driver window after r7
    # (16 deferred from the r7 cap + the two domain-mixing ops
    # registered after r7's window was composed; the mixture pair
    # also changed code this round — DECIMAL(38) widening — making
    # them doubly due). All locally hash-green every pytest run.
    "q_domain_mixture",
    "q_mixture_epochs",
    "q_impute_group_mean",
    "q_cramers_v",
    "q_json_nested",
    "q_sliding_distinct_users",
    "q_kfold_assign",
    "q_date_dim",
    "q_latency_percentiles",
    "q_max_concurrency",
    "q_golden_record",
    "q_hierarchy_flatten",
    "q_systematic_sample",
    "q_new_vs_returning",
    "q_mom_growth",
    "q_bigram_logprob",
    "q_pmi_scores",
    "q_char_entropy",
    # -- (c) re-attests: the 11 timestamp-flip readers (VERDICT r7
    # item 2 / gap 2 — newest driver-green row predates the round-6
    # native-TIMESTAMP scan change) + 3 r8 plan reworks measured at
    # sf10 (q_approx_distinct: split mixed distinct/sketch agg, 12x;
    # q_spearman_corr / q_weighted_median: histogram ranks instead of
    # few-group row windows, 3.9x / 29x; q_percentiles / q_winsorize:
    # histogram order statistics instead of value-buffering
    # percentile(), killing the per-group OOM risk; q_pctldef:
    # bucketed two-level exact rank, 2.5x and no corpus-wide window)
    "q_approx_distinct",
    "q_spearman_corr",
    "q_weighted_median",
    "q_percentiles",
    "q_winsorize",
    "q_pctldef",
    "q_sessionize",
    "q_asof_event",
    "q_gap_fill",
    "q_moving_avg",
    "q_dedup_firstlast",
    "q_tumbling_counts",
    "q_funnel",
    "q_cohort_retention",
    "q_date_funcs",
    "q_date_format",
    "q_intnx_intck",
    # -- (d) regression sentinels: oldest driver-green rows (all r4) —
    # refresh the stalest attestations with the slots left over. Six
    # r4 sentinels (q_anti_join, q_append_sink, q_cube,
    # q_dataset_compare, q_doc_quality, q_knn_ivf_exactprobe) gave
    # their slots to the block-(a) late additions; they rejoin the r9
    # stalest list below.
    "q_bucketed_join",
    "q_exact_dup",
)

#: ROUND 9 window plan — after r8 lands, the never-attested backlog is
#: EMPTY: every registered query has a driver-green row and none
#: predates the timestamp reader change. Compose future windows as:
#: (1) anything new/changed in the round (the OPERATORS.md ledger
#: computes "changed since newest green row" from CORRECTNESS_r*.json
#: + function-level git diff — NOTE the ledger tracks QUERY functions,
#: not shared helpers: round 8 changed streaming/builders.stream_events
#: (directory-layout source fix) without flagging the 8 q_stream_*
#: queries, so give those re-attest slots in r9 even though their
#: ledger rows read "clean"), then (2) sentinels oldest-green-first
#: (after r8 the stalest rows are the r4 queries not refreshed here:
#: q_anti_join, q_append_sink, q_cube, q_dataset_compare,
#: q_doc_quality, q_knn_ivf_exactprobe,
#: q_contamination, q_cosine_pairs, q_csv_roundtrip, q_doc_embed_join,
#: q_doc_fingerprint, q_grouping_sets,
#: q_image_features, q_json_roundtrip, q_lang_id,
#: q_left_join_null,
#: q_min_per_group_join, q_multi_split,
#: q_near_dup_embedding, q_near_dup_simhash, q_orc_roundtrip,
#: q_pack_sequences, q_partitioned_write, q_proc_sql,
#: q_remerge_share, q_scd2_merge, q_semi_join, ...).


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
