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
    # ROUND 10 window (VERDICT r9 items 1/3). Composition (50 = 2 + 5
    # + 17 + 26):
    # -- (a) NEW this round: the persisted-IVF-index regime split —
    # build+publish+read-back attestation and the serve-only batched
    # top-k (the r9 verdict's one weak component, item 1).
    "q_ivf_build",
    "q_ivf_serve",
    # -- (b) code changed this round: ivf_assign/kmeans_refine grew
    # the cross-engine determinism knobs (sim/mean rounding) and
    # ivf_topk_batch was refactored onto ivf_lists +
    # ivf_topk_batch_from (same plan, shared with the serve path) —
    # the three IVF-family queries re-attest against the refactor;
    # minhash.py's hashed_shingles docstring + a return annotation
    # changed (ledger is textual), so its two dependents re-attest
    # too. q_knn_ivf_batch also lost its bench_llm tag to q_ivf_serve.
    "q_knn_ivf_exactprobe",
    "q_knn_ivf",
    "q_knn_ivf_batch",
    "q_near_dup_minhash",
    "q_incremental_neardup",
    # -- (c) regression sentinels, oldest-green-first: the 17 r4
    # holdovers displaced from the r9 window (the full r4 cohort).
    "q_orc_roundtrip",
    "q_pack_sequences",
    "q_partitioned_write",
    "q_proc_sql",
    "q_remerge_share",
    "q_scd2_merge",
    "q_semi_join",
    "q_simhash_fingerprints",
    "q_skew_salted_agg",
    "q_skew_salted_join",
    "q_split_hash",
    "q_stratified_sample",
    "q_text_stats",
    "q_text_tokens",
    "q_tfidf",
    "q_token_count",
    "q_update_master",
    # -- (d) the r5 cohort, alphabetical; the TAIL of this block cedes
    # slots to later round-10 registrations (planned: q_bpe_encode,
    # q_pretrain_pipeline), exactly as the r9 window rotated.
    "q_ab_test",
    "q_array_ops",
    "q_audio_features",
    "q_curation_pipeline",
    "q_distinct_count",
    "q_dup_clusters",
    "q_event_transitions",
    "q_except",
    "q_histogram",
    "q_image_resize",
    "q_json_extract",
    "q_merge_in_flags",
    "q_missing_semantics",
    "q_multimodal_features",
    "q_pipeline_spec",
    "q_pivot_status",
    # -- (e) registered later in round 10, displacing tail (d)
    # sentinels: the tokenizer APPLY (VERDICT r9 item 6), the
    # full-pipeline capstone composite (item 5), the multi-generation
    # BPE training loop, multi-touch attribution, seasonal
    # decomposition, and bounded-memory heavy hitters.
    "q_bpe_encode",
    "q_pretrain_pipeline",
    "q_bpe_train",
    "q_attribution",
    "q_stl_decompose",
    "q_heavy_hitters",
    "q_bootstrap_ci",
    "q_triangles",
    "q_cusum",
    "q_stream_cusum",
    # (q_union_all, q_udtf_tokens, q_topn_sort, q_string_distance,
    # q_surrogate_key, q_snapshot_upsert, q_sliding_window,
    # q_session_window, q_rollup, and q_prefix_join ceded their slots
    # to these ten; q_video_frame_sample is the r5 cohort's 27th
    # member — all eleven wait for round 11 with the r6 cohort.)
)

#: ROUND 10 window bookkeeping rule (learned twice, r7 and r8): NO
#: @query registration lands without, in the SAME commit, (1) a
#: DRIVER_PRIORITY slot — displace the LAST block-(d) sentinel to keep
#: the 50-slot cap, (2) the matching update to
#: tests/test_registry_order.py's must-set, (3) `python
#: scratch/gen_operators_md.py`, and (4) a full-suite rerun on the
#: settled tree. Queries registered this round so far: q_ivf_build,
#: q_ivf_serve, q_bpe_encode, q_pretrain_pipeline, q_bpe_train,
#: q_attribution, q_stl_decompose, q_heavy_hitters,
#: q_bootstrap_ci, q_triangles, q_cusum, q_stream_cusum (all
#: windowed).
#:
#: ROUND 11 window plan: (1) new/changed queries per the ledger's
#: changed column, then (2) sentinels oldest-green-first — after r10
#: the stalest rows are q_video_frame_sample (r5) and the r6 cohort
#: (q_approx_percentile, q_case_when, q_corr_stats, q_crosstab_pct,
#: q_derive_cols, q_distinct_rows, q_dupout, q_embed_quantize,
#: q_filter_pred, q_fixedwidth_roundtrip, q_format_lookup,
#: q_format_ranges, q_freq_chisq, q_grouped_zscore, ...; read the
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
