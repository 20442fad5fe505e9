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
    # ROUND 9 window (VERDICT r8 items 1-2). Composition (50 = 1 + 8 +
    # 9 + 12 + 20):
    # -- (a) the one never-attested query: registered in round 8's
    # final snapshot commit after the window ran (locally parity-proven
    # by test_oracle_parity every suite run; needs its driver row).
    "q_semantic_decontam",
    # -- (b) the 8 streaming queries whose shared source helper
    # (streaming/builders.stream_events, directory-layout fix, r8
    # commit d8d09d6) changed AFTER their newest green rows — the
    # ledger's old query-function-only hash was blind to helpers
    # (fixed this round: transitive-callee hashing), so these rows
    # read "clean" while attesting stale code.
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_join",
    "q_stream_stateful_totals",
    "q_stream_exactly_once_sink",
    "q_stream_cdc_upsert",
    # -- (c) code changed THIS round (ADVICE r8): q_temperature_mixture
    # re-seeded 11->19 (its membership draw was bit-identical to the
    # MIX_RESID_SEED residual draw), q_mixture_apply rebuilt as
    # plan-LEFT-JOIN-counts (zero-copy sources now emit zeroed rows,
    # matching the oracle), and the exact_percentiles_hist helper now
    # filters NULL values (its two callers re-attest). The five
    # bench_llm-tagged queries join them: adding the tag edits the
    # decorated segment, and the ledger (rightly) can't distinguish a
    # benign tag edit from a semantic one — the rule is textual.
    "q_temperature_mixture",
    "q_mixture_apply",
    "q_percentiles",
    "q_winsorize",
    "q_bm25",
    "q_rrf_hybrid",
    "q_knn_ivf_batch",
    "q_ngram_diversity",
    "q_span_dedup",
    # -- (c2) NEW this round: the containment join's production
    # posture (exact dedup first, containment on distinct texts —
    # VERDICT r8 item 5), plus three surface-widening operators: BPE
    # merge-candidate counting (tokenizer induction's per-iteration
    # shape), CCNet-style per-language perplexity terciles, and a
    # k-anonymity privacy audit.
    "q_dedup_containment",
    "q_bpe_merges",
    "q_ppl_buckets",
    "q_k_anonymity",
    # (c2, continued) incremental NEAR-dup vs the historical master
    # (the per-snapshot production dedup shape) and the Gopher gate
    # as a structured stream (ingest-time curation telemetry); the
    # minhash signature stage was also rebuilt this round (two-stage
    # hashing + staged hash column + id re-bucketing: 216 s -> 7.7 s
    # at sf0.1), so q_near_dup_minhash's sentinel slot doubles as the
    # re-attest for that helper change.
    "q_incremental_neardup",
    "q_stream_quality_gate",
    # (c2, continued) the retrieval lane's evaluation op (nDCG/MRR/
    # recall of the BM25 ranking), DSIR importance weights (the
    # importance-resampling data-selection readout), and the
    # Luhn-validated card redaction (checksum-gated PII).
    "q_retrieval_eval",
    "q_dsir_weights",
    "q_pii_luhn",
    # (c2, continued) two-sample Kolmogorov-Smirnov drift per source
    # (the ECDF-sup-norm complement of q_psi_drift) and the per-source
    # Zipf-law fit (distribution-shape corpus health).
    "q_ks_drift",
    "q_zipf_fit",
    # (c3) q_near_dup_minhash re-attest: its r5 green row predates the
    # round-9 signature-stage rebuild (hashed_shingles staging + id
    # re-bucketing in operators/minhash.py) — the ledger flags it
    # changed; this slot refreshes it against the rebuilt helpers.
    "q_near_dup_minhash",
    # -- (d) regression sentinels, oldest-green-first: the r4 cohort
    # (pre-r5 code vintage), minus the tail that ceded slots to this
    # round's registrations (see the trailing comments) — those join
    # the r10 stalest list.
    "q_anti_join",
    "q_append_sink",
    "q_contamination",
    "q_cosine_pairs",
    "q_csv_roundtrip",
    "q_cube",
    "q_dataset_compare",
    "q_doc_embed_join",
    "q_doc_fingerprint",
    "q_doc_quality",
    "q_grouping_sets",
    "q_image_features",
    "q_json_roundtrip",
    "q_knn_ivf_exactprobe",
    "q_lang_id",
    "q_left_join_null",
    "q_min_per_group_join",
    "q_multi_split",
    "q_near_dup_embedding",
    "q_near_dup_simhash",
    # (q_orc_roundtrip and q_pack_sequences gave their slots to
    # q_ks_drift/q_zipf_fit; r10 stalest list.)
    # (q_partitioned_write, q_proc_sql, q_remerge_share, q_scd2_merge
    # gave their slots to q_retrieval_eval/q_dsir_weights/q_pii_luhn
    # and the q_near_dup_minhash re-attest; r10 stalest list.)
    # (q_semi_join and q_simhash_fingerprints gave their slots to the
    # two late round-9 additions; r10 stalest list.)
    # (q_skew_salted_agg, q_skew_salted_join, q_split_hash gave their
    # slots to the three new round-9 operators; r10 stalest list.)
    # (q_stratified_sample gave its slot to q_dedup_containment; it
    # joins the r10 stalest list with the other five r4 holdovers.)
    # (q_text_stats, q_text_tokens, q_tfidf, q_token_count,
    # q_update_master gave their slots to the bench_llm re-attests;
    # they lead the r10 stalest list.)
)

#: ROUND 9 window bookkeeping rule (learned twice, r7 and r8): NO
#: @query registration lands without, in the SAME commit, (1) a
#: DRIVER_PRIORITY slot — displace the LAST block-(d) sentinel to keep
#: the 50-slot cap, (2) the matching update to
#: tests/test_registry_order.py's must-set, (3) `python
#: scratch/gen_operators_md.py`, and (4) a full-suite rerun on the
#: settled tree. Queries registered this round so far: q_dedup_containment,
#: q_bpe_merges, q_ppl_buckets, q_k_anonymity, q_incremental_neardup,
#: q_stream_quality_gate, q_retrieval_eval, q_dsir_weights, q_pii_luhn,
#: q_ks_drift, q_zipf_fit (all windowed).
#:
#: ROUND 10 window plan — after r9 lands, every registered query has a
#: driver-green row, none predating code it depends on (the ledger now
#: hashes transitive repo-local callees, so helper edits flag their
#: dependents). Compose as: (1) new/changed queries per the ledger's
#: "changed since newest green row" column, then (2) sentinels
#: oldest-green-first (after r9 the stalest rows are the five r4
#: holdovers q_text_stats, q_text_tokens, q_tfidf, q_token_count,
#: q_update_master, q_stratified_sample, q_skew_salted_agg,
#: q_skew_salted_join, q_split_hash, q_semi_join,
#: q_simhash_fingerprints, q_partitioned_write, q_proc_sql,
#: q_remerge_share, q_scd2_merge, q_orc_roundtrip, q_pack_sequences,
#: then the r5 cohort:
#: q_ab_test, q_array_ops, q_audio_features, q_curation_pipeline,
#: q_distinct_count, q_dup_clusters, q_event_transitions, q_except,
#: q_histogram, q_image_resize, q_json_extract, q_merge_in_flags,
#: q_missing_semantics, q_multimodal_features, q_near_dup_minhash,
#: q_pipeline_spec, q_pivot_status, q_prefix_join, q_rollup,
#: q_session_window, q_sliding_window, q_snapshot_upsert, ...).


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
