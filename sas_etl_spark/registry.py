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
  CAVEAT (round-13 sf0.1 sweep finding, q_ppl_buckets): rounding does
  NOT protect a mean whose true value lands exactly on a half-ulp
  decimal boundary — engines' fold orders can round apart. For a
  hash-attested mean OF ALREADY-ROUNDED values, prefer the
  exact-integer-accumulator idiom: sum e6-scaled longs (or
  decimal(38,0)), divide ONCE in double with identical expression
  order on both sides (robust_stats.py bootstrap / retrieval.py
  avgdl / llm.py q_ppl_buckets are the worked examples).
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
    # ROUND 13 window. Composition (50 = 7 + 8 + 35):
    # -- (a) NEW this round (VERDICT r12 items 1, 2, 6, 8 plus two
    # capability additions): the merge-on-read near-dup index
    # maintenance attested over an UNCOMPACTED bands_delta
    # (q_neardup_mor_serve), the product-quantized IVF build/serve
    # pair, the streaming twin of the incremental near-dup ingest,
    # the non-degenerate (gradient blocks, standard quant tables)
    # JPEG decode lane, SemDeDup semantic dedup (embedding-cluster
    # blocking attested against the brute-force all-pairs oracle),
    # and the bloom-prefiltered decontamination twin (exact-relation
    # oracle shared verbatim with q_ngram_contamination).
    "q_neardup_mor_serve",
    "q_ivf_pq_build",
    "q_ivf_pq_serve",
    "q_stream_neardup",
    "q_jpeg_gradient",
    "q_semdedup",
    "q_bloom_contamination",
    # -- (b) code changed this round, re-attest: the near-dup
    # index serve over the band-partitioned, metadata-carrying,
    # delta-merging artifact; the v2-stream lane-observability
    # rewrite; and the IVF family over the loud-on-corruption
    # metadata reader (ADVICE r12).
    "q_neardup_index_serve",
    "q_stream_stateful_totals_v2",
    "q_ivf_build",
    "q_ivf_serve",
    "q_ivf_upsert",
    "q_ivf_upsert_serve",
    "q_knn_ivf_batch",
    "q_ivf_compact",
    # -- (c) the stalest attestations (VERDICT r12 item 3): 35 of
    # the 37 remaining r7-cohort rows. The two new capability
    # registrations (q_semdedup, q_bloom_contamination) displace
    # the two alphabetically-last r7 rows — q_topk_other and
    # q_url_extract slide to the HEAD of the round-14 window (one
    # round past the 6-round re-attest cadence, a deliberate,
    # documented trade for two new attested operators; both are
    # untouched single-table aggregations whose code last changed
    # in round 7).
    "q_chunk_docs",
    "q_class_balance",
    "q_cogroup_reconcile",
    "q_correlated_subquery",
    "q_cross_source_dups",
    "q_dedup_stats",
    "q_embed_dim_stats",
    "q_ewma",
    "q_forget_user",
    "q_fuzzy_match",
    "q_gini",
    "q_hhi",
    "q_incremental_dedup",
    "q_inverted_index",
    "q_jaccard_pairs",
    "q_keyword_extract",
    "q_length_histogram_log2",
    "q_linear_regression",
    "q_mode_per_group",
    "q_outlier_mad",
    "q_pagerank",
    "q_partial_agg_merge",
    "q_pii_redact",
    "q_point_in_time_join",
    "q_pps_sample",
    "q_psi_drift",
    "q_range_join",
    "q_referential_integrity",
    "q_rolling_stats",
    "q_schema_evolution",
    "q_share_of_parent",
    "q_ship_priority",
    "q_skipgrams",
    "q_text_normalize",
    "q_top_paths",
)

#: ROUND 13 window bookkeeping rule (learned twice, r7 and r8): NO
#: @query registration lands without, in the SAME commit, (1) a
#: DRIVER_PRIORITY slot — displace the LAST block-(d) temporary
#: sentinel to keep the 50-slot cap, (2) the matching update to
#: tests/test_registry_order.py's must-set, (3) `python
#: scratch/gen_operators_md.py` (as its own follow-up commit — the
#: ledger records the attestation commit), and (4) a full-suite rerun
#: on the settled tree. Queries registered this round:
#: q_neardup_mor_serve, q_ivf_pq_build, q_ivf_pq_serve,
#: q_stream_neardup, q_jpeg_gradient, q_semdedup,
#: q_bloom_contamination (all windowed) — the window is exactly
#: 7 new + 8 re-attests + 35 r7-stale rows. NOTE: jpeg_encode gained
#: a quant parameter (None default) for the gradient lane;
#: q_jpeg_features' artifact is BYTE-identical under the default
#: (round(x/1.0) == round(x), DQT all-ones == its own zigzag) and was
#: re-verified green at sf0.01 — a value-identical refactor, no
#: re-attest slot spent. q_ngram_contamination's oracle string moved
#: into the shared _NGRAM_CONTAM_ORACLE constant (byte-identical
#: value) so q_bloom_contamination attests against the same ground
#: truth — no re-attest slot spent there either.
#:
#: ROUND 14 window plan: (1) q_topk_other and q_url_extract FIRST
#: (the two r7 rows this round's capability registrations displaced),
#: plus q_ppl_buckets (avg_score moved to the exact-integer
#: accumulator after the round-13 sf0.1 sweep caught a half-ulp
#: rounding boundary; values at sf0.01 are byte-identical and
#: re-verified, so the r9 attestation binds, but the changed code
#: should re-attest first chance), then (2) new/changed queries per
#: the ledger's changed column, then (3) sentinels oldest-green-first
#: — after r13 the stalest rows are the 40-row r8 cohort
#: (q_approx_distinct, q_asof_event, ...; read the full order from
#: OPERATORS.md's Last-attested column).


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
