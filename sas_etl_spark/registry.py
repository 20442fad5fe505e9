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
#: Re-attestation cadence (rounds): a green driver row older than this
#: is DUE for a fresh slot; older still is OVERDUE. Enforced by
#: tests/test_attestation_staleness.py against DRIVER_PRIORITY.
ATTEST_CADENCE = 6

#: Deliberate one-round slips of the cadence: (query, round_due) rows
#: displaced from round_due's full window by that round's capability
#: registrations / changed-code re-attests. Entries are valid ONLY for
#: the round they name (the staleness test fails an entry whose round
#: has passed — the slipped row is then OVERDUE and must be in the next
#: window unconditionally). Round-14 slips: the window is exactly full
#: (2 overdue r7 + 10 changed rows + q_semdedup_serve NEW +
#: q_bloom_contamination re-geometry + q_webp_features NEW + 37 of
#: the 40 due r8 rows), so the three alphabetically-last untouched
#: single-table r8 rows slide to lead round 15 — the same documented
#: trade round 13 made for q_topk_other/q_url_extract.
DOCUMENTED_SLIPS: frozenset[tuple[str, int]] = frozenset(
    {
        ("q_tumbling_counts", 14),
        ("q_weighted_median", 14),
        ("q_systematic_sample", 14),
    }
)

#: Round-close protocol (promoted to standing protocol in round 14,
#: VERDICT r13 item 8): after the tree settles, run the FULL-registry
#: sf0.1 oracle sweep in a fresh process — `SKIP=auto
#: SFDIR=/root/testdata/sf0.1 python scratch/drive_driver_sf.py` —
#: and record the artifact path in SCALE.md's round section. Budget
#: ~80 min. It exists because sf0.01 attestation structurally cannot
#: see cross-engine boundary effects that need specific value
#: populations (round 13's only real bug, q_ppl_buckets' half-ulp
#: mean boundary, surfaced ONLY there). SWEEP_SKIP names the
#: documented exceptions: queries whose DUCKDB ORACLE is a
#: brute-force all-pairs (or transitive-closure) form over the
#: 5,000-document corpus at sf0.1 — 50+ minutes EACH engine-side
#: (measured rounds 6 and 13; a 40-min capped attempt at seven did
#: not finish). The SPARK side is sub-quadratic everywhere; it is the
#: ground-truth oracle that cannot scale. These stay exact-verified
#: at sf0.01 by the driver and at the ~833-doc intermediate SF by
#: tests/test_intermediate_sf_parity.py. Embedding-based all-pairs
#: oracles (2,080 vectors at sf0.1) are FEASIBLE and deliberately
#: not listed (retired from the skip set in round 13).
SWEEP_SKIP: frozenset[str] = frozenset(
    {
        "q_jaccard_pairs",
        "q_near_dup_minhash",
        "q_near_dup_simhash",
        "q_dup_clusters",
        "q_containment_pairs",
        "q_prefix_join",
        "q_chunk_dedup",
        "q_fuzzy_match",
        "q_cross_source_dups",
        "q_simhash_fingerprints",
        "q_neardup_apply",
        "q_pretrain_pipeline",
        "q_pretrain_pipeline_prod",
        "q_dedup_containment",
    }
)

DRIVER_PRIORITY: tuple[str, ...] = (
    # ROUND 14 window. Composition (50 = 2 + 8 + 2 + 38), draining the
    # re-attestation debt VERDICT r13 item 1 names:
    # -- (a) OVERDUE: the two r7 rows round 13's capability
    # registrations displaced (documented one-round slip, now due
    # unconditionally).
    "q_topk_other",
    "q_url_extract",
    # -- (b) changed/moved since their attestation (OPERATORS.md
    # flags, recomputed on the settled r13 tree): q_ppl_buckets'
    # exact-integer-accumulator fix (f46c537, post-r9-attestation);
    # q_incremental_neardup + the snapshot/CDC family over the r13
    # minhash/write_snapshot helper rework; q_jpeg_features over the
    # jpeg_encode quant parameter (byte-identical artifact, re-attest
    # anyway); q_ngram_contamination over the shared-oracle-constant
    # move (byte-identical value, re-attest anyway).
    "q_ppl_buckets",
    "q_incremental_neardup",
    "q_jpeg_features",
    "q_ngram_contamination",
    "q_snapshot_time_travel",
    "q_snapshot_upsert",
    "q_snapshot_vacuum",
    "q_stream_cdc_upsert",
    # -- (c) NEW this round: SemDeDup serving from the persisted
    # semantic index (VERDICT r13 item 2); re-attest for this round's
    # derived bloom geometry (VERDICT r13 item 3); and the lossless-
    # WebP (VP8L) decode lane (retires most of the WebP codec gate).
    "q_semdedup_serve",
    "q_bloom_contamination",
    "q_webp_features",
    # -- (d) the due 6-round rotation: 37 of the 40 r8-cohort rows
    # (q_tumbling_counts, q_weighted_median and q_systematic_sample
    # slip one round, see DOCUMENTED_SLIPS above).
    "q_approx_distinct",
    "q_asof_event",
    "q_bigram_logprob",
    "q_bucketed_join",
    "q_char_entropy",
    "q_containment_pairs",
    "q_cramers_v",
    "q_date_dim",
    "q_date_format",
    "q_date_funcs",
    "q_dedup_firstlast",
    "q_domain_mixture",
    "q_epoch_shuffle",
    "q_exact_dup",
    "q_funnel",
    "q_gap_fill",
    "q_golden_record",
    "q_gopher_rules",
    "q_hierarchy_flatten",
    "q_impute_group_mean",
    "q_intnx_intck",
    "q_json_nested",
    "q_kfold_assign",
    "q_latency_percentiles",
    "q_max_concurrency",
    "q_mixture_epochs",
    "q_mom_growth",
    "q_moving_avg",
    "q_neardup_apply",
    "q_new_vs_returning",
    "q_pctldef",
    "q_pmi_scores",
    "q_quality_prune",
    "q_reservoir_sample",
    "q_sessionize",
    "q_sliding_distinct_users",
    "q_spearman_corr",
)

#: Window bookkeeping rule (learned twice, r7 and r8): NO @query
#: registration lands without, in the SAME commit, (1) a
#: DRIVER_PRIORITY slot, (2) the matching update to
#: tests/test_registry_order.py's must-set, (3) `python
#: scratch/gen_operators_md.py` regeneration, and (4) a full-suite
#: rerun on the settled tree. Since round 14 the cadence itself is
#: code: tests/test_attestation_staleness.py recomputes due/overdue
#: rows from the CORRECTNESS artifacts and fails any window that
#: misses them (slips allowed only via DOCUMENTED_SLIPS, one round,
#: named). Queries registered in round 14: q_semdedup_serve (the
#: SemDeDup serve-from-persisted-index form, VERDICT r13 item 2);
#: q_webp_features (the lossless-WebP/VP8L decode lane,
#: operators/webp.py). q_bloom_contamination re-attests for the
#: derived bloom geometry (bloom_m_for, VERDICT r13 item 3).
#:
#: ROUND 15 window plan: (1) q_tumbling_counts + q_weighted_median +
#: q_systematic_sample FIRST (this round's DOCUMENTED_SLIPS — overdue
#: at r15), then (2) any rows the OPERATORS.md ledger flags
#: changed/moved, then (3) the due rotation: the r9 cohort (41 rows
#: at r13 count; read the exact set from OPERATORS.md's Last-attested
#: column) — 41 + 3 overfills the 50-slot window only if more than 6
#: rows change in round 15; pause registrations or document slips
#: accordingly.


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
