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
#: window unconditionally). Round 15 carries no slips: the window
#: holds all three r14 slips (now overdue), the full due r9 cohort,
#: both changed rows, and the six round-15 registrations — exactly
#: full.
DOCUMENTED_SLIPS: frozenset[tuple[str, int]] = frozenset()

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
    # ROUND 15 window. Composition (50 = 6 + 2 + 3 + 39):
    # -- (a) NEW this round: the VP8X extended-container WebP lane
    # (round-15 advice item 1 made attestable), perceptual-hash image
    # dedup, and the PROC TTEST / NPAR1WAY / ANOVA hypothesis-test
    # family (queries/hypothesis_tests.py).
    "q_webp_vp8x",
    "q_image_phash",
    "q_ttest_welch",
    "q_mannwhitney",
    "q_anova_oneway",
    # -- (b) changed since their attestation: q_webp_features over the
    # round-15 webp hardening (uint32 pixel buffer + forged-dims
    # bound + VP8X routing in the shared decoder closure);
    # q_png_features over its codec-gate docstring fix (comment-only,
    # re-attest anyway — the ledger diffs source segments).
    "q_webp_features",
    "q_png_features",
    # -- (c) OVERDUE: the three r8 rows round 14's full window slipped
    # (DOCUMENTED_SLIPS r14, expired — unconditional this round).
    "q_tumbling_counts",
    "q_weighted_median",
    "q_systematic_sample",
    # -- (d) the due 6-round rotation: the full r9 cohort (39 rows).
    "q_anti_join",
    "q_append_sink",
    "q_bpe_merges",
    "q_contamination",
    "q_cosine_pairs",
    "q_csv_roundtrip",
    "q_cube",
    "q_dataset_compare",
    "q_dedup_containment",
    "q_doc_embed_join",
    "q_doc_fingerprint",
    "q_doc_quality",
    "q_dsir_weights",
    "q_grouping_sets",
    "q_json_roundtrip",
    "q_k_anonymity",
    "q_ks_drift",
    "q_lang_id",
    "q_left_join_null",
    "q_min_per_group_join",
    "q_mixture_apply",
    "q_multi_split",
    "q_near_dup_embedding",
    "q_near_dup_simhash",
    "q_ngram_diversity",
    "q_percentiles",
    "q_pii_luhn",
    "q_semantic_decontam",
    "q_stream_dedup",
    "q_stream_exactly_once_sink",
    "q_stream_join",
    "q_stream_quality_gate",
    "q_stream_session",
    "q_stream_sliding",
    "q_stream_stateful_totals",
    "q_stream_tumbling",
    "q_temperature_mixture",
    "q_winsorize",
    "q_zipf_fit",
    # -- (e) the 50th slot: q_kruskal_wallis, the sixth round-15
    # registration (the k-group NPAR1WAY rank test, landed late in the
    # round after the five above).
    "q_kruskal_wallis",
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
#: named). Queries registered in round 15: q_webp_vp8x (VP8X
#: extended-container lossless decode), q_image_phash (perceptual-
#: hash image dedup), and q_ttest_welch / q_mannwhitney /
#: q_kruskal_wallis / q_anova_oneway (the PROC TTEST / NPAR1WAY /
#: ANOVA family, queries/hypothesis_tests.py).
#:
#: ROUND 16 window plan: (1) any rows the settled-tree ledger flags
#: changed/moved, then (2) the due rotation: the full r10 cohort (40
#: rows) — 40 + changed + new registrations must fit 50; pause
#: registrations or document slips accordingly.


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
