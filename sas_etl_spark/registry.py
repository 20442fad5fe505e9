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
#: window unconditionally). Round 16 runs one slip: the due r10
#: cohort (40) + the ledger's 8 changed rows + 3 new registrations
#: total 51, so q_ab_test (the lowest-risk due row: pure hash-split
#: agg, unchanged since r10, green every attestation) waits one
#: round and is unconditional in r17.
DOCUMENTED_SLIPS: frozenset[tuple[str, int]] = frozenset({("q_ab_test", 16)})

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
    # ROUND 16 window. Composition (50 = 3 + 8 + 39):
    # -- (a) NEW this round: Hamming-ball pHash near-dup (VERDICT r15
    # item 3), the sliding-k-gram exact-substring detector (item 5),
    # and the system-libwebp lossy VP8 lane (item 6 option a).
    "q_phash_neardup",
    "q_exact_substring",
    "q_webp_lossy",
    # -- (b) changed since their attestation (settled-tree ledger):
    # q_image_phash over the 16->64-bit hash lift; q_webp_features /
    # q_webp_vp8x over the forged-chunk_len guard in the shared VP8L
    # decoder; q_mannwhitney / q_kruskal_wallis over the decimal(38,0)
    # rank-sum widening; q_neardup_apply / q_pretrain_pipeline /
    # q_pretrain_pipeline_prod over connected_components becoming the
    # large-star/small-star scheme (operators/graph.py).
    "q_image_phash",
    "q_webp_features",
    "q_webp_vp8x",
    "q_mannwhitney",
    "q_kruskal_wallis",
    "q_neardup_apply",
    "q_pretrain_pipeline",
    "q_pretrain_pipeline_prod",
    # -- (c) the due 6-round rotation: the r10 cohort (40 rows) minus
    # q_ab_test, slipped one round via DOCUMENTED_SLIPS (the window is
    # exactly one slot short; q_dup_clusters stays — it also carries
    # the star-CC plan change).
    "q_array_ops",
    "q_attribution",
    "q_audio_features",
    "q_curation_pipeline",
    "q_distinct_count",
    "q_dup_clusters",
    "q_event_transitions",
    "q_except",
    "q_heavy_hitters",
    "q_histogram",
    "q_image_resize",
    "q_json_extract",
    "q_knn_ivf",
    "q_knn_ivf_exactprobe",
    "q_merge_in_flags",
    "q_missing_semantics",
    "q_multimodal_features",
    "q_near_dup_minhash",
    "q_orc_roundtrip",
    "q_pack_sequences",
    "q_partitioned_write",
    "q_pipeline_spec",
    "q_pivot_status",
    "q_proc_sql",
    "q_remerge_share",
    "q_scd2_merge",
    "q_semi_join",
    "q_simhash_fingerprints",
    "q_skew_salted_agg",
    "q_skew_salted_join",
    "q_split_hash",
    "q_stl_decompose",
    "q_stratified_sample",
    "q_text_stats",
    "q_text_tokens",
    "q_tfidf",
    "q_token_count",
    "q_triangles",
    "q_update_master",
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
#: named). Queries registered in round 16: q_phash_neardup
#: (Hamming-ball 64-bit aHash near-dup via pigeonhole banding),
#: q_exact_substring (sliding k-gram exact duplicated-span detector,
#: operators/text.py duplicated_spans), and q_webp_lossy (lossy VP8
#: decode attestation through the system libwebp).
#:
#: ROUND 17 window plan: (1) any rows the settled-tree ledger flags
#: changed/moved, then (2) q_ab_test (the expired r16 slip —
#: unconditional), then (3) the due rotation: the r11 cohort —
#: everything must fit 50; pause registrations or document slips
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
