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
    # ROUND 12 window. Composition (50 = 6 + 12 + 25 + 7):
    # -- (a) NEW this round: the production-posture pretrain
    # composite (VERDICT r11 item 1: LSH edges at the >= 0.8
    # operating point, exact all-pairs oracle), snapshot time travel
    # as a first-class attested read (item 7), and the baseline-JPEG
    # decode lane (item 5 — huffman + dequant + IDCT + YCbCr,
    # stdlib+numpy, block-exact fixture), plus the merge-on-read +
    # LSM-compaction attestation q_ivf_compact (closes the mor mode's
    # unit-test-only status) and snapshot retention q_snapshot_vacuum
    # (the lakehouse VACUUM semantics; v1 attested unreadable), and
    # the persisted near-dup signature index q_neardup_index_serve
    # (build-once/serve-many for MinHash-LSH, the q_ivf_serve regime).
    "q_pretrain_pipeline_prod",
    "q_snapshot_time_travel",
    "q_jpeg_features",
    "q_ivf_compact",
    "q_snapshot_vacuum",
    "q_neardup_index_serve",
    # -- (b) code changed this round, re-attest: the v2-streaming
    # runtime fallback (ADVICE r11), exact-accumulator rewrites of
    # the bootstrap CI and the BM25 stats row + its two dependents
    # (ADVICE r11), the pretrain composite refactor (shared
    # downstream with the prod twin), and the IVF family over the
    # metadata-carrying, size-gated (and int8-compressed, item 2)
    # index artifact.
    "q_stream_stateful_totals_v2",
    "q_bootstrap_ci",
    "q_bm25",
    "q_rrf_hybrid",
    "q_retrieval_eval",
    "q_pretrain_pipeline",
    "q_ivf_build",
    "q_ivf_serve",
    "q_ivf_upsert",
    "q_ivf_upsert_serve",
    "q_knn_ivf_batch",
    "q_image_features",
    # -- (c) the stalest attestations (VERDICT r11 item 4): the
    # remaining 25 r6-cohort rows — after this round no attestation
    # predates r7.
    "q_ngram_contamination",
    "q_nodupkey",
    "q_pivot_api",
    "q_pivot_multi",
    "q_pricing_summary",
    "q_project_rename",
    "q_quality_checks",
    "q_rank_ntile",
    "q_rank_tie_modes",
    "q_rank_ties_mean",
    "q_regex_extract",
    "q_repetition_ratio",
    "q_rfm_segments",
    "q_running_total",
    "q_sample",
    "q_string_funcs",
    "q_string_funcs2",
    "q_udaf_weighted",
    "q_udf_charge",
    "q_unigram_logprob",
    "q_union_distinct",
    "q_univariate_moments",
    "q_unpivot",
    "q_weighted_stats",
    "q_window_rank",
    # -- (d) regression sentinels, oldest-green-first: the r7 cohort,
    # alphabetical (7 of 44; the rest rotate through r13+).
    "q_activity_streaks",
    "q_anomaly_days",
    "q_argmax",
    "q_autocorr",
    "q_benford",
    "q_business_days",
    "q_chunk_dedup",
)

#: ROUND 12 window bookkeeping rule (learned twice, r7 and r8): NO
#: @query registration lands without, in the SAME commit, (1) a
#: DRIVER_PRIORITY slot — displace the LAST block-(d) sentinel to keep
#: the 50-slot cap, (2) the matching update to
#: tests/test_registry_order.py's must-set, (3) `python
#: scratch/gen_operators_md.py` (as its own follow-up commit — the
#: ledger records the attestation commit), and (4) a full-suite rerun
#: on the settled tree. Queries registered this round so far:
#: q_pretrain_pipeline_prod, q_snapshot_time_travel, q_jpeg_features,
#: q_ivf_compact, q_snapshot_vacuum, q_neardup_index_serve (all
#: windowed).
#:
#: ROUND 13 window plan: (1) new/changed queries per the ledger's
#: changed column, then (2) sentinels oldest-green-first — after r12
#: the stalest rows are the remaining 33 r7-cohort rows
#: (q_cross_source_dups, q_dedup_stats, q_embed_dim_stats, q_ewma,
#: ...; read the full order from OPERATORS.md's Last-attested
#: column).


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
