"""Pins the driver-facing registry emission order.

The verify harness attests only the FIRST 50 entries of ``queries()``
in dict order (hard cap measured in round 1), so DRIVER_PRIORITY must
(a) name only real queries, (b) contain no duplicates, and (c) fill the
window with exactly the queries that need a green row this round.
"""

from __future__ import annotations

from sas_etl_spark import registry

WINDOW = 50


def test_priority_names_are_registered() -> None:
    registry._load_all()
    missing = [n for n in registry.DRIVER_PRIORITY if n not in registry.QUERIES]
    assert not missing, f"DRIVER_PRIORITY names not in registry: {missing}"


def test_priority_has_no_duplicates() -> None:
    names = registry.DRIVER_PRIORITY
    assert len(names) == len(set(names))


def test_priority_fills_driver_window() -> None:
    assert len(registry.DRIVER_PRIORITY) == WINDOW


def test_queries_map_leads_with_priority() -> None:
    emitted = list(registry.queries_map())
    assert emitted[: len(registry.DRIVER_PRIORITY)] == list(registry.DRIVER_PRIORITY)
    # every registered query is still emitted exactly once
    assert sorted(emitted) == sorted(registry.QUERIES)


#: The round whose window DRIVER_PRIORITY currently encodes. Window
#: bookkeeping below only consults CORRECTNESS artifacts from rounds
#: STRICTLY BEFORE this — the round-7 lesson (VERDICT r7 wrong #1):
#: a test that recomputes "attested" from ALL artifacts self-destructs
#: the moment its own window's results land. Bump when recomposing.
WINDOW_ROUND = 12

#: Slots deliberately spent on already-attested queries this round:
#: the 12 queries whose code (or transitive helper/oracle) changed in
#: round 12 — the v2-streaming runtime fallback, the
#: exact-accumulator rewrites (bootstrap CI; the BM25 stats row and
#: its two dependents), the pretrain composite refactor (shared
#: downstream with the new prod twin), and the IVF family over the
#: metadata-carrying / size-gated / int8-compressed index artifact.
RE_ATTESTS = {
    "q_stream_stateful_totals_v2", "q_bootstrap_ci", "q_bm25",
    "q_rrf_hybrid", "q_retrieval_eval", "q_pretrain_pipeline",
    "q_ivf_build", "q_ivf_serve", "q_ivf_upsert", "q_ivf_upsert_serve",
    "q_knn_ivf_batch", "q_image_features",
}
#: The stalest-attestation rotation: the remaining 25 r6-cohort rows
#: (after this round no attestation predates r7) plus the oldest 7
#: r7-cohort rows as fill, oldest-green-first.
SENTINELS = {
    "q_ngram_contamination", "q_nodupkey", "q_pivot_api",
    "q_pivot_multi", "q_pricing_summary", "q_project_rename",
    "q_quality_checks", "q_rank_ntile", "q_rank_tie_modes",
    "q_rank_ties_mean", "q_regex_extract", "q_repetition_ratio",
    "q_rfm_segments", "q_running_total", "q_sample", "q_string_funcs",
    "q_string_funcs2", "q_udaf_weighted", "q_udf_charge",
    "q_unigram_logprob", "q_union_distinct", "q_univariate_moments",
    "q_unpivot", "q_weighted_stats", "q_window_rank",
    "q_activity_streaks", "q_anomaly_days", "q_argmax", "q_autocorr",
    "q_benford", "q_business_days", "q_chunk_dedup",
}


def _attested_before_window_round() -> set[str]:
    """Queries with a green driver row in any round < WINDOW_ROUND.
    Excluding the window's own round keeps these assertions true both
    before AND after the driver drops CORRECTNESS_r0{WINDOW_ROUND}."""
    import json
    import pathlib
    import re

    repo = pathlib.Path(__file__).resolve().parent.parent
    attested: set[str] = set()
    for f in repo.glob("CORRECTNESS_r*.json"):
        if int(re.search(r"r(\d+)", f.name).group(1)) >= WINDOW_ROUND:
            continue
        for name, rec in json.loads(f.read_text()).items():
            if rec.get("rows_match") and rec.get("schema_match") and not rec.get("err"):
                attested.add(name)
    return attested


def test_round12_rotation_targets_inside_window() -> None:
    """Round-12 plan (VERDICT r11 items 1-7): the new queries and this
    round's changed-code queries must all sit in slots 0-49."""
    must = {
        "q_pretrain_pipeline_prod", "q_snapshot_time_travel",
        "q_jpeg_features", "q_ivf_compact", "q_snapshot_vacuum",
        "q_neardup_index_serve",
    } | RE_ATTESTS
    window = set(list(registry.queries_map())[:WINDOW])
    assert must <= window, f"outside window: {sorted(must - window)}"


def test_round12_window_finishes_attestation() -> None:
    """The r12 window must drain the never-attested backlog (recomputed
    from pre-r12 CORRECTNESS artifacts, no hand list) and spend every
    remaining slot only on declared re-attests/sentinels — after this
    round no registered query lacks a driver-green row."""
    attested = _attested_before_window_round()
    registry._load_all()
    window = set(list(registry.queries_map())[:WINDOW])

    backlog = set(registry.QUERIES) - attested
    stranded = backlog - window
    assert not stranded, f"never-attested queries left out: {sorted(stranded)}"

    undeclared = (window & attested) - RE_ATTESTS - SENTINELS
    assert not undeclared, (
        f"attested queries burning undeclared slots: {sorted(undeclared)}"
    )


def test_driver_order_raises_on_phantom_priority_name() -> None:
    """Unregistered priority names must fail LOUDLY (round 2 silently
    slid sentinels into the attestation window instead)."""
    import pytest

    registry._load_all()
    original = registry.DRIVER_PRIORITY
    registry.DRIVER_PRIORITY = original + ("q_does_not_exist",)
    try:
        with pytest.raises(KeyError, match="q_does_not_exist"):
            registry.queries_map()
    finally:
        registry.DRIVER_PRIORITY = original
