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
WINDOW_ROUND = 13

#: Slots deliberately spent on already-attested queries this round:
#: the 8 queries whose code (or transitive helper/oracle) changed in
#: round 13 — the near-dup index serve over the band-partitioned,
#: metadata-carrying, delta-merging artifact (minhash rework), the
#: v2-streaming lane-observability rewrite, and the IVF family over
#: the loud-on-corruption metadata reader (ADVICE r12).
RE_ATTESTS = {
    "q_neardup_index_serve", "q_stream_stateful_totals_v2", "q_ivf_build",
    "q_ivf_serve", "q_ivf_upsert", "q_ivf_upsert_serve", "q_knn_ivf_batch",
    "q_ivf_compact",
}
#: The stalest-attestation rotation: 35 of the 37 remaining r7-cohort
#: rows. q_topk_other and q_url_extract were displaced by the round's
#: two capability registrations (q_semdedup, q_bloom_contamination)
#: and lead the round-14 window instead — a documented one-round slip
#: of the 6-round re-attest cadence for those two rows only.
SENTINELS = {
    "q_chunk_docs", "q_class_balance", "q_cogroup_reconcile",
    "q_correlated_subquery", "q_cross_source_dups", "q_dedup_stats",
    "q_embed_dim_stats", "q_ewma", "q_forget_user", "q_fuzzy_match",
    "q_gini", "q_hhi", "q_incremental_dedup", "q_inverted_index",
    "q_jaccard_pairs", "q_keyword_extract", "q_length_histogram_log2",
    "q_linear_regression", "q_mode_per_group", "q_outlier_mad",
    "q_pagerank", "q_partial_agg_merge", "q_pii_redact",
    "q_point_in_time_join", "q_pps_sample", "q_psi_drift", "q_range_join",
    "q_referential_integrity", "q_rolling_stats", "q_schema_evolution",
    "q_share_of_parent", "q_ship_priority", "q_skipgrams",
    "q_text_normalize", "q_top_paths",
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


def test_round13_rotation_targets_inside_window() -> None:
    """Round-13 plan (VERDICT r12 items 1-8): the new queries and this
    round's changed-code queries must all sit in slots 0-49."""
    must = {
        "q_neardup_mor_serve", "q_ivf_pq_build", "q_ivf_pq_serve",
        "q_stream_neardup", "q_jpeg_gradient", "q_semdedup",
        "q_bloom_contamination",
    } | RE_ATTESTS
    window = set(list(registry.queries_map())[:WINDOW])
    assert must <= window, f"outside window: {sorted(must - window)}"


def test_round13_window_finishes_attestation() -> None:
    """The r13 window must drain the never-attested backlog (recomputed
    from pre-r13 CORRECTNESS artifacts, no hand list) and spend every
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
