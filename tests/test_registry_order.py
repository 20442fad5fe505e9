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
WINDOW_ROUND = 15

#: Slots deliberately spent on already-attested queries this round:
#: the two rows the settled-r14-tree ledger flags changed
#: (q_webp_features over the round-15 webp hardening, q_png_features
#: over its codec-gate docstring fix).
RE_ATTESTS = {
    "q_webp_features", "q_png_features",
}
#: The due/overdue 6-round rotation: the three r8 rows round 14
#: slipped (now overdue, unconditional) and the full r9 cohort (39).
SENTINELS = {
    "q_tumbling_counts", "q_weighted_median", "q_systematic_sample",
    "q_anti_join", "q_append_sink", "q_bpe_merges", "q_contamination",
    "q_cosine_pairs", "q_csv_roundtrip", "q_cube", "q_dataset_compare",
    "q_dedup_containment", "q_doc_embed_join", "q_doc_fingerprint",
    "q_doc_quality", "q_dsir_weights", "q_grouping_sets",
    "q_json_roundtrip", "q_k_anonymity", "q_ks_drift", "q_lang_id",
    "q_left_join_null", "q_min_per_group_join", "q_mixture_apply",
    "q_multi_split", "q_near_dup_embedding", "q_near_dup_simhash",
    "q_ngram_diversity", "q_percentiles", "q_pii_luhn",
    "q_semantic_decontam", "q_stream_dedup",
    "q_stream_exactly_once_sink", "q_stream_join",
    "q_stream_quality_gate", "q_stream_session", "q_stream_sliding",
    "q_stream_stateful_totals", "q_stream_tumbling",
    "q_temperature_mixture", "q_winsorize", "q_zipf_fit",
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


def test_round15_rotation_targets_inside_window() -> None:
    """Round-15 plan: the five new registrations and this round's
    re-attests must all sit in slots 0-49."""
    must = {
        "q_webp_vp8x", "q_image_phash", "q_ttest_welch",
        "q_mannwhitney", "q_kruskal_wallis", "q_anova_oneway",
    } | RE_ATTESTS
    window = set(list(registry.queries_map())[:WINDOW])
    assert must <= window, f"outside window: {sorted(must - window)}"


def test_round15_window_finishes_attestation() -> None:
    """The r15 window must drain the never-attested backlog (recomputed
    from pre-r15 CORRECTNESS artifacts, no hand list) and spend every
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
