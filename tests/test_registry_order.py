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
WINDOW_ROUND = 16

#: Slots deliberately spent on already-attested queries this round:
#: the eight rows the settled-r15-tree ledger flags changed
#: (q_image_phash: 16->64-bit hash lift; q_webp_features/q_webp_vp8x:
#: forged-chunk_len guard in the shared VP8L decoder;
#: q_mannwhitney/q_kruskal_wallis: decimal(38,0) rank-sum widening;
#: q_neardup_apply/q_pretrain_pipeline/q_pretrain_pipeline_prod:
#: connected_components became the large-star/small-star scheme).
RE_ATTESTS = {
    "q_image_phash", "q_webp_features", "q_webp_vp8x",
    "q_mannwhitney", "q_kruskal_wallis", "q_neardup_apply",
    "q_pretrain_pipeline", "q_pretrain_pipeline_prod",
}
#: The due 6-round rotation: the r10 cohort (40) minus q_ab_test
#: (DOCUMENTED_SLIPS, one round). q_dup_clusters doubles as a
#: changed row (star CC) but was due anyway.
SENTINELS = {
    "q_array_ops", "q_attribution", "q_audio_features",
    "q_curation_pipeline", "q_distinct_count", "q_dup_clusters",
    "q_event_transitions", "q_except", "q_heavy_hitters",
    "q_histogram", "q_image_resize", "q_json_extract", "q_knn_ivf",
    "q_knn_ivf_exactprobe", "q_merge_in_flags", "q_missing_semantics",
    "q_multimodal_features", "q_near_dup_minhash", "q_orc_roundtrip",
    "q_pack_sequences", "q_partitioned_write", "q_pipeline_spec",
    "q_pivot_status", "q_proc_sql", "q_remerge_share", "q_scd2_merge",
    "q_semi_join", "q_simhash_fingerprints", "q_skew_salted_agg",
    "q_skew_salted_join", "q_split_hash", "q_stl_decompose",
    "q_stratified_sample", "q_text_stats", "q_text_tokens", "q_tfidf",
    "q_token_count", "q_triangles", "q_update_master",
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


def test_round16_rotation_targets_inside_window() -> None:
    """Round-16 plan: the three new registrations and this round's
    re-attests must all sit in slots 0-49."""
    must = {
        "q_phash_neardup", "q_exact_substring", "q_webp_lossy",
    } | RE_ATTESTS
    window = set(list(registry.queries_map())[:WINDOW])
    assert must <= window, f"outside window: {sorted(must - window)}"


def test_round16_window_finishes_attestation() -> None:
    """The r16 window must drain the never-attested backlog (recomputed
    from pre-r16 CORRECTNESS artifacts, no hand list) and spend every
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
