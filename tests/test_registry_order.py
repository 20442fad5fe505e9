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
WINDOW_ROUND = 9

#: Slots deliberately spent on already-attested queries this round:
#: the 8 q_stream_* re-attests (their shared source helper
#: streaming/builders.stream_events changed in r8 AFTER their newest
#: green rows — the pre-r9 ledger hashed only query functions), the 4
#: queries whose code changed this round (ADVICE r8: temperature-
#: mixture re-seed, mixture-apply left-join shape, the percentile
#: helper's NULL filter), and the full 37-query r4 sentinel cohort.
RE_ATTESTS = {
    "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
    "q_stream_dedup", "q_stream_join", "q_stream_stateful_totals",
    "q_stream_exactly_once_sink", "q_stream_cdc_upsert",
    "q_temperature_mixture", "q_mixture_apply",
    "q_percentiles", "q_winsorize",
    "q_bm25", "q_rrf_hybrid", "q_knn_ivf_batch",
    "q_ngram_diversity", "q_span_dedup",
    # the MinHash signature stage was rebuilt this round (staged
    # shingle hashing + id re-bucketing); its r5 row predates that.
    "q_near_dup_minhash",
}
SENTINELS = {
    "q_anti_join", "q_append_sink", "q_contamination", "q_cosine_pairs",
    "q_csv_roundtrip", "q_cube", "q_dataset_compare", "q_doc_embed_join",
    "q_doc_fingerprint", "q_doc_quality", "q_grouping_sets",
    "q_image_features", "q_json_roundtrip", "q_knn_ivf_exactprobe",
    "q_lang_id", "q_left_join_null", "q_min_per_group_join",
    "q_multi_split", "q_near_dup_embedding", "q_near_dup_simhash",
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


def test_round9_rotation_targets_inside_window() -> None:
    """Round-9 plan (VERDICT r8 items 1-2): the one never-attested
    query, the 8 stream re-attests, and this round's changed-code
    queries must all sit in slots 0-49."""
    must = {
        "q_semantic_decontam", "q_dedup_containment",
        "q_bpe_merges", "q_ppl_buckets", "q_k_anonymity",
        "q_incremental_neardup", "q_stream_quality_gate",
        "q_retrieval_eval", "q_dsir_weights", "q_pii_luhn",
        "q_ks_drift", "q_zipf_fit",
    } | RE_ATTESTS
    window = set(list(registry.queries_map())[:WINDOW])
    assert must <= window, f"outside window: {sorted(must - window)}"


def test_round9_window_finishes_attestation() -> None:
    """The r9 window must drain the never-attested backlog (recomputed
    from pre-r9 CORRECTNESS artifacts, no hand list) and spend every
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
