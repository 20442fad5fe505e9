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
WINDOW_ROUND = 17

#: Slots deliberately spent on already-attested queries this round:
#: the 25 rows the round-16 optimizations staled after the r16 window
#: was composed (VERDICT r16 item 1 — their ledger flags are
#: changed/changed-helper until CORRECTNESS_r17 lands), plus this
#: round's own optimization blast radius (VP8L kernel -> the two
#: pure-Python webp lanes; JPEG dequant+IDCT batching -> the two jpeg
#: lanes; token_ngrams HOF->native -> its three consumers).
RE_ATTESTS = {
    # r16 optimization debt (25)
    "q_bm25", "q_rrf_hybrid", "q_retrieval_eval", "q_ngram_diversity",
    "q_bigram_logprob", "q_mixture_apply", "q_domain_mixture",
    "q_temperature_mixture", "q_mixture_epochs", "q_span_dedup",
    "q_ivf_build", "q_ivf_serve", "q_ivf_compact", "q_ivf_upsert",
    "q_ivf_upsert_serve", "q_ivf_pq_build", "q_ivf_pq_serve",
    "q_semdedup_serve", "q_neardup_index_serve", "q_neardup_mor_serve",
    "q_snapshot_upsert", "q_snapshot_time_travel", "q_snapshot_vacuum",
    "q_stream_cdc_upsert", "q_stream_neardup",
    # r17 edit blast radius (7)
    "q_webp_features", "q_webp_vp8x", "q_jpeg_features",
    "q_jpeg_gradient", "q_bloom_contamination", "q_ngram_contamination",
    "q_repetition_ratio",
}
#: The rotation slots: q_ab_test (the expired r16 slip — overdue,
#: unconditional) plus the 17 in-window rows of the due r11 cohort
#: (the other 20 slip one round via DOCUMENTED_SLIPS; q_span_dedup is
#: due but already counted as a changed row above).
SENTINELS = {
    "q_ab_test",
    "q_join3_revenue", "q_knn_cosine", "q_rollup",
    "q_approx_percentile", "q_bpe_encode", "q_bpe_train",
    "q_cohort_retention", "q_corr_stats", "q_cusum",
    "q_embed_quantize", "q_freq_chisq", "q_grouped_zscore",
    "q_interp_linear", "q_market_basket", "q_prefix_join",
    "q_stream_cusum", "q_string_distance",
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


def test_round17_rotation_targets_inside_window() -> None:
    """Round-17 plan: every declared re-attest (the r16 optimization
    debt + this round's edit blast radius) must sit in slots 0-49."""
    window = set(list(registry.queries_map())[:WINDOW])
    assert RE_ATTESTS <= window, f"outside window: {sorted(RE_ATTESTS - window)}"


def test_round17_window_finishes_attestation() -> None:
    """The r17 window must drain the never-attested backlog (recomputed
    from pre-r17 CORRECTNESS artifacts, no hand list) and spend every
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
