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
WINDOW_ROUND = 11

#: Slots deliberately spent on already-attested queries this round:
#: the 12 queries whose code (or transitive helper/oracle) changed in
#: round 11 — the sample-trained IVF build + serve, the ADVICE r10
#: degenerate-input hardenings (bpe x2, bootstrap, cusum x2), the
#: BM25 zero-shuffle rewrite + its dependents, the span-dedup
#: exchange diet, and the shared image-stats lane refactor.
RE_ATTESTS = {
    "q_ivf_build", "q_ivf_serve", "q_bpe_encode", "q_bpe_train",
    "q_bootstrap_ci", "q_cusum", "q_stream_cusum", "q_bm25",
    "q_rrf_hybrid", "q_retrieval_eval", "q_span_dedup",
    "q_image_features",
}
#: The stalest-attestation rotation (the 11 r5-displaced rows +
#: q_knn_cosine + q_cohort_retention) plus the r6 sentinel cohort
#: fill, oldest-green-first.
SENTINELS = {
    "q_union_all", "q_udtf_tokens", "q_topn_sort", "q_string_distance",
    "q_surrogate_key", "q_snapshot_upsert", "q_sliding_window",
    "q_session_window", "q_rollup", "q_prefix_join",
    "q_video_frame_sample", "q_knn_cosine", "q_cohort_retention",
    "q_approx_percentile", "q_case_when", "q_corr_stats",
    "q_crosstab_pct", "q_derive_cols", "q_distinct_rows", "q_dupout",
    "q_embed_quantize", "q_filter_pred", "q_fixedwidth_roundtrip",
    "q_format_lookup", "q_format_ranges", "q_freq_chisq",
    "q_grouped_zscore", "q_interleave", "q_interp_linear",
    "q_intersect", "q_join3_revenue", "q_market_basket",
    "q_math_rowwise", "q_merge_many_to_many",
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


def test_round11_rotation_targets_inside_window() -> None:
    """Round-11 plan (VERDICT r10 items 1-7): the three new queries
    and this round's changed-code queries must all sit in slots
    0-49."""
    must = {
        "q_ivf_upsert", "q_ivf_upsert_serve", "q_png_features",
        "q_stream_stateful_totals_v2",
    } | RE_ATTESTS
    window = set(list(registry.queries_map())[:WINDOW])
    assert must <= window, f"outside window: {sorted(must - window)}"


def test_round11_window_finishes_attestation() -> None:
    """The r11 window must drain the never-attested backlog (recomputed
    from pre-r11 CORRECTNESS artifacts, no hand list) and spend every
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
