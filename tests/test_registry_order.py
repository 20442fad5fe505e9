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
WINDOW_ROUND = 14

#: Slots deliberately spent on already-attested queries this round:
#: the 10 rows the settled-r13-tree ledger flags changed/moved (the
#: q_ppl_buckets accumulator fix, the minhash/write_snapshot helper
#: rework family, the byte-identical-but-re-attest jpeg/ngram pair),
#: the two r7 rows round 13's registrations displaced, and
#: q_bloom_contamination re-attesting its derived geometry (VERDICT
#: r13 items 1 and 3).
RE_ATTESTS = {
    "q_topk_other", "q_url_extract",
    "q_ppl_buckets", "q_incremental_neardup", "q_jpeg_features",
    "q_ngram_contamination", "q_snapshot_time_travel",
    "q_snapshot_upsert", "q_snapshot_vacuum", "q_stream_cdc_upsert",
    "q_bloom_contamination",
}
#: The due 6-round rotation: 37 of the 40 r8-cohort rows
#: (q_tumbling_counts, q_weighted_median and q_systematic_sample slip
#: one round via registry.DOCUMENTED_SLIPS and lead the round-15
#: window).
SENTINELS = {
    "q_approx_distinct", "q_asof_event", "q_bigram_logprob",
    "q_bucketed_join", "q_char_entropy", "q_containment_pairs",
    "q_cramers_v", "q_date_dim", "q_date_format", "q_date_funcs",
    "q_dedup_firstlast", "q_domain_mixture", "q_epoch_shuffle",
    "q_exact_dup", "q_funnel", "q_gap_fill", "q_golden_record",
    "q_gopher_rules", "q_hierarchy_flatten", "q_impute_group_mean",
    "q_intnx_intck", "q_json_nested", "q_kfold_assign",
    "q_latency_percentiles", "q_max_concurrency", "q_mixture_epochs",
    "q_mom_growth", "q_moving_avg", "q_neardup_apply",
    "q_new_vs_returning", "q_pctldef", "q_pmi_scores",
    "q_quality_prune", "q_reservoir_sample", "q_sessionize",
    "q_sliding_distinct_users", "q_spearman_corr",
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


def test_round14_rotation_targets_inside_window() -> None:
    """Round-14 plan (VERDICT r13 items 1-3): the new queries and this
    round's re-attests must all sit in slots 0-49."""
    must = {"q_semdedup_serve", "q_webp_features"} | RE_ATTESTS
    window = set(list(registry.queries_map())[:WINDOW])
    assert must <= window, f"outside window: {sorted(must - window)}"


def test_round14_window_finishes_attestation() -> None:
    """The r14 window must drain the never-attested backlog (recomputed
    from pre-r14 CORRECTNESS artifacts, no hand list) and spend every
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
