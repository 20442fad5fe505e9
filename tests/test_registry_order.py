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
WINDOW_ROUND = 8

#: Slots deliberately spent on already-attested queries this round:
#: the 11 timestamp-flip re-attests (newest green row predates the
#: round-6 native-TIMESTAMP reader), q_approx_distinct (r8 code
#: change: split distinct/sketch agg) and the histogram reworks
#: (q_spearman_corr / q_weighted_median ranks; q_percentiles /
#: q_winsorize order statistics; q_pctldef bucketed rank), + 8
#: oldest-green sentinels.
RE_ATTESTS = {
    "q_approx_distinct",
    "q_spearman_corr",
    "q_weighted_median",
    "q_percentiles",
    "q_winsorize",
    "q_pctldef",
    "q_sessionize", "q_asof_event", "q_gap_fill", "q_moving_avg",
    "q_dedup_firstlast", "q_tumbling_counts", "q_funnel",
    "q_cohort_retention", "q_date_funcs", "q_date_format",
    "q_intnx_intck",
}
SENTINELS = {"q_bucketed_join", "q_exact_dup"}


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


def test_round8_rotation_targets_inside_window() -> None:
    """Round-8 plan (VERDICT r7 items 2, 5-7): the seven new operators,
    the DECIMAL-widened mixture pair, and the 11 timestamp-flip
    re-attests must all sit in slots 0-49."""
    must = {
        "q_mixture_apply", "q_knn_ivf_batch", "q_bm25", "q_rrf_hybrid",
        "q_epoch_shuffle", "q_containment_pairs", "q_ngram_diversity",
        "q_domain_mixture", "q_mixture_epochs",
        "q_gopher_rules", "q_quality_prune", "q_span_dedup",
        "q_reservoir_sample", "q_temperature_mixture", "q_neardup_apply",
    } | RE_ATTESTS
    window = set(list(registry.queries_map())[:WINDOW])
    assert must <= window, f"outside window: {sorted(must - window)}"


def test_round8_window_finishes_attestation() -> None:
    """The r8 window must drain the ENTIRE never-attested backlog
    (recomputed from pre-r8 CORRECTNESS artifacts, no hand list) and
    spend every remaining slot only on declared re-attests/sentinels —
    after this round no registered query lacks a driver-green row."""
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
