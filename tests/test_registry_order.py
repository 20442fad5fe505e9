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


def test_round7_rotation_targets_inside_window() -> None:
    """Round-7 plan (VERDICT r6 items 1-3, 7): every query the
    OPERATORS.md ledger marks code-changed since its newest green row,
    plus every query changed by this round's broadcast-gating /
    degenerate-division / IVF-refinement work, must sit in slots 0-49;
    the rest of the window drains the never-attested backlog (pinned
    structurally below, not by name list)."""
    changed_since_attestation = {
        "q_knn_ivf", "q_range_join", "q_ship_priority",
        "q_jaccard_pairs",
    }
    changed_r7_never_attested = {
        "q_mode_per_group", "q_outlier_mad", "q_topk_other",
        "q_hhi", "q_anomaly_days",
    }
    window = set(list(registry.queries_map())[:WINDOW])
    must = changed_since_attestation | changed_r7_never_attested
    assert must <= window, f"outside window: {sorted(must - window)}"


def test_round7_window_drains_backlog_only() -> None:
    """Every non-re-attest slot must go to a NEVER-driver-attested
    query (recomputed from the CORRECTNESS artifacts — no hand list):
    spending a slot on an already-green, unchanged query would strand
    a backlog query for another full round."""
    import json
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    attested: set[str] = set()
    for f in repo.glob("CORRECTNESS_r*.json"):
        for name, rec in json.loads(f.read_text()).items():
            if rec.get("rows_match") and rec.get("schema_match") and not rec.get("err"):
                attested.add(name)
    re_attests = {
        "q_knn_ivf", "q_range_join", "q_ship_priority", "q_jaccard_pairs",
    }
    window = set(list(registry.queries_map())[:WINDOW])
    stragglers = (window - re_attests) & attested
    assert not stragglers, f"already-attested queries burning slots: {sorted(stragglers)}"


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
