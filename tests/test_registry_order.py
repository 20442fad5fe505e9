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


def test_round5_rotation_targets_inside_window() -> None:
    """Round-5 plan: every query the events-fixture drift broke (fixed
    this round via catalog.normalize_event_ts) or retyped
    (TIMESTAMP_NTZ -> canonical TIMESTAMP changes their input plan)
    must sit in slots 0-49, per VERDICT r4 items 1-2."""
    broken_r4_fixed_r5 = {
        "q_sessionize", "q_stream_tumbling", "q_stream_session",
        "q_stream_sliding", "q_stream_dedup", "q_stream_join",
    }
    events_retyped = {
        "q_tumbling_counts", "q_sliding_window", "q_session_window",
        "q_gap_fill", "q_asof_event", "q_dedup_firstlast",
        "q_moving_avg", "q_json_extract",
    }
    window = set(list(registry.queries_map())[:WINDOW])
    must = broken_r4_fixed_r5 | events_retyped
    assert must <= window, f"outside window: {sorted(must - window)}"


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
