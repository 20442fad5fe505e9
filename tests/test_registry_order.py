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


def test_round6_rotation_targets_inside_window() -> None:
    """Round-6 plan (VERDICT r5 items 1, 4, 6): the 28 queries whose
    newest driver-green row is r2, plus everything new / regraduated /
    code-changed this round, must sit in slots 0-49."""
    stale_r2 = {
        "q_join3_revenue", "q_pricing_summary", "q_window_rank",
        "q_case_when", "q_derive_cols", "q_filter_pred",
        "q_format_lookup", "q_project_rename", "q_string_funcs",
        "q_string_funcs2", "q_regex_extract", "q_math_rowwise",
        "q_rank_ntile", "q_rank_ties_mean", "q_running_total",
        "q_union_distinct", "q_intersect", "q_nodupkey",
        "q_distinct_rows", "q_dupout", "q_udf_charge",
        "q_udaf_weighted", "q_grouped_zscore", "q_pivot_api",
        "q_unpivot", "q_corr_stats", "q_univariate_moments",
        "q_freq_chisq",
    }
    new_or_changed_r6 = {
        "q_interleave", "q_rank_tie_modes", "q_crosstab_pct",
        "q_repetition_ratio", "q_ngram_contamination",
        "q_unigram_logprob", "q_embed_quantize",
        "q_format_ranges", "q_pivot_multi", "q_merge_many_to_many",
        "q_fixedwidth_roundtrip", "q_stream_stateful_totals",
        "q_market_basket", "q_weighted_stats",
        "q_sample", "q_approx_distinct",
        "q_approx_percentile", "q_knn_ivf", "q_quality_checks",
        "q_rfm_segments", "q_knn_cosine",
    }
    window = set(list(registry.queries_map())[:WINDOW])
    must = stale_r2 | new_or_changed_r6
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
