"""Pin the SinglePartition-funnel Project-descend rule on synthetic
formatted plans (VERDICT r16 item 7): the r16 relaxation let the
funnel detector look through row-preserving Project chains, and the
r17 tightening (ADVICE r16) requires the descended-to HashAggregate
to prove constant/bounded state (partial/merge mode or zero keys).
These tests pin both edges so the exemption can't silently widen
again: Exchange->Project->{partial agg} stays benign,
Exchange->Project->{final keyed agg | Scan | Join} stays flagged,
and the historical direct-HashAggregate exemption is unchanged.

No Spark session needed — the detector is a pure parser over
explain('formatted') text, so the fixtures are hand-built plan
strings in exactly that shape (tree lines + detail blocks)."""

from __future__ import annotations

from sas_etl_spark.plans.audit import single_partition_funnels


def _plan(tree: list[str], details: str) -> str:
    return "== Physical Plan ==\n" + "\n".join(tree) + "\n\n" + details


def test_direct_partial_agg_child_stays_benign() -> None:
    """The classic two-stage global aggregate: partial directly under
    the exchange — the historical rule, untouched by the tightening."""
    plan = _plan(
        [
            "HashAggregate (4)",
            "+- Exchange (3)",
            "   +- HashAggregate (2)",
            "      +- Scan parquet  (1)",
        ],
        "(3) Exchange\nInput [1]: [sum#5L]\n"
        "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n\n"
        "(2) HashAggregate\nKeys [0]: []\n"
        "Functions [1]: [partial_sum(x#0L)]\n",
    )
    assert single_partition_funnels(plan) == []


def test_project_then_partial_agg_is_benign() -> None:
    plan = _plan(
        [
            "Window (5)",
            "+- Exchange (4)",
            "   +- Project (3)",
            "      +- HashAggregate (2)",
            "         +- Scan parquet  (1)",
        ],
        "(4) Exchange\nInput [2]: [k#1, s#2L]\n"
        "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n\n"
        "(2) HashAggregate\nKeys [1]: [k#1]\n"
        "Functions [1]: [partial_sum(x#0L)]\n",
    )
    assert single_partition_funnels(plan) == []


def test_project_then_final_keyed_agg_is_flagged() -> None:
    """The exact ADVICE r16 case: a FINAL groupBy aggregate behind a
    Project emits O(groups) rows into one task — must flag (bounded
    cases are whitelisted per query, not blessed structurally)."""
    plan = _plan(
        [
            "Window (5)",
            "+- Exchange (4)",
            "   +- Project (3)",
            "      +- HashAggregate (2)",
            "         +- Scan parquet  (1)",
        ],
        "(4) Exchange\nInput [2]: [k#1, s#2L]\n"
        "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n\n"
        "(2) HashAggregate\nKeys [1]: [k#1]\n"
        "Functions [1]: [sum(x#0L)]\n",
    )
    assert single_partition_funnels(plan) == [("4", "Project", "3")]


def test_project_then_final_global_agg_is_benign() -> None:
    """Zero grouping keys -> at most one row, whatever the mode."""
    plan = _plan(
        [
            "Window (5)",
            "+- Exchange (4)",
            "   +- Project (3)",
            "      +- HashAggregate (2)",
            "         +- Scan parquet  (1)",
        ],
        "(4) Exchange\nInput [1]: [s#2L]\n"
        "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n\n"
        "(2) HashAggregate\nKeys [0]: []\n"
        "Functions [1]: [sum(x#0L)]\n",
    )
    assert single_partition_funnels(plan) == []


def test_project_then_scan_is_flagged() -> None:
    plan = _plan(
        [
            "Sort (4)",
            "+- Exchange (3)",
            "   +- Project (2)",
            "      +- Scan parquet  (1)",
        ],
        "(3) Exchange\nInput [1]: [x#0L]\n"
        "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n",
    )
    assert single_partition_funnels(plan) == [("3", "Project", "2")]


def test_project_chain_then_join_is_flagged() -> None:
    plan = _plan(
        [
            "Window (6)",
            "+- Exchange (5)",
            "   +- Project (4)",
            "      +- Project (3)",
            "         +- SortMergeJoin Inner (2)",
            "            +- Scan parquet  (1)",
        ],
        "(5) Exchange\nInput [1]: [x#0L]\n"
        "Arguments: SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]\n",
    )
    assert single_partition_funnels(plan) == [("5", "Project", "4")]


def test_non_single_partition_exchange_ignored() -> None:
    plan = _plan(
        [
            "HashAggregate (4)",
            "+- Exchange (3)",
            "   +- Project (2)",
            "      +- Scan parquet  (1)",
        ],
        "(3) Exchange\nInput [1]: [x#0L]\n"
        "Arguments: hashpartitioning(k#1, 4), ENSURE_REQUIREMENTS, "
        "[plan_id=1]\n",
    )
    assert single_partition_funnels(plan) == []
