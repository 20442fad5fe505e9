"""Physical-plan audit helpers.

The 100 TB design rules (SURVEY.md §4.2) are properties of the
*physical plan*, not the code that built it — so they are asserted on
plans. Used by tests/test_plan_audit.py to pin, for every headline
query, that:

- filters/projections reached the parquet scan (PushedFilters /
  ReadSchema),
- small dimensions broadcast (BroadcastHashJoin, no shuffled SMJ for
  them),
- global top-N compiles to TakeOrderedAndProject (no full sort),
- no CartesianProduct against a non-broadcast side,
- no Exchange SinglePartition feeding a window (the "global window"
  anti-pattern that serializes 100 TB through one task).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """df.explain('formatted') as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(df: DataFrame, execute: bool = False) -> dict[str, object]:
    """Summarize scale-relevant plan facts.

    Pass ``execute=True`` when the query plan is adaptive (AQE wraps any
    plan with an exchange): the pre-execution formatted plan shows
    ``isFinalPlan=false`` with no ``[codegen id]`` annotations, so
    codegen facts are only observable on the executed final plan.
    """
    if execute:
        df.collect()
    plan = formatted_plan(df)
    return {
        "plan": plan,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "cartesian": "CartesianProduct" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
        "single_partition_exchanges": len(
            re.findall(r"Exchange SinglePartition", plan)
        ),
        "pushed_filters": re.findall(r"PushedFilters: \[(.*?)\]", plan),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", plan),
        # operators carrying "[codegen id : N]" run inside whole-stage
        # codegen; a hot-path Project without it is interpreted per-row
        "codegen_projects": len(re.findall(r"Project \[codegen id", plan)),
    }


def assert_no_cartesian(df: DataFrame, name: str = "") -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"{name}: CartesianProduct in plan"


def assert_no_exchange(df: DataFrame, name: str = "") -> None:
    """ZERO shuffle anywhere in the plan — the bar for bucketed
    co-located join pipelines, where the on-disk layout must carry the
    hash partitioning through join AND same-key aggregation."""
    plan = formatted_plan(df)
    assert "Exchange" not in plan, f"{name}: Exchange in plan:\n{plan}"


def assert_no_single_partition_exchange(df: DataFrame, name: str = "") -> None:
    """A SinglePartition exchange funnels the whole dataset through one
    task — fatal at scale. (TakeOrderedAndProject is fine: it merges
    only k rows per partition on the driver.)"""
    plan = formatted_plan(df)
    assert "Exchange SinglePartition" not in plan, (
        f"{name}: Exchange SinglePartition in plan:\n{plan}"
    )
