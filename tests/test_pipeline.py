"""Metadata-driven pipeline runner (sas_etl_spark.pipeline)."""

from __future__ import annotations

import pytest

from sas_etl_spark.pipeline import run_pipeline
from tests.conftest import SF_SMOKE


def test_spec_compiles_and_runs(spark):
    out = run_pipeline(
        spark,
        SF_SMOKE,
        [
            {"op": "load", "table": "orders"},
            {"op": "filter", "where": "o_totalprice > 100000"},
            {"op": "derive", "cols": {"y": "year(o_orderdate)"}},
            {"op": "agg", "by": ["y"], "aggs": {"n": "count(*)"}},
            {"op": "sort", "by": ["y"]},
            {"op": "limit", "n": 3},
        ],
    )
    rows = out.collect()
    assert 0 < len(rows) <= 3
    assert set(out.columns) == {"y", "n"}


def test_bad_specs_fail_at_compile_with_step_index(spark):
    with pytest.raises(ValueError, match="step 0 .*must start with a load"):
        run_pipeline(spark, SF_SMOKE, [{"op": "filter", "where": "1=1"}])
    with pytest.raises(ValueError, match="unknown op 'explode'"):
        run_pipeline(
            spark, SF_SMOKE,
            [{"op": "load", "table": "orders"}, {"op": "explode"}],
        )
    with pytest.raises(ValueError, match="must be 'left=right'"):
        run_pipeline(
            spark, SF_SMOKE,
            [
                {"op": "load", "table": "lineitem"},
                {"op": "join", "table": "orders", "on": ["l_orderkey"]},
            ],
        )
    with pytest.raises(ValueError, match="empty pipeline"):
        run_pipeline(spark, SF_SMOKE, [])


def test_spec_plan_keeps_pushdown_and_broadcast(spark):
    """Declaring the job as data must not cost plan quality: the
    lineitem scan carries pushed filters and the orders side
    broadcasts at smoke SF."""
    from sas_etl_spark.plans import audit
    from sas_etl_spark.queries.complex_shapes import PIPELINE_SPEC

    a = audit(run_pipeline(spark, SF_SMOKE, PIPELINE_SPEC))
    assert a["pushed_filters"], a
    assert a["broadcast_joins"] >= 1, a["plan"]
    assert not a["cartesian"]


def test_self_join_spec_resolves_via_aliases(spark):
    out = run_pipeline(
        spark,
        SF_SMOKE,
        [
            {"op": "load", "table": "nation"},
            {"op": "join", "table": "nation", "on": ["n_regionkey=n_nationkey"]},
        ],
    )
    assert out.count() > 0


def test_missing_keys_and_empty_on_fail_with_step_index(spark):
    with pytest.raises(ValueError, match="step 1 .*missing required key 'where'"):
        run_pipeline(
            spark, SF_SMOKE, [{"op": "load", "table": "orders"}, {"op": "filter"}]
        )
    with pytest.raises(ValueError, match="step 1 .*at least one 'left=right'"):
        run_pipeline(
            spark, SF_SMOKE,
            [{"op": "load", "table": "lineitem"},
             {"op": "join", "table": "orders", "on": []}],
        )
