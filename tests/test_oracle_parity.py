"""Differential testing (SURVEY.md §5.1): every registered query with
an oracle must match DuckDB exactly at sf0.01 — the same comparison
the driver's verify performs."""

from __future__ import annotations

import pytest

from sas_etl_spark.registry import QUERIES, queries_map
from tests.conftest import SF_CORRECTNESS
from tests.parity import assert_parity

queries_map()  # populate registry

ORACLE_NAMES = sorted(n for n, s in QUERIES.items() if s.oracle)
ROWS_ONLY_NAMES = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, oracle_con, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_CORRECTNESS)
    assert_parity(sdf, oracle_con, spec.oracle, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, name):
    """Non-SQL-expressible ops: must run and return a stable schema."""
    spec = QUERIES[name]
    sdf = spec.fn(spark, SF_CORRECTNESS)
    assert sdf.columns, f"{name}: no columns"
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}
