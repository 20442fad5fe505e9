"""Catalog behavior: caching, view registration, events normalization,
and error clarity."""

from __future__ import annotations

import pytest
from pyspark.sql.utils import AnalysisException

from sas_etl_spark.catalog import TABLES, load_table, register_views
from tests.conftest import SF_SMOKE


def test_table_cache_returns_same_handle(spark):
    a = load_table(spark, SF_SMOKE, "orders")
    b = load_table(spark, SF_SMOKE, "orders")
    assert a is b  # cached plan handle, no re-analysis


def test_events_ts_is_microsecond_timestamp(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    first = ev.orderBy("event_id").first()
    assert first.ts.year == 2024


def test_register_views_covers_all_tables(spark):
    register_views(spark, SF_SMOKE)
    for t in TABLES:
        assert spark.sql(f"select count(*) from {t}").first()[0] > 0


def test_missing_table_raises_analysis_error(spark):
    with pytest.raises(AnalysisException):
        load_table(spark, SF_SMOKE, "nonexistent_table").collect()
