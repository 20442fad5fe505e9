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


def test_normalize_event_ts_is_total(spark):
    """Every tolerated encoding maps to canonical TIMESTAMP; anything
    else fails loudly at the catalog, not N queries downstream."""
    import datetime

    import pytest as _pytest

    from sas_etl_spark.catalog import EVENTS_TS_DTYPE, normalize_event_ts

    naive = datetime.datetime(2024, 3, 1, 12, 0, 0, 123456)
    epoch_ns = 1_709_294_400_123_456_789  # 2024-03-01T12:00:00.123456789Z

    ntz = spark.createDataFrame([(naive,)], "ts timestamp_ntz")
    assert dict(normalize_event_ts(ntz).dtypes)["ts"] == EVENTS_TS_DTYPE
    assert normalize_event_ts(ntz).first().ts == naive  # UTC session tz

    ns = spark.createDataFrame([(epoch_ns,)], "ts bigint")
    got = normalize_event_ts(ns).first().ts
    assert got == naive.replace(microsecond=123456)  # exact ns->us floor

    already = spark.createDataFrame([(naive,)], "ts timestamp")
    assert normalize_event_ts(already) is already  # no-op, same handle

    with _pytest.raises(TypeError, match="fixture encoding changed"):
        normalize_event_ts(spark.createDataFrame([("x",)], "ts string"))


#: Spark-visible dtypes per fixture table AFTER load_table normalization
#: — the contract every query builds on. A driver-side fixture
#: regeneration that changes any name or type fails HERE, in one
#: obvious place, instead of as N query/oracle mismatches downstream.
#: (all parquet timestamp[us] columns — events.ts, o_orderdate,
#: l_shipdate — arrive as canonical TIMESTAMP via the session conf
#: parquet.inferTimestampNTZ.enabled=false; under the pinned UTC
#: session timezone this is value-identical to DuckDB's naive reading
#: and needs no projected cast on the scan.)
EXPECTED_SCHEMAS: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),  # canonical straight off the scan
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_fixture_schemas_have_not_drifted(spark):
    drift = {}
    for table, expected in EXPECTED_SCHEMAS.items():
        got = load_table(spark, SF_SMOKE, table).dtypes
        if got != expected:
            drift[table] = {"expected": expected, "got": got}
    assert not drift, f"fixture schema drift (regen under the code?): {drift}"


def test_expected_schemas_cover_all_tables():
    assert set(EXPECTED_SCHEMAS) == set(TABLES)


def test_run_sql_textual_surface(spark):
    from sas_etl_spark.catalog import run_sql

    n = run_sql(
        spark, SF_SMOKE, "select count(*) as n from orders join customer "
        "on o_custkey = c_custkey"
    ).first().n
    assert n > 0


def test_dead_app_cache_entries_evicted(spark):
    """Entries keyed by a stopped application's id are dropped on the
    next insert-after-miss (one live SparkContext per process, so a
    foreign app-id is always dead) — a long-lived multi-session host
    must not accumulate dead plan handles."""
    from sas_etl_spark import catalog

    live = spark.sparkContext.applicationId
    catalog._TABLE_CACHE[("app-dead-0xdead", SF_SMOKE, "orders")] = object()
    # trailing "/." resolves to the same files but forms a fresh cache
    # key, forcing the miss->insert path that runs eviction
    load_table(spark, SF_SMOKE + "/.", "nation")
    assert all(k[0] == live for k in catalog._TABLE_CACHE)


def test_dead_app_qvec_cache_evicted(spark):
    from sas_etl_spark.queries import llm
    from sas_etl_spark.registry import QUERIES, queries_map

    queries_map()
    live = spark.sparkContext.applicationId
    llm._QVEC_CACHE.pop((live, SF_SMOKE), None)  # force the miss path
    llm._QVEC_CACHE[("app-dead-0xdead", SF_SMOKE)] = [0.0]
    QUERIES["q_knn_cosine"].fn(spark, SF_SMOKE).collect()
    assert all(k[0] == live for k in llm._QVEC_CACHE)


def test_dead_app_scratch_roots_reclaimed(spark):
    import os
    import tempfile

    from sas_etl_spark import scratch as sc

    live = spark.sparkContext.applicationId
    dead_root = tempfile.mkdtemp(prefix="sas_etl_dead_test_")
    sc._ROOTS["app-dead-0xdead"] = dead_root
    sc._ROOTS.pop(live, None)  # force the (re)create path
    root = sc.scratch_root(spark)
    assert os.path.isdir(root)
    assert "app-dead-0xdead" not in sc._ROOTS
    assert not os.path.isdir(dead_root)  # reclaimed now, not at exit


def test_check_suite_rejects_quoted_names(spark):
    """Check names are interpolated into a stack() selectExpr; quotes
    or backticks must fail loudly at the API, not as SQL parse noise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from sas_etl_spark.operators.quality_checks import check_suite

    orders = load_table(spark, SF_SMOKE, "orders")
    with _pytest.raises(ValueError, match="quotes or backticks"):
        check_suite(orders, checks=[("bad'name", F.col("o_custkey").isNull())])
    with _pytest.raises(ValueError, match="quotes or backticks"):
        check_suite(orders, checks=[("bad`name", F.col("o_custkey").isNull())])
