"""Shared fixtures: one local SparkSession per test session, a DuckDB
oracle connection per scale factor, and the parity comparator that
mirrors the driver's verify (row-count + schema + order-insensitive
values)."""

from __future__ import annotations

import os

import duckdb
import pytest

from sas_etl_spark.catalog import TABLES
from sas_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4"))
    s = get_spark(
        "sas_etl_spark-tests",
        cpus=cpus,
        shuffle_partitions=8,
        extra_confs={
            # static conf: managed-table home for bucketing tests
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="sas_etl_wh_")
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle_con():
    """DuckDB connection with fixture views registered at sf0.01 —
    the same registration the driver performs."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{SF_CORRECTNESS}/{t}.parquet')"
        )
    yield con
    con.close()
