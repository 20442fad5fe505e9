"""Fixture catalog: parquet tables -> DataFrames / temp views.

SAS analog: ``LIBNAME`` libraries mapping directories of datasets to a
namespace (SURVEY.md §1.1). Here a scale-factor directory of parquet
files maps to named DataFrames and optionally temp views.

The ``events`` table is stored as parquet ``timestamp[ns]``, which
Spark 4.x cannot read natively. With
``spark.sql.legacy.parquet.nanosAsLong=true`` the column arrives as a
long of epoch-nanoseconds; we convert to TimestampType (microseconds)
with *exact integer* division — ``ts DIV 1000`` — because the ns epoch
(~1.7e18) exceeds double's 2^53 integer range, so float division would
corrupt low-order digits. Truncation (floor for positive epochs)
matches DuckDB's own ns->us cast, keeping the oracle comparison exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.session import configure

#: All fixture tables, per TESTDATA.md / FIXTURES.md.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Table-handle cache: avoids re-running file listing + footer schema
#: resolution (and the Py4J conf round-trips in configure) on every
#: query build. DataFrames are immutable plan handles — safe to share.
#: Keyed per SparkContext so a fresh session never sees stale handles.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing types (events ns->us)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | list[str] = TABLES
) -> dict[str, DataFrame]:
    """Load several fixture tables as a name->DataFrame dict."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | list[str] = TABLES
) -> None:
    """Register fixture tables as temp views for the SQL API."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
