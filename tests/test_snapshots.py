"""Versioned snapshot tables (sources/snapshots.py): atomic publish,
pointer semantics, time travel."""

from __future__ import annotations

import os

import pytest

from sas_etl_spark.sources.snapshots import (
    current_version,
    read_snapshot,
    write_snapshot,
)


def test_publish_read_back_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "t")
    df1 = spark.range(5).withColumnRenamed("id", "k")
    assert write_snapshot(df1, table) == 1
    df2 = spark.range(3).withColumnRenamed("id", "k")
    assert write_snapshot(df2, table) == 2

    assert current_version(table) == 2
    assert read_snapshot(spark, table).count() == 3  # current
    assert read_snapshot(spark, table, version=1).count() == 5  # travel
    # v1 files untouched by the v2 publish (immutability)
    assert os.path.isdir(os.path.join(table, "v=1"))


def test_unpublished_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        current_version(str(tmp_path / "nope"))


def test_no_torn_state_files_left_behind(spark, tmp_path):
    table = str(tmp_path / "t2")
    write_snapshot(spark.range(4), table)
    leftovers = [d for d in os.listdir(table) if d.startswith(("_staging", "_ptr"))]
    assert leftovers == []


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Snapshot versions may add columns (dimension evolution);
    mergeSchema readback presents the union schema with nulls for
    pre-evolution rows — the plain-parquet analog of lakehouse schema
    evolution."""
    from pyspark.sql import functions as F

    table = str(tmp_path / "evo")
    v1 = spark.range(3).select(F.col("id").alias("k"))
    write_snapshot(v1, table)
    v2 = spark.range(3).select(
        F.col("id").alias("k"), F.lit("new").alias("extra")
    )
    write_snapshot(v2, table)

    both = (
        spark.read.option("mergeSchema", "true")
        .parquet(table + "/v=1", table + "/v=2")
    )
    assert set(both.columns) == {"k", "extra"}
    assert both.filter(F.col("extra").isNull()).count() == 3  # v1 rows


def test_crash_between_publish_and_pointer_is_invisible(spark, tmp_path):
    """Crash atomicity: if the writer dies AFTER renaming v=2 into
    place but BEFORE swinging _CURRENT, readers still resolve v1 and
    the next writer does not reuse version 2."""
    table = str(tmp_path / "t3")
    write_snapshot(spark.range(5), table)
    # simulate the torn write: v=2 exists, pointer still says 1
    spark.range(2).write.parquet(os.path.join(table, "v=2"))
    assert current_version(table) == 1
    assert read_snapshot(spark, table).count() == 5
    v = write_snapshot(spark.range(7), table)
    assert v == 3  # never clobbers the orphaned v=2
    assert read_snapshot(spark, table).count() == 7
