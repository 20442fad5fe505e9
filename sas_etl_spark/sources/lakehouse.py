"""Lakehouse table formats (Delta / Iceberg / Hudi) — gated stubs.

The v1 image ships none of their jars; the engine's read/write
surface is parquet-first. These adapters exist so downstream code has
one import point: they raise a clear error locally and light up
unmodified on a cluster whose session carries the format jars.

The jar-free stand-in is sources/snapshots.py: versioned parquet
snapshots with an atomic pointer swing (time travel included), used
by q_snapshot_upsert as the durable upsert target until these
adapters activate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _format_available(spark: SparkSession, fmt: str) -> bool:
    try:
        spark.read.format(fmt).load("/nonexistent")  # probe classpath
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # ClassNotFound/DataSource-not-found => jar missing; any other
        # failure (path etc.) means the format resolved.
        return "Failed to find" not in msg and "ClassNotFound" not in msg
    return True


def read_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Read a delta/iceberg/hudi table if the runtime carries the jars."""
    if not _format_available(spark, fmt):
        raise NotImplementedError(
            f"{fmt} requires its connector jars on the classpath; the v1 "
            "image ships parquet only (SURVEY.md §2.1) — add the jars via "
            "spark.jars.packages to enable this path unchanged"
        )
    return spark.read.format(fmt).load(path)


def write_table(df: DataFrame, fmt: str, path: str, mode: str = "overwrite") -> None:
    if not _format_available(df.sparkSession, fmt):
        raise NotImplementedError(
            f"{fmt} writer requires connector jars (see read_table)"
        )
    df.write.format(fmt).mode(mode).save(path)
