"""Streaming builders: bounded-fixture streams + windowed aggregations.

Design rules for the unbounded case (documented here, exercised on the
bounded stand-in):
- every aggregation is keyed by an event-time window -> state is
  droppable once the watermark passes the window end;
- watermark delay bounds state size AND late-data acceptance;
- session windows use F.session_window (gap-merged state), the
  streaming twin of the batch lag-gap cumulative-sum operator.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import normalize_event_ts
from sas_etl_spark.session import configure


def stream_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Any fixture table as a file stream (bounded stand-in for a real
    source; swap .format for kafka in production).

    Layout handling: ``{sf_dir}/{table}.parquet`` is a single FILE in
    the driver's testdata but a DIRECTORY of part-files in any
    Spark-written dataset (the sf1/sf10 bench fixtures, production
    tables). readStream requires a directory, and a pathGlobFilter
    naming the table entry matches ZERO part-files under the
    directory layout — the stream then reads nothing and downstream
    sinks stay empty (caught by the round-8 sf10 full-registry
    sweep). So: stream the table directory itself when it is one
    (object-store layouts always take this branch), else stream the
    parent with the glob pinned to the single file.
    """
    configure(spark)
    table_path = f"{sf_dir}/{table}.parquet"
    schema = spark.read.parquet(table_path).schema
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if os.path.isdir(table_path):
        return reader.parquet(table_path)
    return reader.option("pathGlobFilter", f"{table}.parquet").parquet(sf_dir)


def stream_events(spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1) -> DataFrame:
    """The events fixture as a file stream. ``ts`` is normalized to
    canonical TimestampType by the SAME total helper the batch path
    uses (catalog.normalize_event_ts), so both lanes track
    fixture-encoding changes in one place."""
    return normalize_event_ts(
        stream_table(spark, sf_dir, "events", max_files_per_trigger)
    )


def tumbling_agg(events: DataFrame, width: str = "6 hours", watermark: str = "1 hour") -> DataFrame:
    """Tumbling event-time window counts — the streaming twin of
    q_tumbling_counts (identical grouping expressions)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "total_value")
    )


def sliding_agg(
    events: DataFrame,
    width: str = "6 hours",
    slide: str = "3 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding event-time window counts — the streaming twin of
    q_sliding_window (identical window expression; each row lands in
    width/slide covering windows via Spark's internal explode)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Gap-based session windows per user (streaming twin of the batch
    lag-gap sessionizer)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once ingestion guard: drop duplicate events by key,
    keeping dedup state only within the watermark horizon
    (dropDuplicatesWithinWatermark). Unlike plain dropDuplicates —
    whose key state grows forever on an unbounded stream — state here
    is evicted once the watermark passes, so memory is bounded by
    (arrival rate x watermark delay), the only shape that survives an
    always-on 100 TB/day ingest. Contract: duplicates are only
    guaranteed dropped if they arrive within the watermark delay of
    the first occurrence (at-least-once upstreams re-deliver promptly,
    so that is the real-world case)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    if not src.isStreaming:
        return src.dropDuplicates(keys)
    return src.dropDuplicatesWithinWatermark(keys)


def run_bounded_to_memory(
    agg: DataFrame, spark: SparkSession, mode: str = "complete"
) -> DataFrame:
    """Drive a streaming query over a bounded source to completion via
    a memory sink; returns the final table as a batch DataFrame.
    Complete mode (aggregations): each trigger rewrites the full
    result, so the final table equals the batch answer. Append mode
    (dedup / row streams): the table accumulates every emitted row."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_bounded_to_parquet_sink(
    agg: DataFrame, path: str, mode: str = "complete"
) -> int:
    """Drive a streaming query into an EXACTLY-ONCE parquet sink via
    ``foreachBatch`` + epoch-partitioned dynamic overwrite; returns the
    final epoch id.

    The exactly-once contract without a transactional table format:
    every micro-batch writes ONLY its own ``_epoch=<id>`` partition
    with ``partitionOverwriteMode=dynamic``, so a batch that is
    retried after a failure (Structured Streaming re-runs the same
    epoch id) overwrites its own partial output instead of appending a
    duplicate — write idempotence per epoch, which together with the
    checkpoint's exactly-once epoch tracking gives an exactly-once
    sink. This is the standard file-sink pattern when Delta/Iceberg
    jars are unavailable (sources/lakehouse.py stays the ACID path).
    Readers take the max ``_epoch`` partition for complete-mode aggs
    (each epoch is a full rewrite) — partition pruning makes that a
    one-directory scan.
    """
    checkpoint = f"{path}__chk"

    def write_epoch(df: DataFrame, epoch_id: int) -> None:
        (
            df.withColumn("_epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(path)
        )

    q = (
        agg.writeStream.outputMode(mode)
        .foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # The authoritative final epoch is what the SINK holds, not
    # recentProgress: that buffer is size-capped and empty when a
    # restart against an existing checkpoint finds no new data
    # (returning 0 there would point readers at a stale partial).
    # Listed THROUGH Spark (partition-column scan of the sink), not
    # os.listdir: on a real cluster ``path`` is an HDFS/object-store
    # URI the driver's local filesystem cannot see. Reading only the
    # ``_epoch`` partition column touches directory metadata, no data
    # files.
    row = (
        agg.sparkSession.read.parquet(path)
        .agg(F.max("_epoch").alias("_max_epoch"))
        .first()
    )
    if row is None or row._max_epoch is None:
        raise RuntimeError(f"exactly-once sink at {path} holds no epochs")
    return int(row._max_epoch)
