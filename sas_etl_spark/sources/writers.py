"""Writers / sinks (SAS: PROC EXPORT, DATA lib.out, PROC APPEND,
conditional OUTPUT to multiple datasets). SURVEY.md §2.1 #6-7, §2.2 #11.

Scale conventions:
- parquet + optional partitionBy for downstream partition pruning;
- multi-output split caches the source ONCE then writes N filtered
  views — the SAS DATA step reads its input once for N OUTPUTs, and so
  do we (without the cache, N writes = N full scans).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines export (SAS: PROC JSON). One object per row; doubles
    serialize via Java's shortest-round-trip toString, so a read-back
    with the explicit schema is bit-lossless."""
    df.write.mode(mode).json(path)


def append_to(df: DataFrame, path: str) -> None:
    """PROC APPEND: add rows to an existing dataset (by-name schema
    evolution is the reader's concern; parquet appends are file-level)."""
    df.write.mode("append").parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed, sorted table (SAS analog: indexed dataset).

    Two tables bucketed by the same key and count join WITHOUT a
    shuffle of either side — the physical layout carries the hash
    partitioning. At 100 TB this converts every recurring fact⋈fact
    join on the bucket key from a full shuffle into a zipped local
    merge (tests assert the Exchange-free plan).

    ``path`` makes the table EXTERNAL with data at that location
    (e.g. a session scratch dir, cleaned at exit) instead of the
    cwd-relative spark-warehouse default.
    """
    writer = (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def multi_output_split(
    df: DataFrame, outputs: Mapping[str, Column], base_path: str
) -> dict[str, int]:
    """Conditional multi-output (SAS: IF cond THEN OUTPUT ds;).

    Writes one parquet dataset per named predicate under base_path,
    scanning the source once (cache + N filters). Rows matching
    several predicates go to several outputs, matching SAS OUTPUT
    semantics. Returns rows written per output.
    """
    df = df.cache()
    try:
        counts: dict[str, int] = {}
        for name, pred in outputs.items():
            subset = df.filter(pred)
            write_parquet(subset, f"{base_path}/{name}")
            counts[name] = subset.count()
        return counts
    finally:
        df.unpersist()


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC export (SAS: PROC EXPORT to a columnar warehouse store).
    Spark ships the ORC data source built-in; like parquet it carries
    types natively (no informat needed on re-read) and supports
    predicate pushdown + column pruning at scan."""
    df.write.mode(mode).orc(path)
