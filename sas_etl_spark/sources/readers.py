"""Readers (SAS: PROC IMPORT / INFILE with informats; LIBNAME engines).

Explicit schemas everywhere: inferSchema re-scans the data and guesses
— informats never guess. SURVEY.md §2.1 #5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from sas_etl_spark.session import configure


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV ingest with a mandatory explicit schema (the informat)."""
    configure(spark)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """JSON-lines ingest with explicit schema."""
    configure(spark)
    return spark.read.schema(schema).json(path)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Opaque binary payload ingest (images/audio/video) via the
    binaryFile source: (path, modificationTime, length, content).
    The multimodal decode path consumes `content` (SURVEY.md §2.9 #56).
    """
    configure(spark)
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC ingest. Schema travels with the files (columnar,
    self-describing) — no explicit schema argument needed, unlike the
    text formats."""
    configure(spark)
    return spark.read.orc(path)
