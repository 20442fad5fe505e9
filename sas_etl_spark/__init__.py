"""sas_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `baloghe/SAS-ETL` project.

The reference checkout at /root/reference/ was empty at survey time
(SURVEY.md §0), so the capability model is the SAS ETL vocabulary
(DATA step + ETL PROCs) documented in SURVEY.md §2, verified against
the driver's DuckDB oracle contract (__spark_entry__.py).

Architecture: thin, typed Python layer that *constructs* Catalyst
logical plans via the DataFrame API. No custom interpreter, no RDDs;
Catalyst optimizes, Tungsten executes (SURVEY.md §3.2, §4.1).

Layout:
  session    — SparkSession construction + runtime conf for oracle parity
  catalog    — fixture tables -> DataFrames / temp views
  registry   — QuerySpec registry backing __spark_entry__.py
  operators/ — reusable relational + LLM-pipeline operators
  sources/   — readers/writers (parquet, csv, json, binary)
  functions/ — scalar helpers (SAS-semantics row-wise funcs, coercion)
  plans/     — plan inspection / audit utilities
  streaming/ — Structured Streaming builders (batch-verified designs)
  queries/   — oracle-paired query definitions (the verified surface)
"""

from sas_etl_spark.registry import QUERIES, QuerySpec, oracle_sql_map, queries_map

__all__ = ["QUERIES", "QuerySpec", "queries_map", "oracle_sql_map"]
__version__ = "0.1.0"
