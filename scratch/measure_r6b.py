"""Measure round-6b queries at sf0.1: Spark (warm, median of 5) vs
the DuckDB oracle twin on the same parquet."""

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from sas_etl_spark.catalog import TABLES
from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
NEW = [
    "q_text_normalize", "q_chunk_docs", "q_pii_redact",
    "q_keyword_extract", "q_mode_per_group", "q_outlier_mad", "q_ewma",
    "q_partial_agg_merge", "q_correlated_subquery", "q_top_paths",
    "q_benford", "q_psi_drift", "q_class_balance", "q_forget_user",
    "q_incremental_dedup", "q_inverted_index", "q_skipgrams",
    "q_embed_dim_stats",
]

queries_map()
spark = get_spark("r6b-measure", shuffle_partitions=4)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")

print(f"{'query':28s} {'spark_ms':>9s} {'duck_ms':>9s} rows")
for name in NEW:
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    df.toPandas()  # warm
    st = []
    for _ in range(5):
        t0 = time.perf_counter()
        pdf = df.toPandas()
        st.append(time.perf_counter() - t0)
    con.execute(spec.oracle).df()  # warm
    dt = []
    for _ in range(5):
        t0 = time.perf_counter()
        con.execute(spec.oracle).df()
        dt.append(time.perf_counter() - t0)
    print(
        f"{name:28s} {1000 * statistics.median(st):9.1f} "
        f"{1000 * statistics.median(dt):9.1f} {len(pdf)}"
    )
spark.stop()
