"""LLM-lane second decade: the six bench_llm queries plus the rebuilt
MinHash lane at /tmp/sf1.0 (10x key-shifted sf0.1) — Spark medians
first, then the DuckDB oracle twins, SEQUENTIAL in one process (the
round-7 lesson), floor control in-session. The MinHash pair queries
run Spark-only: their brute-force Jaccard oracles are O(n^2) in DuckDB
(measured 50+ min at sf0.1, round 6) and are exact-verified at sf0.01.
Usage: python scratch/measure_llm_sf1.py [dir]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

ORACLED = [
    "q_bm25",
    "q_rrf_hybrid",
    "q_knn_ivf_batch",
    "q_mixture_apply",
    "q_ngram_diversity",
    "q_span_dedup",
]
#: The MinHash pair queries are output-quadratic in verbatim copies on
#: the replicated bench fixtures (45 pairs per 10-copy group at sf1,
#: 4950 per 100-copy group at sf10) — skip them via SKIP_MINHASH=1
#: when measuring decades where the copy-noise workload dominates.
SPARK_ONLY = (
    []
    if os.environ.get("SKIP_MINHASH")
    else ["q_near_dup_minhash", "q_incremental_neardup"]
)
N = 5
d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"


def med(fn, n=N):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


from sas_etl_spark.registry import QUERIES, queries_map
from sas_etl_spark.session import get_spark

queries_map()
spark = get_spark("llm_sf1", cpus=32, shuffle_partitions=64)
floor_df = spark.range(10)
print(f"floor {med(floor_df.collect) * 1000:.1f} ms", flush=True)
spark_ms = {}
for name in ORACLED + SPARK_ONLY:
    df = QUERIES[name].fn(spark, d)
    n_samples = 3 if name in SPARK_ONLY else N
    spark_ms[name] = med(df.toPandas, n=n_samples) * 1000
    print(f"{name:22s} spark {spark_ms[name]:9.1f} ms", flush=True)
spark.stop()

import duckdb

con = duckdb.connect()
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
for t in TABLES:
    try:  # LLM-only fixtures (sf100llm) ship just documents/embeddings
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    except duckdb.IOException:
        pass
for name in ORACLED:
    sql = QUERIES[name].oracle
    dms = med(lambda: con.execute(sql).fetch_arrow_table(), n=3) * 1000
    print(
        f"{name:22s} duck {dms:9.1f} ms   ratio {spark_ms[name] / dms:5.2f}x",
        flush=True,
    )
