"""Generate /tmp/sf1.0 as a 10x key-shifted replication of sf0.1 —
BENCH-ONLY data (VERDICT r4 item 7: show real separation above the
~25-40 ms local job floor). Correctness stays pinned at driver SFs;
this is a throughput measure. Key shifts preserve join fan-out
(each copy is a disjoint TPC-H-ish universe sharing the tiny dims);
only copy 0 keeps vec_id=0, so the knn query vector stays unique.
Writes 8 files per table so scans parallelize like a real multi-file
dataset.
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from sas_etl_spark.catalog import TABLES, load_table
from sas_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1.0"
COPIES = 10

spark = get_spark("gen_sf1", shuffle_partitions=32)

SHIFTS = {  # column -> stride key-space per copy
    "o_orderkey": 10_000_000, "l_orderkey": 10_000_000,
    "o_custkey": 1_000_000, "c_custkey": 1_000_000,
    "l_partkey": 1_000_000, "p_partkey": 1_000_000,
    "l_suppkey": 100_000, "s_suppkey": 100_000,
    "event_id": 100_000_000, "user_id": 1_000_000,
    "doc_id": 10_000_000, "vec_id": 10_000_000,
}
SMALL_DIMS = {"region", "nation"}

for name in TABLES:
    df = load_table(spark, SRC, name)
    if name in SMALL_DIMS:
        out = df
    else:
        copies = []
        for i in range(COPIES):
            c = df
            for col, stride in SHIFTS.items():
                if col in c.columns:
                    c = c.withColumn(col, (F.col(col) + F.lit(i * stride)).cast("long"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
    out.repartition(8).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
    print(name, "->", f"{DST}/{name}.parquet")
print("done")
