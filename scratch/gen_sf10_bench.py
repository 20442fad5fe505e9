"""Generate /tmp/sf10 as a 10x key-shifted replication of /tmp/sf1.0
(itself 10x sf0.1) — BENCH-ONLY data for the second-decade scale
check (VERDICT r7 item 8). Strides are 10x the sf1 strides so all
100 effective copies of the sf0.1 universe stay key-disjoint; small
dims (region/nation) are shared, copy 0 keeps vec_id=0 unique.
Run scratch/gen_sf1_bench.py first.
"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from sas_etl_spark.catalog import TABLES
from sas_etl_spark.session import get_spark

SRC = "/tmp/sf1.0"
DST = "/tmp/sf10"
COPIES = 10

spark = get_spark("gen_sf10", shuffle_partitions=32)

SHIFTS = {  # 10x the gen_sf1 strides: room for the 10 sf1 sub-copies
    "o_orderkey": 100_000_000, "l_orderkey": 100_000_000,
    "o_custkey": 10_000_000, "c_custkey": 10_000_000,
    "l_partkey": 10_000_000, "p_partkey": 10_000_000,
    "l_suppkey": 1_000_000, "s_suppkey": 1_000_000,
    "event_id": 1_000_000_000, "user_id": 10_000_000,
    "doc_id": 100_000_000, "vec_id": 100_000_000,
}
SMALL_DIMS = {"region", "nation"}

for name in TABLES:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
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
    out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
    print(name, "->", f"{DST}/{name}.parquet")
print("done")
