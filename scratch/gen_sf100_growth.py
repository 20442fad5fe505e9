"""Generate /tmp/sf100g — the THIRD decade of scale evidence, cheap
version (VERDICT r8 item 7): only the two tables the three growth
queries touch (orders for q_window_rank; events for q_sessionize and
q_dedup_firstlast), as a 10x key-shifted replication of /tmp/sf10.
Strides are 10x the sf10 strides so all 1000 effective copies of the
sf0.1 universe stay key-disjoint. Run gen_sf1_bench.py then
gen_sf10_bench.py first.
"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from sas_etl_spark.session import get_spark

SRC = "/tmp/sf10"
DST = "/tmp/sf100g"
COPIES = 10
TABLES = ("orders", "events")

SHIFTS = {  # 10x the gen_sf10 strides
    "o_orderkey": 1_000_000_000,
    "o_custkey": 100_000_000,
    "event_id": 10_000_000_000,
    "user_id": 100_000_000,
}

spark = get_spark("gen_sf100g", cpus=32, shuffle_partitions=32)

for name in TABLES:
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
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
    out.repartition(64).write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
    print(name, "->", f"{DST}/{name}.parquet")
print("done")
