"""Generate /tmp/sf100llm — documents + embeddings ONLY — as a 10x
key-shifted replication of /tmp/sf10 (fourth-decade LLM-lane check;
the relational growth trio already has /tmp/sf100g). Strides are 10x
the sf10 strides so all 1000 effective sf0.1 copies stay key-disjoint;
copy 0 keeps vec_id=0 (the query vector) unique.
Run scratch/gen_sf1_bench.py and gen_sf10_bench.py first.
"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from sas_etl_spark.session import get_spark

SRC = "/tmp/sf10"
DST = "/tmp/sf100llm"
COPIES = 10
SHIFTS = {"doc_id": 1_000_000_000, "vec_id": 1_000_000_000}

spark = get_spark("gen_sf100llm", shuffle_partitions=32)
for name in ("documents", "embeddings"):
    df = spark.read.parquet(f"{SRC}/{name}.parquet")
    copies = []
    for i in range(COPIES):
        c = df
        for col, stride in SHIFTS.items():
            if col in c.columns:
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * stride)).cast("long")
                )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{DST}/{name}.parquet"
    )
    print(name, "->", f"{DST}/{name}.parquet")
print("done")
