"""Generate DISTINCT-content embeddings fixtures for the semdedup
growth rows: /tmp/demb_sf1 (20k vectors) and /tmp/demb_sf10 (200k),
64-dim floats from seeded xxhash64 draws (every vector distinct), with
the registered planting convention downstream (q_semdedup clones
vec_id % 25 == 0 at +1e9 scaled by 2) providing the only >= 0.99
pairs. JVM-side generation, writes in seconds."""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from sas_etl_spark.session import get_spark

spark = get_spark("gen_distinct_emb", shuffle_partitions=32)

for dst, n in (("/tmp/demb_sf1", 20_000), ("/tmp/demb_sf10", 200_000)):
    base = spark.range(n).withColumnRenamed("id", "vec_id")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2001)) - 1000) / 1000.0
        ).cast("float"),
    )
    base.select("vec_id", vec.alias("embedding")).repartition(16).write.mode(
        "overwrite"
    ).parquet(f"{dst}/embeddings.parquet")
    print(dst, spark.read.parquet(f"{dst}/embeddings.parquet").count())
