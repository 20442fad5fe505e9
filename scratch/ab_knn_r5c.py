import statistics, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.similarity import cosine_topk_literal
from sas_etl_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark("ab_knn_r5c", shuffle_partitions=4)
spark.conf.set("spark.sql.adaptive.enabled", "false")
emb = load_table(spark, SF, "embeddings")
emb.count()
qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
cand = emb.filter(F.col("vec_id") != 0)
plans = {f"repart_{n}": cosine_topk_literal(cand.repartition(n), qv, 10, round_dp=4)
         for n in (4, 8, 16, 32, 64)}
plans["repart_32_unroll"] = cosine_topk_literal(cand.repartition(32), qv, 10, unroll=True, round_dp=4)
for name, df in plans.items():
    for _ in range(2):
        df.toPandas()
    times = []
    for _ in range(9):
        t0 = time.perf_counter(); df.toPandas(); times.append(time.perf_counter() - t0)
    print(f"{name:18s} median {statistics.median(times)*1000:7.1f} ms  min {min(times)*1000:7.1f} ms")
