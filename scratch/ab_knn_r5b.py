"""Round-5 A/B under the BENCH protocol: plan built once, timed
toPandas() per run (matches bench.py / DuckDB prepared-statement)."""
import statistics, sys, time
sys.path.insert(0, "/root/repo")
import math
import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.similarity import cosine_topk_literal
from sas_etl_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark("ab_knn_r5b", shuffle_partitions=4)
spark.conf.set("spark.sql.adaptive.enabled", "false")  # bench gates AQE off at this size
emb = load_table(spark, SF, "embeddings")
emb.count()
qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
cand = emb.filter(F.col("vec_id") != 0)

_q = np.array(qv, dtype=np.float64)
_qn = np.linalg.norm(_q)

@pandas_udf("double")
def _cos_pd(v: pd.Series) -> pd.Series:
    m = np.vstack(v.to_numpy())
    sims = (m.astype(np.float64) @ _q) / (np.linalg.norm(m, axis=1) * _qn)
    return pd.Series(sims)

plans = {
    "hof": cosine_topk_literal(cand, qv, 10, round_dp=4),
    "unroll": cosine_topk_literal(cand, qv, 10, unroll=True, round_dp=4),
    "hof_repart": cosine_topk_literal(cand.repartition(32), qv, 10, round_dp=4),
    "pandas": (
        cand.select("vec_id", F.round(_cos_pd("embedding"), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    ),
}
ref = None
for name, df in plans.items():
    rows = [tuple(r) for r in df.collect()]
    if ref is None:
        ref = rows
    assert rows == ref, f"{name} mismatch: {rows[:3]} vs {ref[:3]}"
for name, df in plans.items():
    for _ in range(2):
        df.toPandas()
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        df.toPandas()
        times.append(time.perf_counter() - t0)
    print(f"{name:12s} median {statistics.median(times)*1000:7.1f} ms  min {min(times)*1000:7.1f} ms")
