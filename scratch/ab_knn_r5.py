"""Round-5 A/B for q_knn_cosine residual (VERDICT r4 item 6).

All forms literal-bind the query vector (r3 winner). Variables:
  hof        — current: HOF dot/norm, interpreted per-row, 1 scan task
  unroll     — element_at chains inside whole-stage codegen
  hof_repart — HOF + repartition(ncpus) to parallelize interpretation
  pandas     — Arrow-batched numpy dot (vectorized Python lane)
"""
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
spark = get_spark("ab_knn_r5")
emb = load_table(spark, SF, "embeddings")
emb.count()
qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
qnorm = math.sqrt(sum(x * x for x in qv))
cand = emb.filter(F.col("vec_id") != 0)

def hof():
    return cosine_topk_literal(cand, qv, 10, round_dp=4)

def unroll():
    return cosine_topk_literal(cand, qv, 10, unroll=True, round_dp=4)

def hof_repart():
    return cosine_topk_literal(cand.repartition(32), qv, 10, round_dp=4)

_q = np.array(qv, dtype=np.float64)
_qn = np.linalg.norm(_q)

@pandas_udf("double")
def _cos_pd(v: pd.Series) -> pd.Series:
    m = np.vstack(v.to_numpy())  # (batch, 64) float32
    sims = (m.astype(np.float64) @ _q) / (np.linalg.norm(m, axis=1) * _qn)
    return pd.Series(sims)

def pandas_form():
    return (
        cand.select("vec_id", F.round(_cos_pd("embedding"), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )

forms = {"hof": hof, "unroll": unroll, "hof_repart": hof_repart, "pandas": pandas_form}
ref = None
for name, fn in forms.items():
    rows = [(r.vec_id, r.sim) for r in fn().collect()]  # warmup + correctness
    if ref is None:
        ref = rows
    assert rows == ref, f"{name} mismatch: {rows[:3]} vs {ref[:3]}"
    times = []
    for _ in range(9):
        t0 = time.perf_counter()
        fn().collect()
        times.append(time.perf_counter() - t0)
    print(f"{name:12s} median {statistics.median(times)*1000:7.1f} ms  min {min(times)*1000:7.1f} ms")
