"""A/B/C bench for q_knn_cosine forms at sf0.1 (VERDICT r2 item 5).

Forms:
  A: current — crossJoin(broadcast(1-row qdf)) -> BNLJ + unrolled cosine
     in post-join Project.
  B: r1 — driver .first() fetch of the query vector, then
     cosine_topk_literal (literal-bound unrolled cosine, one scan job).
  C: dummy-key equi-join -> BroadcastHashJoin (whole-stage codegen
     keeps the unrolled cosine inside the generated stage).
"""

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.similarity import cosine, cosine_topk_literal
from sas_etl_spark.session import get_spark

SF = "/root/testdata/sf0.1"
DIM = 64

spark = get_spark("ab_knn")
emb = load_table(spark, SF, "embeddings")
emb.count()  # warm FS cache / JIT


def form_a():
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qdf))
        .select("vec_id", F.round(cosine("embedding", "qv", dim=DIM), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


def form_b():
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = cosine_topk_literal(emb.filter(F.col("vec_id") != 0), list(qv), 10)
    return out.select("vec_id", F.round("sim", 4).alias("sim")).orderBy(
        F.desc("sim"), F.asc("vec_id")
    ).limit(10)


def form_c():
    qdf = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qv"))
        .withColumn("_k", F.lit(1))
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(qdf), "_k")
        .select("vec_id", F.round(cosine("embedding", "qv", dim=DIM), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


def bench(fn, reps=7, warmup=2, rebuild=False):
    """bench.py protocol: plan built once, warmed, median of reps.
    rebuild=True also measures the build-plan-every-time cost."""
    df = fn()
    for _ in range(warmup):
        df.toPandas()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        if rebuild:
            df = fn()
        pdf = df.toPandas()
        times.append(time.perf_counter() - t0)
    return statistics.median(times), pdf


def form_d():
    """HOF cosine against a literal query array — tiny expression tree
    (planning-cheap), interpreted per-row (fine at 2k rows; the
    dim-unrolled form wins only when row count >> planning cost)."""
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    return (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(cosine("embedding", qlit.alias("qv")), 4).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


def form_e():
    """HOF cosine + broadcast join (single job, no driver fetch)."""
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qdf))
        .select("vec_id", F.round(cosine("embedding", "qv"), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


def form_f():
    """Arrow-vectorized pandas UDF: numpy matrix-vector cosine."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    q = np.asarray(qv, dtype=np.float64)
    qn = np.sqrt((q * q).sum())

    @pandas_udf("double")
    def cos(col: pd.Series) -> pd.Series:
        m = np.stack(col.to_numpy())
        m = m.astype(np.float64)
        sims = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
        return pd.Series(sims)

    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cos("embedding"), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


def form_d2():
    """HOF cosine against a SINGLE-NODE literal array (F.lit(list)) —
    the smallest possible tree."""
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    qlit = F.lit([float(x) for x in qv])
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cosine("embedding", qlit.alias("qv")), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


def form_g_floor():
    """Floor: same scan/TakeOrdered shape with a trivial expression."""
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(F.element_at("embedding", 1).cast("double"), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


def form_d3():
    """Single-node literal query array + driver-folded query norm:
    per-row work = HOF dot + HOF candidate-norm only."""
    import math

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
    qn = math.sqrt(sum(x * x for x in qv))
    from sas_etl_spark.operators.similarity import dot, l2_norm

    sim = dot("embedding", F.lit(qv)) / (l2_norm("embedding") * F.lit(qn))
    return (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(sim, 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


spark.conf.set("spark.sql.adaptive.enabled", "false")  # bench.py gates AQE off at sf0.1
for name, fn in [("B_literal", form_b), ("D2_hof_litarr", form_d2),
                 ("D3_lit_qnorm", form_d3), ("G_floor", form_g_floor)]:
    med, pdf = bench(fn)
    med_rb, _ = bench(fn, rebuild=True)
    print(f"{name}: prepared {med*1000:.1f} ms | rebuilt {med_rb*1000:.1f} ms | top3={pdf.head(3).values.tolist()}")
spark.stop()
