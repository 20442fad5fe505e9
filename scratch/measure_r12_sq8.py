"""Round-12 measurement: IVF build + serve over the SQ8-compressed
artifact vs the raw layout, at a large SF (default /tmp/sf100llm).
Protocol: scratch/measure_r11_growth.py's — one session, fresh plans,
floor control, ui progress off."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SFDIR = os.environ.get("SFDIR", "/tmp/sf100llm")

from pyspark.sql import functions as F  # noqa: E402

from sas_etl_spark.catalog import load_table  # noqa: E402
from sas_etl_spark.operators.ann import (  # noqa: E402
    build_ivf_index,
    ivf_topk_batch_vectorized,
    read_ivf_index,
)
from sas_etl_spark.session import get_spark  # noqa: E402

spark = get_spark("r12-sq8-measure", shuffle_partitions=32)

emb = load_table(spark, SFDIR, "embeddings")
corpus = emb.filter(F.col("vec_id") >= 100)
queries = emb.filter(F.col("vec_id") < 100).select(
    F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
)
queries.count()  # warm scan

t0 = time.perf_counter()
spark.range(10).toPandas()
print(f"floor_ms={1000 * (time.perf_counter() - t0):.1f}", flush=True)

knobs = dict(
    n_centroids=16, refine_iters=2, sim_round_dp=4, mean_round_dp=6,
    train_ppm=250_000, train_seed=31,
)


def du(d):
    total = 0
    for root, _, files in os.walk(d):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


for mode in (None, "int8"):
    d = f"/tmp/r12_sq8_idx_{mode or 'raw'}"
    os.system(f"rm -rf {d}")
    t0 = time.perf_counter()
    build_ivf_index(corpus, d, quantize=mode, **knobs)
    tb = time.perf_counter() - t0
    sz = du(os.path.join(d, "lists")) / 1e6
    t0 = time.perf_counter()
    centroids, lists = read_ivf_index(spark, d)
    out = ivf_topk_batch_vectorized(
        centroids, lists, queries, k=10, nprobe=4,
        round_dp=4, probe_round_dp=4,
    )
    n = out.count()
    ts = time.perf_counter() - t0
    print(
        f"mode={mode or 'raw'} build_s={tb:.1f} lists_MB={sz:.0f} "
        f"serve_cold_s={ts:.2f} rows={n}",
        flush=True,
    )
