"""Round-13 measurement: IVF-PQ vs SQ8 vs raw at a large SF (default
/tmp/sf100llm, 2M vectors): build wall, lists-artifact bytes, cold
vectorized serve wall, and recall — PQ/SQ8/raw@nprobe=4 each scored
against the raw index at nprobe=16 (the exact-serve ground truth).
Protocol: measure_r12_sq8.py's — one session, fresh plans, floor
control, ui progress off."""
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SFDIR = os.environ.get("SFDIR", "/tmp/sf100llm")
WORK = os.environ.get("WORK", "/tmp/r13_pq_measure")

from pyspark.sql import functions as F  # noqa: E402

from sas_etl_spark.catalog import load_table  # noqa: E402
from sas_etl_spark.operators.ann import (  # noqa: E402
    build_ivf_index,
    collect_pq_codebooks,
    ivf_topk_batch_vectorized,
    read_ivf_index,
)
from sas_etl_spark.session import get_spark  # noqa: E402
from sas_etl_spark.sources.snapshots import read_snapshot  # noqa: E402

spark = get_spark("r13-pq-measure", shuffle_partitions=32,
                  extra_confs={"spark.ui.showConsoleProgress": "false"})

emb = load_table(spark, SFDIR, "embeddings")
corpus = emb.filter(F.col("vec_id") >= 100)
queries = emb.filter(F.col("vec_id") < 100).select(
    F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
)
print("corpus rows:", corpus.count(), flush=True)

t0 = time.perf_counter()
spark.range(10).toPandas()
print(f"floor_ms={1000 * (time.perf_counter() - t0):.1f}", flush=True)

knobs = dict(
    n_centroids=16, refine_iters=2, sim_round_dp=4, mean_round_dp=6,
    train_ppm=250_000, train_seed=31,
)


def lists_bytes(d):
    total = 0
    for root, _, files in os.walk(os.path.join(d, "lists")):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def serve(d, nprobe):
    """Cold vectorized serve: fresh plan each call."""
    kw = {}
    centroids, lists = read_ivf_index(spark, d, decode=False)
    if os.path.isdir(os.path.join(d, "codebooks")):
        kw["pq_codebooks"] = collect_pq_codebooks(
            read_snapshot(spark, f"{d}/codebooks")
        )
    t = time.perf_counter()
    pdf = ivf_topk_batch_vectorized(
        centroids, lists, queries, k=10, nprobe=nprobe,
        round_dp=4, probe_round_dp=4, **kw
    ).toPandas()
    wall = time.perf_counter() - t
    return wall, pdf.groupby("qid")["vec_id"].apply(set).to_dict()


os.makedirs(WORK, exist_ok=True)
dirs = {}
for mode, q in (("raw", None), ("sq8", "int8"), ("pq", "pq8")):
    d = os.path.join(WORK, mode)
    dirs[mode] = d
    if os.path.isdir(os.path.join(d, "lists")):
        print(f"{mode}: reusing existing index", flush=True)
        continue
    shutil.rmtree(d, ignore_errors=True)
    t = time.perf_counter()
    build_ivf_index(corpus, d, quantize=q, **knobs)
    print(f"{mode}: build {time.perf_counter() - t:.1f}s "
          f"lists {lists_bytes(d) / 1e6:.1f} MB", flush=True)

_, exact = serve(dirs["raw"], nprobe=16)


def recall(approx):
    return sum(len(approx[k] & exact[k]) / len(exact[k]) for k in exact) / len(exact)


for mode in ("raw", "sq8", "pq"):
    walls = []
    for rep in range(3):
        w, served = serve(dirs[mode], nprobe=4)
        walls.append(w)
    print(
        f"{mode}: serve cold walls {[round(w, 2) for w in walls]} "
        f"recall@10 vs exact {recall(served):.4f} "
        f"lists {lists_bytes(dirs[mode]) / 1e6:.1f} MB",
        flush=True,
    )
