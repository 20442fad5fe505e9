"""Round-14 SemDeDup ingest-cadence measurement (VERDICT r13 item 2).

On the distinct-embedding fixtures (/tmp/demb_sf1 = 20k vectors,
/tmp/demb_sf10 = 200k), measure the build-once / serve-many economics
of semdedup_against_index vs re-clustering per ingest:

- build ONCE over the master (90% of vectors) with the shipped
  k = semdedup_k_for(n) rule;
- serve THREE arriving batches (novel vectors + planted exact-2x
  copies of master vectors), asserting each batch's served pairs are
  exactly its planted set (recall 1.0 by the IEEE co-cluster
  argument);
- compare one full re-cluster over master+batch (what q_semdedup's
  shape pays per ingest) as the amortization baseline.

Run: python scratch/measure_r14_semdedup_serve.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from sas_etl_spark.operators.ann import (
    build_ivf_index,
    semdedup_against_index,
    semdedup_k_for,
)
from sas_etl_spark.session import get_spark

spark = get_spark(extra_confs={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

TRAIN_PPM = 250_000
SEED = 31

for sf_dir in ("/tmp/demb_sf1", "/tmp/demb_sf10"):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    master = emb.filter(F.col("vec_id") % 10 != 0).localCheckpoint(eager=True)
    n_master = master.count()
    k = semdedup_k_for(n_master)
    table_dir = f"/tmp/r14_semdedup_idx_{sf_dir.rsplit('_', 1)[-1]}"

    t = time.perf_counter()
    build_ivf_index(
        master, table_dir, n_centroids=k, refine_iters=2,
        sim_round_dp=4, mean_round_dp=6,
        train_ppm=TRAIN_PPM, train_seed=SEED,
    )
    t_build = time.perf_counter() - t

    serve_walls = []
    for i in range(3):
        novel = emb.filter(
            (F.col("vec_id") % 10 == 0) & (F.col("vec_id") % 30 == 10 * i)
        )
        plant_src = master.filter(F.col("vec_id") % 75 == 25 * i + 1)
        planted = plant_src.select(
            (F.col("vec_id") + 1_000_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * F.lit(2.0)).cast("float")
            ).alias("embedding"),
        )
        batch = novel.unionByName(planted).localCheckpoint(eager=True)
        n_planted = planted.count()
        t = time.perf_counter()
        pairs = semdedup_against_index(
            spark, table_dir, batch, threshold=0.99
        ).localCheckpoint(eager=True)
        n_pairs = pairs.count()
        serve_walls.append(time.perf_counter() - t)
        # recall check: exactly the planted (copy, original) relation
        assert n_pairs == n_planted, (sf_dir, i, n_pairs, n_planted)
        bad = pairs.filter(
            F.col("batch_id") - 1_000_000_000 != F.col("master_id")
        ).count()
        assert bad == 0, (sf_dir, i, "non-planted pair served")

    # amortization baseline: what q_semdedup's shape pays PER INGEST —
    # re-cluster master+batch, then the full within-cluster pairs
    # stage over the whole corpus (not just batch x members)
    from sas_etl_spark.operators.ann import read_ivf_index
    from sas_etl_spark.operators.similarity import dot, l2_norm

    t = time.perf_counter()
    full_dir = f"{table_dir}_full"
    build_ivf_index(
        master.unionByName(batch), full_dir, n_centroids=k,
        refine_iters=2, sim_round_dp=4, mean_round_dp=6,
        train_ppm=TRAIN_PPM, train_seed=SEED,
    )
    _, lists = read_ivf_index(spark, full_dir)
    va = lists.select(
        F.col("vec_id").alias("a_id"), "centroid_id",
        F.col("embedding").alias("_va"), F.col("vec_norm").alias("_na"),
    )
    vb = lists.select(
        F.col("vec_id").alias("b_id"), "centroid_id",
        F.col("embedding").alias("_vb"), F.col("vec_norm").alias("_nb"),
    )
    n_full_pairs = (
        va.join(vb, "centroid_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            F.round(dot("_va", "_vb") / (F.col("_na") * F.col("_nb")), 6)
            >= 0.99
        )
        .count()
    )
    t_full = time.perf_counter() - t

    print(
        f"semdedup_serve {sf_dir}: n_master={n_master} k={k} "
        f"build_once {t_build:.1f}s serve_batches "
        f"{'/'.join(f'{w:.1f}' for w in serve_walls)}s "
        f"full_recompute_per_ingest {t_full:.1f}s "
        f"(pairs_found_full={n_full_pairs}) recall=planted-exact",
        flush=True,
    )
