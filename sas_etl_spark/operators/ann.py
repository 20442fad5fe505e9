"""Approximate nearest-neighbor search — the 100 TB scale path for
vector similarity (SURVEY.md §2.9 #53; exact baseline in
similarity.py).

IVF (inverted-file) flavor:
  1. pick n_centroids deterministic seed centroids,
  2. assign every vector to its nearest centroid (one broadcast
     "cross join" + max_by — map-side only, no shuffle of the big
     side),
  3. at query time score centroids against the query, keep the top
     nprobe, and brute-force ONLY vectors assigned to those lists.

Cost: scan fraction ~ nprobe/n_centroids of the corpus instead of all
of it. nprobe = n_centroids degrades gracefully to exact search (used
by tests as an equivalence oracle). No .collect() anywhere — the probe
set is itself a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sas_etl_spark.operators.similarity import cosine, cosine_topk


def seed_centroids(
    emb: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroid seeds: the n lowest ids. (A k-means
    refinement can replace this without changing the search path.)"""
    return (
        emb.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
        )
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Assign each vector to its nearest (max-cosine) centroid.
    Broadcast nested-loop against the tiny centroid table + max_by
    aggregation; ties broken toward the lower centroid id."""
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "centroid_id",
        cosine(vec_col, "centroid_vec", dim).alias("_sim"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by(
            "centroid_id", F.struct(F.col("_sim"), -F.col("centroid_id"))
        ).alias("centroid_id")
    )


def ivf_topk(
    emb: DataFrame,
    query: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
    sim_col: str = "sim",
    dim: int | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """Top-k by cosine among vectors whose IVF list is one of the
    query's nprobe closest centroids. ``round_dp`` rounds the sim
    before the cut (see cosine_topk — cross-engine boundary rule)."""
    centroids = seed_centroids(emb, n_centroids, id_col, vec_col)
    assignments = ivf_assign(emb, centroids, id_col, vec_col, dim)
    probes = (
        centroids.crossJoin(F.broadcast(query))
        .select("centroid_id", cosine("centroid_vec", query_vec_col, dim).alias("_qsim"))
        .orderBy(F.desc("_qsim"), F.asc("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    candidate_ids = assignments.join(F.broadcast(probes), "centroid_id").select(id_col)
    candidates = emb.join(candidate_ids, id_col, "left_semi")
    return cosine_topk(
        candidates, query, k, id_col, vec_col, query_vec_col, sim_col, dim, round_dp
    )


def srp_signature(vec_col: str, num_bits: int = 16, dim: int = 64, seed: int = 7) -> "F.Column":
    """Signed-random-projection (hyperplane LSH) signature for cosine:
    bit b = sign of <v, h_b> where h_b is a deterministic pseudo-random
    hyperplane derived from xxhash64(seed, b, i) — no stored model, no
    Python; pure codegen. Vectors with high cosine agree on most bits.
    """
    planes = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(
                        *[
                            (
                                F.xxhash64(F.lit(seed), F.lit(b), F.lit(i)).cast("double")
                                / F.lit(float(2**63))
                            )
                            for i in range(dim)
                        ]
                    ),
                    lambda x, h: x.cast("double") * h,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for b in range(num_bits)
        ]
    )
    return F.aggregate(
        F.zip_with(
            planes,
            F.array(*[F.lit(1 << b).cast("long") for b in range(num_bits)]),
            lambda d, w: F.when(d > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def srp_bucket_candidates(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_bits: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Candidate pairs sharing an SRP bucket (identical num_bits-bit
    signature) — the LSH-bucketed cosine blocking path: only
    within-bucket pairs are ever compared, no all-pairs join."""
    sig = emb.select(
        F.col(id_col).alias("_id"),
        srp_signature(vec_col, num_bits, dim).alias("_sig"),
    )
    a = sig.select(F.col("_id").alias("a_id"), F.col("_sig").alias("_s1"))
    b = sig.select(F.col("_id").alias("b_id"), F.col("_sig").alias("_s2"))
    return (
        a.join(b, (a._s1 == b._s2) & (a.a_id < b.b_id))
        .select("a_id", "b_id")
    )
