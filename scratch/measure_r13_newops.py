"""Round-13 measurement: the two new capability operators at growth
SFs.

(1) SemDeDup under the paper's operating discipline — cluster count
    scales with the corpus (k ~ n/1250) so per-cluster pair fan-out
    stays ~constant; the registered fixture form pins k=16 at driver
    SFs where n/k is tiny. Reports assign/pair walls and candidate
    counts at /root/testdata/sf0.1 and /tmp/sf1.0 embeddings.

(2) Bloom-prefiltered decontamination in the production shape (small
    eval suite vs large train corpus) over the DISTINCT-content
    fixtures (/tmp/ddup_sf1, /tmp/ddup_sf10 — run
    scratch/gen_distinct_docs.py first): eval = ~1% slice
    (doc_id % 97 == 7), train = the rest. Reports bloom load factor,
    survivor count vs true-hit count (the FP tail), and wall vs the
    exact both-sides-shuffle twin computing the same relation.

Protocol: measure_r7.py's — fresh plan per sample, floor control,
console progress off at session build."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from sas_etl_spark.session import get_spark  # noqa: E402

spark = get_spark("r13-newops", shuffle_partitions=32,
                  extra_confs={"spark.ui.showConsoleProgress": "false"})

t0 = time.perf_counter()
spark.range(10).toPandas()
print(f"floor_ms={1000 * (time.perf_counter() - t0):.1f}", flush=True)

ONLY = os.environ.get("ONLY", "semdedup,bloom").split(",")

if "semdedup" in ONLY:
    from sas_etl_spark.operators.ann import (
        ivf_assign,
        kmeans_refine,
        seed_centroids,
    )
    from sas_etl_spark.operators.sampling import hash_bucket
    from sas_etl_spark.operators.similarity import cosine

    SEMDEDUP_DIRS = os.environ.get(
        "SEMDEDUP_DIRS", "/root/testdata/sf0.1,/tmp/sf1.0"
    ).split(",")
    for sf_dir in SEMDEDUP_DIRS:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        planted = emb.filter(F.col("vec_id") % 25 == 0).select(
            (F.col("vec_id") + 1_000_000_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * F.lit(2.0)).cast("float")
            ).alias("embedding"),
        )
        aug = emb.unionByName(planted)
        n = aug.count()
        k = max(16, n // 1250)
        augd = aug.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        t = time.perf_counter()
        train = augd.filter(
            hash_bucket("vec_id", 1_000_000, seed=31) < 250_000
        ).localCheckpoint(eager=True)
        cents = kmeans_refine(
            train, seed_centroids(train, k), 2,
            sim_round_dp=4, mean_round_dp=6,
        ).localCheckpoint(eager=True)
        t_kmeans = time.perf_counter() - t
        t = time.perf_counter()
        assign = ivf_assign(augd, cents, sim_round_dp=4).localCheckpoint(eager=True)
        t_assign = time.perf_counter() - t
        labeled = aug.join(assign, "vec_id")
        va = labeled.select(
            F.col("vec_id").alias("a_id"), "centroid_id",
            F.col("embedding").alias("_va"),
        )
        vb = labeled.select(
            F.col("vec_id").alias("b_id"), "centroid_id",
            F.col("embedding").alias("_vb"),
        )
        t = time.perf_counter()
        dropped = (
            va.join(vb, "centroid_id")
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(F.round(cosine("_va", "_vb"), 6) >= 0.99)
            .select("b_id")
            .distinct()
            .count()
        )
        t_pairs = time.perf_counter() - t
        print(
            f"semdedup {sf_dir}: n={n} k={k} kmeans {t_kmeans:.1f}s "
            f"assign {t_assign:.1f}s pairs+decide {t_pairs:.1f}s "
            f"dropped={dropped}",
            flush=True,
        )

if "bloom" in ONLY:
    from sas_etl_spark.operators.text import token_ngrams

    M, K = int(os.environ.get("BLOOM_M", 1 << 20)), 2

    def positions(col):
        return [
            F.pmod(F.xxhash64(F.lit(s), col), F.lit(M)) for s in range(K)
        ]

    for sf_dir in ("/tmp/ddup_sf1", "/tmp/ddup_sf10"):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        toks = docs.select(
            "doc_id",
            (F.col("doc_id") % 97 == 7).alias("_is_eval"),
            F.split("text", " ").alias("_toks"),
        )
        grams = toks.select(
            "doc_id",
            "_is_eval",
            F.explode(F.array_distinct(token_ngrams(F.col("_toks"), 13))).alias(
                "gram"
            ),
        )
        eval_grams = grams.filter("_is_eval").select("doc_id", "gram")
        train_grams = grams.filter(~F.col("_is_eval")).select("gram")

        # exact twin: distinct BOTH sides, shuffle join
        t = time.perf_counter()
        exact = (
            eval_grams.join(train_grams.distinct(), "gram")
            .groupBy("doc_id")
            .agg(F.countDistinct("gram").alias("n_shared_grams"))
        )
        n_exact = exact.count()
        t_exact = time.perf_counter() - t

        # bloom path: set-bit table from the eval side, map-side train probes
        t = time.perf_counter()
        bits = (
            eval_grams.select("gram").distinct()
            .select(F.explode(F.array(*positions("gram"))).alias("bit"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_bits = bits.count()
        surv = train_grams
        for pos in positions("gram"):
            surv = surv.join(F.broadcast(bits), pos == bits["bit"], "left_semi")
        surv = surv.distinct().localCheckpoint(eager=True)
        n_surv = surv.count()
        bloom = (
            eval_grams.join(surv, "gram")
            .groupBy("doc_id")
            .agg(F.countDistinct("gram").alias("n_shared_grams"))
        )
        n_bloom = bloom.count()
        t_bloom = time.perf_counter() - t
        true_hits = (
            eval_grams.select("gram").distinct()
            .join(surv, "gram", "left_semi").count()
        )
        assert n_bloom == n_exact
        print(
            f"bloom {sf_dir}: exact {t_exact:.1f}s bloom {t_bloom:.1f}s "
            f"({n_exact} docs) bits={n_bits} load={n_bits / M:.3f} "
            f"survivors={n_surv} true_hit_grams={true_hits}",
            flush=True,
        )
