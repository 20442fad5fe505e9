"""Unit tests for LLM-pipeline operators the SQL oracle can't check
(SURVEY.md §5.3): MinHash-LSH recall, SimHash robustness, IVF search,
language ID, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from sas_etl_spark.operators.ann import ivf_topk
from sas_etl_spark.operators.minhash import near_dup_pairs
from sas_etl_spark.operators.similarity import cosine_topk
from sas_etl_spark.operators.simhash import simhash_near_dup_pairs, with_simhash
from sas_etl_spark.operators.text import lang_id, winnow_fingerprint
from tests.conftest import SF_CORRECTNESS

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)
NEAR = BASE.replace("warm windowsill", "cold windowsill")  # one-token edit
FAR = (
    "completely different content about spark dataframes shuffles and "
    "catalyst optimizer rules running on large distributed clusters today"
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)],  # 4 = exact dup of 1
        "doc_id long, text string",
    )


def test_minhash_finds_near_and_exact_dups(spark):
    pairs = near_dup_pairs(_docs(spark), threshold=0.5)
    got = {(r.a_id, r.b_id): r.jaccard for r in pairs.collect()}
    assert (1, 4) in got and got[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in got and got[(1, 2)] >= 0.5  # one-token edit
    assert (2, 4) in got
    assert not any(3 in p for p in got)  # unrelated doc never pairs


def test_minhash_idempotent_on_disjoint_corpus(spark):
    docs = spark.createDataFrame(
        [(1, BASE), (2, FAR)], "doc_id long, text string"
    )
    assert near_dup_pairs(docs, threshold=0.3).count() == 0


def test_simhash_blocks_find_small_edits(spark):
    pairs = simhash_near_dup_pairs(_docs(spark), max_hamming=10)
    got = {(r.a_id, r.b_id): r.hamming for r in pairs.collect()}
    assert got.get((1, 4)) == 0  # identical text -> identical simhash
    assert (1, 2) in got and got[(1, 2)] <= 10  # small edit, small distance
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_deterministic(spark):
    a = with_simhash(_docs(spark)).select("doc_id", "simhash").collect()
    b = with_simhash(_docs(spark)).select("doc_id", "simhash").collect()
    assert sorted(a) == sorted(b)


def _emb(spark):
    from sas_etl_spark.catalog import load_table

    return load_table(spark, SF_CORRECTNESS, "embeddings")


def test_ivf_equals_exact_when_probing_everything(spark):
    emb = _emb(spark)
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cand = emb.filter(F.col("vec_id") != 0)
    exact = [r.vec_id for r in cosine_topk(cand, qv, k=10).collect()]
    ivf_all = [
        r.vec_id
        for r in ivf_topk(cand, qv, k=10, n_centroids=8, nprobe=8).collect()
    ]
    assert ivf_all == exact


def test_ivf_partial_probe_recall(spark):
    emb = _emb(spark)
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cand = emb.filter(F.col("vec_id") != 0)
    exact = {r.vec_id for r in cosine_topk(cand, qv, k=10).collect()}
    approx = {
        r.vec_id
        for r in ivf_topk(cand, qv, k=10, n_centroids=8, nprobe=4).collect()
    }
    assert len(approx) == 10
    assert len(exact & approx) >= 3  # random vectors: partial recall expected


def test_lang_id_on_real_sentences(spark):
    """Accuracy >= 0.95 over real per-language sentences (round-2
    advice: the ~100-word lists must actually classify, not just
    demonstrate the operator shape)."""
    cases = [
        ("en", "the cat sat on a mat and looked to the door"),
        ("en", "she said that it was not what they had asked for"),
        ("en", "we will be there when you are done with this work"),
        ("en", "i do not know why he would have done such a thing"),
        ("en", "most of the people were very happy about the news"),
        ("de", "der hund und die katze sind mit dem ball"),
        ("de", "ich habe nicht gewusst dass sie heute schon hier sind"),
        ("de", "wenn man nur wenig zeit hat muss man sehr schnell sein"),
        ("de", "das ist ein sehr gutes buch über die alte stadt"),
        ("de", "wir werden immer wieder nach hause gehen wollen"),
        ("es", "el perro y la gata juegan en un parque por la tarde"),
        ("es", "no sé por qué ella no ha venido con nosotros hoy"),
        ("es", "todos los niños estaban muy contentos con sus regalos"),
        ("es", "cuando llegamos a la casa ya era muy tarde para cenar"),
        ("es", "hay algo que te quiero decir antes de que te vayas"),
        ("fr", "le chien et le chat jouent dans les jardins de la ville"),
        ("fr", "je ne sais pas pourquoi ils sont partis sans nous"),
        ("fr", "nous avons été très heureux de vous voir ici encore"),
        ("fr", "il y a trop de monde dans cette petite salle"),
        ("fr", "elle était déjà partie quand nous sommes arrivés chez eux"),
        ("zh", "我 们 今天 要 去 看 他 们 的 新 房子"),
        ("zh", "因为 下雨 了 所以 我 没有 去 公园"),
        ("zh", "这个 问题 很 难 但是 我 可以 解决"),
        ("und", "zzz qqq www eee rrr"),
        ("und", "xylophone791 qwerty88 asdf"),
    ]
    rows = spark.createDataFrame(cases, "truth string, text string").select(
        "truth", lang_id(F.col("text")).alias("pred")
    )
    got = [(r.truth, r.pred) for r in rows.collect()]
    acc = sum(1 for t, p in got if t == p) / len(got)
    assert acc >= 0.95, got


def test_fingerprint_deterministic_and_edit_sensitive(spark):
    docs = _docs(spark)
    fp = docs.select("doc_id", winnow_fingerprint(F.col("text")).alias("fp"))
    got = {r.doc_id: r.fp for r in fp.collect()}
    assert got[1] == got[4]  # identical docs -> identical fingerprint
    assert got[1] != got[3]  # different docs -> different fingerprint
    again = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", winnow_fingerprint(F.col("text")).alias("fp")
        ).collect()
    }
    assert got == again


def test_srp_lsh_buckets_enrich_for_cosine(spark):
    """Hyperplane-LSH candidate pairs must be cosine-enriched vs the
    all-pairs background (the property that makes bucketing a valid
    blocking step)."""
    from sas_etl_spark.operators.ann import srp_bucket_candidates

    emb = _emb(spark)
    vecs = emb.select("vec_id", "embedding")
    cands = srp_bucket_candidates(emb, n_bands=1, bits_per_band=4)
    a = vecs.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("_va"))
    b = vecs.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("_vb"))
    from sas_etl_spark.operators.similarity import cosine

    cand_mean = (
        cands.join(a, "a_id").join(b, "b_id")
        .select(cosine("_va", "_vb").alias("c"))
        .agg(F.avg("c")).first()[0]
    )
    all_mean = (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(cosine("_va", "_vb").alias("c"))
        .agg(F.avg("c")).first()[0]
    )
    # random 64-dim pairs have mean cosine ~0 (sd ~1/8); bucketed pairs
    # sit clearly above — enrichment, not noise
    assert cand_mean > all_mean + 0.02


def test_srp_banding_recall_on_planted_neighbors(spark):
    """Round-2 advice #8: banded SRP must recover >= 0.9 of planted
    high-cosine pairs. 60 base vectors each get a perturbed twin at
    cosine ~0.93 (alpha=0.4 noise: cos = 1/sqrt(1+alpha^2)); per-bit
    agreement p = 1 - acos(.93)/pi = .88, so 8 bands x 8 bits give
    expected recall 1-(1-p^8)^8 = .97 — vs ~0.3 for the old single
    16-bit signature this replaces. Fully deterministic: fixed numpy
    seed + deterministic xxhash hyperplanes."""
    import numpy as np

    from sas_etl_spark.operators.ann import srp_bucket_candidates

    rng = np.random.default_rng(11)
    n = 60
    base = rng.standard_normal((n, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.standard_normal((n, 64))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    twin = base + 0.4 * noise
    twin /= np.linalg.norm(twin, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)] + [
        (1000 + i, [float(x) for x in twin[i]]) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cands = srp_bucket_candidates(emb, n_bands=8, bits_per_band=8)
    got = {(r.a_id, r.b_id) for r in cands.collect()}
    planted = {(i, 1000 + i) for i in range(n)}
    recall = len(got & planted) / n
    assert recall >= 0.9, recall


def test_ivf_recall_high_on_clustered_data(spark):
    """recall@10 >= 0.9 with nprobe/n_centroids = 2/16 on data with
    cluster structure — the regime real embedding corpora live in.

    Fixture embeddings are uniform-random (clusterless), where ANY
    inverted-file method degrades to recall ~ fraction-of-lists-probed
    (measured: 0.5-0.6 at nprobe=4/16; see the floor test below). So
    the >=0.9 claim is pinned here on planted clusters: 16 clusters of
    unit vectors, ids assigned round-robin so the deterministic
    lowest-id seeds land one per cluster, query next to cluster 0's
    center. IVF must route essentially all of exact top-10 (which
    lives in cluster 0) through the probed lists.
    """
    import math
    import random

    rng = random.Random(42)
    dim, n_clusters, per_cluster = 16, 16, 30

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    centers = [unit([rng.gauss(0, 1) for _ in range(dim)]) for _ in range(n_clusters)]

    def member(c):
        return unit([x + rng.gauss(0, 0.05) for x in centers[c]])

    rows = []
    for j in range(per_cluster):  # round-robin: ids 0..15 hit every cluster
        for c in range(n_clusters):
            rows.append((j * n_clusters + c, member(c)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = spark.createDataFrame(
        [(member(0),)], "qv array<float>"
    )

    exact = {
        r.vec_id
        for r in cosine_topk(emb, qv, k=10, dim=dim).collect()
    }
    approx = {
        r.vec_id
        for r in ivf_topk(
            emb, qv, k=10, n_centroids=n_clusters, nprobe=2, dim=dim
        ).collect()
    }
    recall = len(exact & approx) / 10
    assert recall >= 0.9, recall


def test_q_knn_ivf_registered_recall_floor(spark):
    """IVF vs the exact top-10 on the real fixture: pins a recall
    floor so a routing/probe regression (e.g. probing the WRONG
    lists -> recall ~0) fails loudly. The fixture corpus is uniform-
    random — the information-theoretic worst case for IVF, where
    recall tracks the probed fraction — so floors sit at 0.4, not the
    0.9 that clustered data achieves (test above).

    Round-7 measurements (recall@10 at sf0.001/0.01/0.1):
    seed centroids nprobe=4 -> 6/5/4; kmeans-refined (2 Lloyd iters)
    nprobe=3 -> 5/6/4. The refined path buys the same-or-better
    recall from strictly fewer probed lists (probe_frac 0.1875 vs
    0.25), which is what the registered q_knn_ivf now runs; its
    single-row recall_ok flag is driver-attested at a looser 0.3."""
    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.registry import queries_map

    qs = queries_map()
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    cand = emb.filter(F.col("vec_id") != 0)
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    exact = {r.vec_id for r in qs["q_knn_cosine"](spark, SF_CORRECTNESS).collect()}

    seed4 = {
        r.vec_id
        for r in ivf_topk(
            cand, qv, k=10, n_centroids=16, nprobe=4, sim_col="sim_raw"
        ).collect()
    }
    assert len(seed4) == 10
    assert len(exact & seed4) / 10 >= 0.4

    refined3 = {
        r.vec_id
        for r in ivf_topk(
            cand, qv, k=10, n_centroids=16, nprobe=3, sim_col="sim_raw",
            refine_iters=2,
        ).collect()
    }
    assert len(refined3) == 10
    # fewer lists probed, same floor held
    assert len(exact & refined3) / 10 >= 0.4

    row = qs["q_knn_ivf"](spark, SF_CORRECTNESS).collect()
    assert len(row) == 1 and row[0].recall_ok == 1 and row[0].k == 10
    assert row[0].probe_frac == 3 / 16


def test_wav_decode_rejects_garbage_and_skips_unknown_chunks():
    """decode_wav must be a real RIFF parser: reject non-WAV bytes,
    tolerate unknown chunks before data (real encoders emit LIST/fact
    chunks), and honor word alignment."""
    import struct

    import numpy as np
    import pytest as _pytest

    from sas_etl_spark.operators.multimodal import decode_wav, wav_bytes

    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")

    rate, ch, s = decode_wav(wav_bytes(800, 8000, 0))
    assert (rate, ch, len(s)) == (8000, 1, 800)

    # splice an odd-sized unknown chunk between fmt and data
    raw = wav_bytes(800, 8000, 0)
    fmt_end = raw.index(b"data")
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded to even
    spliced = raw[:fmt_end] + junk + raw[fmt_end:]
    rate2, ch2, s2 = decode_wav(spliced)
    assert rate2 == 8000 and np.array_equal(s, s2)


def test_kmeans_refine_recovers_planted_centers_and_lifts_recall(spark):
    """On planted clusters, 2 Lloyd iterations must (a) move each
    refined centroid onto its cluster's true center (cosine > 0.99)
    and (b) lift IVF recall at nprobe=1 to 1.0 — with arbitrary seed
    vectors, probing one cell of 16 rarely covers the whole top-10."""
    import math
    import random

    from sas_etl_spark.operators.ann import ivf_assign, kmeans_refine, seed_centroids

    rng = random.Random(7)
    dim, n_clusters, per_cluster = 16, 8, 40

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    centers = [unit([rng.gauss(0, 1) for _ in range(dim)]) for _ in range(n_clusters)]

    def member(c):
        return unit([x + rng.gauss(0, 0.08) for x in centers[c]])

    rows = []
    for j in range(per_cluster):
        for c in range(n_clusters):
            rows.append((j * n_clusters + c, member(c)))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    seeds = seed_centroids(emb, n_clusters)
    refined = kmeans_refine(emb, seeds, n_iters=2, dim=dim)

    # (a) every refined centroid sits on SOME true center
    got = {r.centroid_id: list(r.centroid_vec) for r in refined.collect()}
    for vec in got.values():
        best = max(
            sum(a * b for a, b in zip(vec, ctr))
            / (math.sqrt(sum(a * a for a in vec)) or 1.0)
            for ctr in centers
        )
        assert best > 0.99, best

    # (b) nprobe=1 exact recall with refined cells
    qv = spark.createDataFrame([(member(0),)], "qv array<float>")
    exact = {r.vec_id for r in cosine_topk(emb, qv, k=10, dim=dim).collect()}
    from sas_etl_spark.operators.ann import cosine as _cos

    assigned = ivf_assign(emb, refined, dim=dim)
    best_cell = (
        refined.crossJoin(F.broadcast(qv))
        .select("centroid_id", _cos("centroid_vec", "qv", dim).alias("_s"))
        .orderBy(F.desc("_s"))
        .limit(1)
        .select("centroid_id")
    )
    candidates = emb.join(assigned, "vec_id").join(F.broadcast(best_cell), "centroid_id")
    got10 = {r.vec_id for r in cosine_topk(candidates, qv, k=10, dim=dim).collect()}
    assert len(exact & got10) == 10


def test_audio_stats_lane_rejects_non_pcm16(spark):
    """The DISTRIBUTED decode lane (not just the driver-side helper)
    must refuse non-16-bit-PCM payloads instead of frombuffer-ing
    garbage — regression for the inline-copy drift where audio_stats
    skipped fmt/bit-depth validation."""
    import struct

    import pytest as _pytest

    from sas_etl_spark.operators.multimodal import audio_stats, wav_bytes

    good = wav_bytes(100, 8000, 0)
    # rewrite the fmt chunk to claim 24-bit samples
    fmt_at = good.index(b"fmt ") + 8
    bad = bytearray(good)
    struct.pack_into("<H", bad, fmt_at + 14, 24)
    df = spark.createDataFrame(
        [("clip_00000.wav", bytes(bad))], "path string, content binary"
    )
    with _pytest.raises(Exception, match="16-bit PCM"):
        audio_stats(df).collect()


def test_shingle_array_short_doc_contract(spark):
    """Documents under n tokens shingle to ONE whole-sequence entry —
    the contract every shingle oracle now mirrors with clamped list
    slicing (a sub-3-token doc must never produce an empty/NULL
    shingle set on either engine)."""
    from sas_etl_spark.operators.minhash import shingle_array

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "solo"), (3, "a b c d")], "doc_id long, text string"
    )
    got = {
        r.doc_id: sorted(r.sh)
        for r in df.select("doc_id", shingle_array(F.col("text")).alias("sh")).collect()
    }
    assert got == {
        1: ["alpha beta"],
        2: ["solo"],
        3: sorted(["a b c", "b c d"]),
    }


def test_lsh_adversarial_skew_bucket_bounded(spark):
    """Pathological LSH skew (VERDICT r5 item 8): 150 IDENTICAL docs
    collapse every band into one giant bucket — the worst-case shape
    for the band equi-join. The operator must (a) complete (AQE skew
    split owns the physical mitigation; the logical plan stays a plain
    equi-join — no cartesian), and (b) produce EXACTLY the C(150,2)
    true pairs among the clones, with zero candidates leaking across
    to the 50 distinct docs — i.e. the candidate set stays
    bucket-bounded instead of degrading toward all-pairs over the
    whole corpus."""
    n_dup, n_distinct = 150, 50
    rows = [(i, "the same exact duplicated text body repeated verbatim")
            for i in range(n_dup)]
    rows += [(1000 + j,
              f"unique document number {j} about topic {j * 17} entirely "
              f"different content {j * 31}")
             for j in range(n_distinct)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = near_dup_pairs(docs, threshold=0.8)
    got = pairs.collect()
    expected = n_dup * (n_dup - 1) // 2
    assert len(got) == expected
    assert all(r.a_id < n_dup and r.b_id < n_dup for r in got)
    assert all(r.jaccard == 1.0 for r in got)

    # the logical plan stays a skew-splittable equi-join — never a
    # cartesian product (which AQE could not rescue)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_duplicate_ngram_fraction_edges(spark):
    """Gopher repetition rule: short docs (< n tokens) score 0.0, a
    fully repeated doc approaches 1, and the word_ngrams guard never
    produces the descending-sequence artifact."""
    from sas_etl_spark.operators.text import duplicate_ngram_fraction, word_ngrams

    rows = [
        (1, "a"),                        # 1 token: no bigrams -> 0.0
        (2, "a b"),                      # exactly one bigram -> 0.0
        (3, "x y x y x y x y"),          # 7 bigrams, 2 distinct
        (4, "p q r s"),                  # all distinct -> 0.0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.f, r.n)
        for r in docs.select(
            "doc_id",
            F.round(duplicate_ngram_fraction(F.col("text"), 2), 6).alias("f"),
            F.size(word_ngrams(F.col("text"), 2)).alias("n"),
        ).collect()
    }
    assert got[1] == (0.0, 0)  # empty array, not [1, 0]-descending junk
    assert got[2] == (0.0, 1)
    assert got[3] == (round(1 - 2 / 7, 6), 7)
    assert got[4] == (0.0, 3)


def test_int8_quantize_codes_bounded_and_cosine_preserved(spark):
    """SQ8 contract: codes lie in [-127, 127], reconstruction MSE is
    tiny relative to vector scale, and top-k cosine neighborhoods
    survive quantization (the property a vector store actually
    needs)."""
    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.similarity import (
        cosine,
        int8_quantize_columns,
    )

    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    cols = int8_quantize_columns("embedding")
    stats = emb.select(
        F.array_max(cols["codes"]).alias("cmax"),
        F.array_min(cols["codes"]).alias("cmin"),
        cols["mse"].alias("mse"),
        (
            F.aggregate(
                F.col("embedding"),
                F.lit(0.0),
                lambda a, v: F.greatest(a, F.abs(v.cast("double"))),
            )
        ).alias("absmax"),
    ).collect()
    assert all(-127 <= r.cmin and r.cmax <= 127 for r in stats)
    assert all(r.mse < (r.absmax / 127) ** 2 for r in stats)  # < 1 LSB^2

    # cosine(original, reconstructed) ~ 1 for every vector
    recon = emb.select(
        cosine(
            F.col("embedding").cast("array<double>"),
            F.transform(cols["codes"], lambda q: q / cols["scale"]),
        ).alias("c")
    ).collect()
    assert all(r.c > 0.9999 for r in recon)


def test_mixture_arithmetic_1e10_rows(spark):
    """The domain-mixture plan arithmetic (q_domain_mixture /
    q_mixture_epochs / q_mixture_apply) is 128-bit — DECIMAL(38,0) DIV
    on Spark, HUGEINT // in the DuckDB oracle — so it stays exact past
    1e10-row sources, where the former BIGINT form overflows (w*T*1e6
    ~ 1e22). Pure plan rows: synthetic per-source counts, no row
    data."""
    import duckdb
    import pandas as pd
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    counts = pd.DataFrame(
        {
            "source": ["a", "b", "c"],
            "n_avail": [20_000_000_000, 13_000_000_007, 7_000_000_001],
            "w": [100, 50, 25],
        }
    )
    sdf = spark.createDataFrame(counts).selectExpr(
        "source",
        "n_avail",
        "w",
        "cast(n_avail as decimal(38,0)) * 1000 div w as t_cap",
    )
    t = sdf.selectExpr("min(t_cap) as t").collect()[0].t
    widened = {
        r.source: (r.rate_ppm, r.full_epochs, r.residual_ppm)
        for r in sdf.selectExpr(
            "source",
            "n_avail",
            f"cast(w as decimal(38,0)) * {t} * 1000000"
            f" div (1000 * cast(n_avail as decimal(38,0))) as rate_ppm",
            "cast(w as decimal(38,0)) * 80000000016 div 1000 as target",
        )
        .selectExpr(
            "source",
            "rate_ppm",
            "target div n_avail as full_epochs",
            "cast(target % n_avail as decimal(38,0)) * 1000000"
            " div n_avail as residual_ppm",
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("counts", counts)
    oracle = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            f"""
            select source,
                   cast(cast(w as hugeint) * {t} * 1000000
                        // (1000 * cast(n_avail as hugeint)) as bigint),
                   cast(tgt // n_avail as bigint),
                   cast(cast(tgt % n_avail as hugeint) * 1000000
                        // n_avail as bigint)
            from (select *, cast(w as hugeint) * 80000000016 // 1000 as tgt
                  from counts)
            """
        ).fetchall()
    }
    for src, vals in widened.items():
        assert vals == oracle[src], src
        assert all(v is not None for v in vals)  # no decimal overflow->NULL

    # the round-7 BIGINT form demonstrably cannot compute this plan:
    # under ANSI (Spark 4 default) the w*T*1e6 numerator overflows long
    with pytest.raises(ArithmeticException, match="ARITHMETIC_OVERFLOW"):
        sdf.selectExpr(
            f"w * {t} * 1000000 div (1000 * n_avail) as wrapped"
        ).collect()


def test_containment_catches_what_jaccard_misses(spark):
    """The asymmetric dedup contract: a short doc fully pasted inside
    a much longer one has containment 1.0 but Jaccard far below any
    dedup threshold — containment_filtered_pairs must flag (short ->
    long) only, and its prefix filter must lose nothing vs brute
    force."""
    from sas_etl_spark.operators.minhash import (
        containment_filtered_pairs,
        jaccard,
        shingle_array,
    )

    short = "alpha beta gamma delta epsilon zeta eta theta"
    long_ = short + (
        " one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen seventeen eighteen"
    )
    docs = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally unrelated words here")],
        "doc_id long, text string",
    )
    got = {
        (r.a_id, r.b_id): r.containment
        for r in containment_filtered_pairs(docs, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}  # short-in-long only; never reversed

    # the same pair's Jaccard is far below threshold — the relation
    # containment exists to catch
    j = docs.filter("doc_id = 1").crossJoin(
        docs.filter("doc_id = 2").select(F.col("text").alias("t2"))
    ).select(
        jaccard(shingle_array(F.col("text")), shingle_array(F.col("t2"))).alias("j")
    ).collect()[0].j
    assert j < 0.35


# -- persisted IVF index: build once / serve many (round 10) ----------


def test_ivf_index_build_serve_roundtrip(spark, tmp_path):
    """The persisted-index serve path must reproduce the in-memory
    batched path exactly when built with the same hyperparameters:
    build_ivf_index publishes (centroids, lists) as snapshot tables,
    read_ivf_index + ivf_topk_batch_from serves from the artifact."""
    from sas_etl_spark.operators.ann import (
        build_ivf_index,
        ivf_lists,
        ivf_topk_batch,
        ivf_topk_batch_from,
        kmeans_refine,
        read_ivf_index,
        seed_centroids,
    )

    emb = _emb(spark)
    cand = emb.filter(F.col("vec_id") >= 100)
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    table_dir = str(tmp_path / "ivf")
    versions = build_ivf_index(
        cand, table_dir, n_centroids=8, refine_iters=1,
        sim_round_dp=4, mean_round_dp=6,
    )
    assert versions == {"centroids": 1, "lists": 1}
    centroids, lists = read_ivf_index(spark, table_dir)
    assert centroids.count() == 8
    assert lists.count() == cand.count()  # every vector in exactly one list

    served = ivf_topk_batch_from(
        centroids, lists, queries, k=5, nprobe=3, round_dp=4,
    ).collect()
    # in-memory twin with the SAME deterministic build
    mem_centroids = kmeans_refine(
        cand,
        seed_centroids(cand, 8).select(
            "centroid_id",
            F.transform("centroid_vec", lambda x: x.cast("double")).alias(
                "centroid_vec"
            ),
        ),
        1,
        sim_round_dp=4,
        mean_round_dp=6,
    )
    mem = ivf_topk_batch_from(
        mem_centroids, ivf_lists(cand, mem_centroids, sim_round_dp=4),
        queries, k=5, nprobe=3, round_dp=4,
    ).collect()
    key = lambda r: (r.qid, r.rank)  # noqa: E731
    assert sorted(((r.qid, r.rank, r.vec_id) for r in served)) == sorted(
        (r.qid, r.rank, r.vec_id) for r in mem
    )
    assert {r.qid for r in served} == {r.vec_id for r in queries.select("qid").withColumnRenamed("qid", "vec_id").collect()}


def test_ivf_index_rebuild_versions_and_time_travel(spark, tmp_path):
    """Rebuilding publishes v2; v1 stays readable (snapshot-store time
    travel carries over to the index artifact)."""
    from sas_etl_spark.operators.ann import build_ivf_index
    from sas_etl_spark.sources.snapshots import read_snapshot

    emb = _emb(spark)
    cand = emb.filter(F.col("vec_id") >= 100)
    table_dir = str(tmp_path / "ivf")
    build_ivf_index(cand, table_dir, n_centroids=4, refine_iters=0)
    v2 = build_ivf_index(cand.limit(50), table_dir, n_centroids=4, refine_iters=0)
    assert v2 == {"centroids": 2, "lists": 2}
    assert read_snapshot(spark, f"{table_dir}/lists", version=1).count() == cand.count()
    assert read_snapshot(spark, f"{table_dir}/lists", version=2).count() == 50


def test_ivf_batch_refactor_matches_exact_when_probing_everything(spark):
    """ivf_topk_batch (now composed from ivf_lists +
    ivf_topk_batch_from) keeps its exactness-equivalence property:
    nprobe = n_centroids degrades to exact batched search."""
    from pyspark.sql import Window

    from sas_etl_spark.operators.ann import ivf_topk_batch
    from sas_etl_spark.operators.similarity import cosine

    emb = _emb(spark)
    cand = emb.filter(F.col("vec_id") >= 100)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    approx = ivf_topk_batch(
        cand, queries, k=5, n_centroids=8, nprobe=8, round_dp=4
    ).collect()
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    exact = (
        cand.crossJoin(F.broadcast(queries))
        .select(
            "qid", "vec_id",
            F.round(cosine("embedding", "qv"), 4).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .collect()
    )
    assert sorted((r.qid, r.rank, r.vec_id) for r in approx) == sorted(
        (r.qid, r.rank, r.vec_id) for r in exact
    )


def test_ivf_vectorized_matches_jvm_path(spark, tmp_path):
    """The numpy/Arrow serving fast path must return EXACTLY the JVM
    expression path's rows — same ids, same ranks, same rounded sims —
    so swapping scoring kernels can never change answers."""
    from sas_etl_spark.operators.ann import (
        build_ivf_index,
        ivf_topk_batch_from,
        ivf_topk_batch_vectorized,
        read_ivf_index,
    )

    emb = _emb(spark)
    cand = emb.filter(F.col("vec_id") >= 100)
    queries = emb.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    table_dir = str(tmp_path / "ivf")
    build_ivf_index(cand, table_dir, n_centroids=16, refine_iters=2)
    centroids, lists = read_ivf_index(spark, table_dir)
    kw = dict(k=10, nprobe=4, round_dp=4, probe_round_dp=4)
    jvm = ivf_topk_batch_from(
        centroids, lists, queries, norm_col="vec_norm", **kw
    ).collect()
    vec = ivf_topk_batch_vectorized(centroids, lists, queries, **kw).collect()
    key = lambda r: (r.qid, r.rank)  # noqa: E731
    assert sorted((r.qid, r.rank, r.vec_id, r.sim) for r in jvm) == sorted(
        (r.qid, r.rank, r.vec_id, r.sim) for r in vec
    )
    assert len(vec) == 30 * 10


def test_misra_gries_superset_guarantee_and_partition_invariance(spark):
    """MG candidates must contain every true heavy hitter under
    adversarial orderings and arbitrary partitionings, and the exact
    composite must equal the plain group-by answer."""
    from sas_etl_spark.operators.sketch import (
        heavy_hitters_exact,
        misra_gries_candidates,
    )

    # adversarial stream: heavy item interleaved with a long tail of
    # unique keys (the classic MG-killer ordering), multiple layouts
    rows = (
        [("hot",)] * 300
        + [(f"u{i}",) for i in range(2000)]
        + [("warm",)] * 150
    )
    m = 9
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "term string").repartition(parts)
        n = df.count()
        true_heavy = {
            r.term
            for r in df.groupBy("term").count()
            .filter(F.col("count") * (m + 1) > n).collect()
        }
        cands = {r.term for r in misra_gries_candidates(df, "term", m).collect()}
        assert true_heavy <= cands, (parts, true_heavy - cands)
        got = {
            (r.term, r.c) for r in heavy_hitters_exact(df, "term", m).collect()
        }
        want = {
            (r.term, r["count"])
            for r in df.groupBy("term").count()
            .filter(F.col("count") * (m + 1) > n).collect()
        }
        assert got == want
