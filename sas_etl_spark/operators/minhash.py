"""Near-duplicate detection: shingling + MinHash + LSH banding.

Driver-mandated LLM-pipeline operator (SURVEY.md §2.9 #52). Pipeline:

    tokens -> n-gram shingles -> 128-hash MinHash signature
           -> 32 bands x 4 rows -> band-hash bucket join (candidates)
           -> exact Jaccard verification on candidate pairs

All stages are Catalyst expressions (higher-order array functions +
xxhash64) — no Python UDF, whole-stage codegen end to end.

Scale design:
- The O(n²) all-pairs comparison never happens: candidates come from
  the band-hash equi-join, whose cost is bucket-size bounded.
- Shingle arrays are NOT carried through the band explode (32x row
  multiplication); candidates are id pairs, shingles re-joined after.
- Recall: P(candidate | jaccard j) = 1 - (1 - j^4)^32, i.e. >0.9998
  for j >= 0.7 and ~1 - 5e-8 for j >= 0.8; precision is exact because
  every candidate is verified with true Jaccard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_HASHES = 128
NUM_BANDS = 32  # rows per band r = 128/32 = 4


def shingle_array(text: Column, n: int = 3) -> Column:
    """Distinct n-gram (word) shingles; a doc shorter than n tokens
    contributes its whole token sequence as one shingle."""
    toks = F.split(text, " ")
    nsh = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), nsh),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def hashed_shingles(shingles: Column) -> Column:
    """Each shingle string hashed ONCE to a long. Stage this as a
    NAMED COLUMN before building signatures: interpreted HOFs get no
    common-subexpression elimination, so an inline string-hash array
    nested under the 128-function signature transform re-hashes every
    string 128 times (the round-9 profile: 155 s for 5000 sf0.1 docs,
    single-task; staged + long-mixed it is ~1 s).

    Collision note: distinct shingles that collide under the single
    64-bit xxhash64 pre-hash are collapsed BEFORE the signature min,
    adding a ~n²/2⁶⁵ per-doc term (n = shingles/doc; ~5e-13 at
    n = 10⁴) on top of the banding recall term documented in
    ``minhash_signature``. It affects candidate recall only — every
    candidate pair is exact-Jaccard verified downstream."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def minhash_signature(hashed: Column, num_hashes: int = NUM_HASHES) -> Column:
    """MinHash signature over PRE-HASHED shingles (``hashed_shingles``
    staged as its own column): element i = min over shingles of
    xxhash64(i, h). Seeding xxhash64 by i gives an independent hash of
    the 64-bit key per function — the same min-wise family argument as
    hashing the strings 128 times, at 8 bytes per element instead of
    string-length bytes. Signatures feed LSH candidate generation
    only; every candidate is exact-verified, so the hash-family change
    leaves results identical up to the (~1 - 5e-8 at j >= 0.8) recall
    term."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(hashed, lambda h: F.xxhash64(i, h))),
    )


def band_hashes(sig: Column, num_bands: int = NUM_BANDS, num_hashes: int = NUM_HASHES) -> Column:
    """LSH bands: hash each contiguous r-slice of the signature."""
    r = num_hashes // num_bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda j: F.xxhash64(j, F.slice(sig, j * r + 1, r)),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact set Jaccard of two (distinct-element) arrays."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Near-duplicate id pairs (a_id < b_id) with exact Jaccard >=
    threshold, found via MinHash-LSH candidates.

    The input is re-bucketed by id before the signature Project: the
    128-function signature is the compute-bound stage (interpreted
    HOF), so one shuffle of the raw text buys full-cluster parallelism
    for it — decisive when the source collapses to few scan partitions
    (the sf0.1 fixture is ONE 5 MiB file = one task; round-9 profile
    216 s -> ~3 s) and negligible next to the signature work when the
    scan is already wide. It also co-locates the shingle re-join for
    verification."""
    par = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("_id"), shingle_array(F.col(text_col), shingle_n).alias("_sh")
    )
    staged = sh.select("_id", hashed_shingles(F.col("_sh")).alias("_hs"))
    banded = staged.select(
        "_id",
        F.posexplode(band_hashes(minhash_signature(F.col("_hs"), num_hashes), num_bands, num_hashes)).alias(
            "_band", "_h"
        ),
    )
    left = banded.select(
        F.col("_id").alias("a_id"), F.col("_band").alias("_band"), F.col("_h").alias("_h")
    )
    right = banded.select(
        F.col("_id").alias("b_id"), F.col("_band").alias("_band2"), F.col("_h").alias("_h2")
    )
    candidates = (
        left.join(
            right,
            (left._band == right._band2)
            & (left._h == right._h2)
            & (left.a_id < right.b_id),
        )
        .select("a_id", "b_id")
        .distinct()
    )
    sh_a = sh.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_sh_a"))
    sh_b = sh.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_sh_b"))
    return (
        candidates.join(sh_a, "a_id")
        .join(sh_b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("_sh_a"), F.col("_sh_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def prefix_filtered_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT set-similarity join via prefix filtering (the AllPairs
    family, Bayardo et al., "Scaling Up All Pairs Similarity Search",
    WWW'07) — the lossless counterpart to the probabilistic MinHash
    path: recall is exactly 1 at any threshold, no banding math.

    Principle: order every shingle set canonically (here by xxhash64 —
    any global total order is sound) and keep each set's PREFIX of
    length |A| - ceil(t*|A|) + 1. If J(A,B) >= t then
    |A n B| >= t*max(|A|,|B|), so the intersection cannot hide
    entirely in either suffix — the two prefixes must share an
    element. Candidates are therefore an equi-join on exploded prefix
    tokens (never all-pairs), and the exact Jaccard verify on
    candidates removes false positives, so the result equals the
    brute-force join. Cost scales with prefix-token collision counts:
    strong pruning at high thresholds (prefix ~ (1-t)|A|), degrading
    toward all-pairs as t -> 0 — use MinHash-LSH below ~0.5 and this
    form above it when recall must be provably 1.

    The verify stage recomputes Jaccard on the STRING shingle arrays
    (identical expression to q_jaccard_pairs' oracle), so rounding and
    value semantics match DuckDB exactly.
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        shingle_array(F.col(text_col), shingle_n).alias("_sh"),
    )
    ordered = sh.select(
        "_id",
        "_sh",
        F.transform(
            F.array_sort(
                F.transform(
                    F.col("_sh"), lambda s: F.struct(F.xxhash64(s).alias("h"), s.alias("s"))
                )
            ),
            lambda st: st["h"],
        ).alias("_hs"),
    )
    # ceil over EXACT arithmetic: thresholds not representable in
    # binary (0.7, 0.29, ...) can make size*t land a hair ABOVE the
    # true rational product, over-ceiling and shortening the prefix by
    # one — silently breaking the recall-exactly-1 guarantee. The
    # 1e-9 nudge (far below 1/|set| for any realistic shingle count)
    # floors that representation error away; it can only LENGTHEN the
    # prefix by one in exact-integer cases, which costs a few extra
    # candidates, never recall.
    prefix_len = (
        F.size(F.col("_hs"))
        - F.ceil(F.size(F.col("_hs")) * F.lit(threshold) - F.lit(1e-9))
        + 1
    ).cast("int")
    prefixes = ordered.select(
        "_id",
        F.size(F.col("_hs")).alias("_n"),
        F.explode(F.slice(F.col("_hs"), 1, prefix_len)).alias("_tok"),
    )
    # AllPairs size filter: J(A,B) >= t forces t*|B| <= |A| <= |B|/t
    # (|AnB| <= min sizes, |AuB| >= max sizes), so prefix-token
    # collisions between wildly different-sized sets are pruned BEFORE
    # the exact verify — free with the sizes carried through the
    # explode. The 1e-6 slack keeps the filter lossless under the
    # verify stage's 6dp ROUNDED threshold test (a pair whose true
    # Jaccard is within 5e-7 below t rounds up to t and must survive
    # to the verify, not be size-pruned).
    cands = (
        prefixes.alias("a")
        .join(
            prefixes.alias("b"),
            (F.col("a._tok") == F.col("b._tok"))
            & (F.col("a._id") < F.col("b._id"))
            & (F.col("a._n") >= F.col("b._n") * F.lit(threshold - 1e-6))
            & (F.col("b._n") >= F.col("a._n") * F.lit(threshold - 1e-6)),
        )
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
        .distinct()
    )
    va = ordered.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_sa"))
    vb = ordered.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_sb"))
    return (
        cands.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("_sa"), F.col("_sb")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_filtered_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT set-CONTAINMENT join: ordered pairs (a_id, b_id) with
    C(A->B) = |sh(A) n sh(B)| / |sh(A)| >= threshold, a != b — the
    asymmetric dedup relation Jaccard misses entirely: a short doc
    pasted inside a much longer one has tiny Jaccard (union is
    B-sized) but containment ~1. This is the quote/boilerplate/
    subset-duplication detector of a curation pipeline.

    Prefix filtering adapts to the asymmetry (PRETTI/PIEJoin family):
    order A's shingles by a global total order (xxhash64) and keep
    the prefix of length |A| - ceil(t*|A|) + 1 — if C >= t the
    required ceil(t*|A|) overlapping elements cannot all hide in A's
    suffix, so some prefix element of A appears SOMEWHERE in B.
    Unlike the Jaccard case, B contributes ALL its shingles to the
    candidate equi-join (the overlap may sit anywhere in B), and the
    only size constraint is |B| >= t*|A| (B needs room for the
    required overlap; no upper bound — that is the asymmetry).
    Exact verify on candidates => recall is exactly 1, same
    argument as prefix_filtered_pairs. Cost: candidates ~
    (1-t)*|A|-prefix tokens x their global postings — strong pruning
    at high thresholds; below ~0.5 prefer banding A's prefix through
    MinHash.

    The 1e-9 ceil nudge and 1e-6 size-filter slack carry over from
    prefix_filtered_pairs (same representation-error reasoning).
    """
    sh = df.select(
        F.col(id_col).alias("_id"),
        shingle_array(F.col(text_col), shingle_n).alias("_sh"),
    )
    # Global order = ASCENDING document frequency (xxhash64 tiebreak),
    # the canonical AllPairs ordering: each doc's prefix then holds
    # its RAREST shingles, whose postings lists are short, so the
    # prefix-vs-all-of-B equi-join collides on rare tokens instead of
    # corpus-hot ones. Any global total order keeps recall exactly 1
    # (the ceil(t|A|) pigeonhole never references the order choice);
    # frequency order only changes WHICH prefix tokens generate
    # candidates. On a closed-vocabulary corpus (worst case: every
    # trigram is hot) this is the difference between near-all-pairs
    # and postings-bounded candidates — measured 3.8 s -> well under
    # the oracle class at sf0.1 (SCALE.md round-8). Costs one linear
    # df aggregation + a doc-keyed regroup, both combiner-friendly.
    tok = sh.select("_id", F.explode("_sh").alias("_s"))
    dft = tok.groupBy("_s").agg(F.count(F.lit(1)).alias("_df"))
    ordered_hs = (
        tok.join(dft, "_s")
        .select(
            "_id",
            F.struct(
                F.col("_df"), F.xxhash64("_s").alias("h")
            ).alias("_key"),
        )
        .groupBy("_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list("_key")), lambda st: st["h"]
            ).alias("_hs")
        )
    )
    ordered = sh.join(ordered_hs, "_id")
    prefix_len = (
        F.size(F.col("_hs"))
        - F.ceil(F.size(F.col("_hs")) * F.lit(threshold) - F.lit(1e-9))
        + 1
    ).cast("int")
    a_prefix = ordered.select(
        F.col("_id").alias("a_id"),
        F.size(F.col("_hs")).alias("_na"),
        F.explode(F.slice(F.col("_hs"), 1, prefix_len)).alias("_tok"),
    )
    b_all = ordered.select(
        F.col("_id").alias("b_id"),
        F.size(F.col("_hs")).alias("_nb"),
        F.explode(F.col("_hs")).alias("_tok"),
    )
    cands = (
        a_prefix.join(
            b_all,
            (a_prefix["_tok"] == b_all["_tok"])
            & (a_prefix["a_id"] != b_all["b_id"])
            & (b_all["_nb"] >= a_prefix["_na"] * F.lit(threshold - 1e-6)),
        )
        .select("a_id", "b_id")
        .distinct()
    )
    va = ordered.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_sa"))
    vb = ordered.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_sb"))
    return (
        cands.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
                / F.size(F.col("_sa")),
                6,
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def band_signature_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    out_id: str = "_id",
    repartition: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(shingles, band rows) for a corpus: ``shingles`` = (out_id,
    _sh) for the exact-verify stage, ``bands`` = (out_id, _band, _h)
    — the STORABLE LSH index rows (num_bands rows per doc, 24 bytes
    each). One scan-side Project feeds both; ``repartition`` buys
    cluster-wide parallelism for the 128-function signature fold when
    the source collapses to few scan partitions (the near_dup_pairs
    rationale)."""
    if repartition:
        par = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(par, F.col(id_col))
    sh = df.select(
        F.col(id_col).alias(out_id),
        shingle_array(F.col(text_col), shingle_n).alias("_sh"),
    )
    staged = sh.select(out_id, hashed_shingles(F.col("_sh")).alias("_hs"))
    bands = staged.select(
        out_id,
        F.posexplode(
            band_hashes(
                minhash_signature(F.col("_hs"), num_hashes),
                num_bands,
                num_hashes,
            )
        ).alias("_band", "_h"),
    )
    return sh, bands


def build_neardup_index(
    master: DataFrame,
    table_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> int:
    """Persist the master corpus's MinHash-LSH band rows as a
    versioned snapshot table (``{table_dir}/bands``) — the build-once
    half of the near-dup SERVING regime (the same regime split
    build_ivf_index made for ANN): signatures are the compute-bound
    stage (128 interpreted hash folds per doc), and a production
    master is re-queried every ingest, so computing them per query —
    what near_dup_pairs_between does scan-side — pays the corpus-wide
    signature cost on every batch. The persisted table is (id, band,
    h): num_bands rows x 24 bytes per doc, independent of document
    length, hash-partitionable by (band, h) for the candidate join.
    Maintenance is append-only (a new batch's band rows union in —
    signatures never change for immutable docs) with the same
    snapshot versioning/time-travel as every other artifact."""
    from sas_etl_spark.sources.snapshots import write_snapshot

    _, bands = band_signature_rows(
        master, id_col, text_col, shingle_n, num_hashes, num_bands,
        out_id=id_col,
    )
    return write_snapshot(bands, f"{table_dir}/bands")


def append_neardup_index(
    new_docs: DataFrame,
    table_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> int:
    """Fold a new (already-accepted) batch into the persisted band
    index: compute ONLY the batch's band rows and publish base ∪ batch
    as the next immutable snapshot version — the ingest-cadence
    maintenance the build docstring promises. Signatures of immutable
    docs never change, so this is pure append (keep-newest on id for
    re-ingested docs, mirroring ivf_upsert's upsert rule); cost is
    O(|batch| x num_bands) compute + one table rewrite (the COW
    publish — at 100 TB, partition the bands table by band and
    rewrite only touched partitions, or adopt the lists_delta
    merge-on-read pattern from operators/ann.py unchanged)."""
    from sas_etl_spark.operators.broadcast import broadcast_if_small
    from sas_etl_spark.sources.snapshots import read_snapshot, write_snapshot

    spark = new_docs.sparkSession
    base = read_snapshot(spark, f"{table_dir}/bands")
    _, bands = band_signature_rows(
        new_docs, id_col, text_col, shingle_n, num_hashes, num_bands,
        out_id=id_col,
    )
    survivors = base.join(
        broadcast_if_small(bands.select(id_col).distinct()), id_col, "left_anti"
    )
    return write_snapshot(survivors.unionByName(bands), f"{table_dir}/bands")


def neardup_query_index(
    spark,
    table_dir: str,
    batch: DataFrame,
    master: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Query a new batch against the PERSISTED band index: batch band
    rows compute scan-side (bounded — one ingest snapshot) and
    broadcast through the size gate against the index relation; the
    master corpus is touched ONLY to re-join shingles for candidate
    ids (a semi-joined point read), never to recompute signatures —
    the serve-many half of build_neardup_index's regime. Returns
    (batch_id, master_id, jaccard >= threshold) with exact-Jaccard
    verification, identical semantics to near_dup_pairs_between
    (recall ~1 - 5e-8 at j >= 0.8 under 32x4 banding)."""
    from sas_etl_spark.operators.broadcast import broadcast_if_small
    from sas_etl_spark.sources.snapshots import read_snapshot

    bands_m = read_snapshot(spark, f"{table_dir}/bands").select(
        F.col(id_col).alias("master_id"), "_band", "_h"
    )
    sh_b, bands_b = band_signature_rows(
        batch, id_col, text_col, shingle_n, num_hashes, num_bands,
        out_id="batch_id",
    )
    candidates = (
        bands_m.join(broadcast_if_small(bands_b), ["_band", "_h"])
        .select("batch_id", "master_id")
        .distinct()
    )
    sh_m = master.join(
        candidates.select(F.col("master_id").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    ).select(
        F.col(id_col).alias("master_id"),
        shingle_array(F.col(text_col), shingle_n).alias("_sh_m"),
    )
    return (
        candidates.join(
            sh_b.select(F.col("batch_id"), F.col("_sh").alias("_sh_b")),
            "batch_id",
        )
        .join(sh_m, "master_id")
        .select(
            "batch_id",
            "master_id",
            F.round(jaccard(F.col("_sh_b"), F.col("_sh_m")), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def near_dup_pairs_between(
    batch: DataFrame,
    master: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """Cross-set near-duplicate pairs (batch_id, master_id, jaccard >=
    threshold) — the INCREMENTAL dedup shape: a new ingest batch
    checked against the historical master without ever comparing
    master docs to each other. The asymmetric twin of near_dup_pairs,
    exactly as srp_bucket_candidates_between is to
    srp_bucket_candidates.

    Scale posture: the master side is the 100 TB one — its band rows
    are computed scan-side (in production they would be PRECOMPUTED
    once and stored with the corpus; the expression is identical) and
    are never shuffled: the batch side is bounded (one ingest
    snapshot), so its band rows broadcast via the size gate and the
    candidate step is a map-side lookup over the master. Exact
    Jaccard verification re-joins shingles for candidate ids only.
    Recall follows the banded OR-of-ANDs math of near_dup_pairs
    (~1 - 5e-8 at j >= 0.8 with 32x4)."""
    from sas_etl_spark.operators.broadcast import broadcast_if_small

    def banded(df: DataFrame, out_id: str) -> tuple[DataFrame, DataFrame]:
        par = df.sparkSession.sparkContext.defaultParallelism
        sh = df.repartition(par, F.col(id_col)).select(
            F.col(id_col).alias(out_id),
            shingle_array(F.col(text_col), shingle_n).alias("_sh"),
        )
        staged = sh.select(out_id, hashed_shingles(F.col("_sh")).alias("_hs"))
        return sh, staged.select(
            out_id,
            F.posexplode(
                band_hashes(
                    minhash_signature(F.col("_hs"), num_hashes),
                    num_bands,
                    num_hashes,
                )
            ).alias("_band", "_h"),
        )

    sh_b, banded_b = banded(batch, "batch_id")
    sh_m, banded_m = banded(master, "master_id")
    candidates = (
        banded_m.join(broadcast_if_small(banded_b), ["_band", "_h"])
        .select("batch_id", "master_id")
        .distinct()
    )
    return (
        candidates.join(
            sh_b.select("batch_id", F.col("_sh").alias("_sh_b")), "batch_id"
        )
        .join(
            sh_m.select("master_id", F.col("_sh").alias("_sh_m")), "master_id"
        )
        .select(
            "batch_id",
            "master_id",
            F.round(jaccard(F.col("_sh_b"), F.col("_sh_m")), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
