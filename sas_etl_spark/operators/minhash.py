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


def _write_neardup_meta(table_dir: str, meta: dict) -> None:
    """Atomically publish the index's signature parameters (the same
    ``_index_meta.json`` idiom as build_ivf_index): an index queried
    or appended with DIFFERENT shingle_n/num_hashes/num_bands than it
    was built with computes incomparable band hashes and silently
    drops candidate pairs — the exact failure class the IVF metadata
    fixed for id/layout columns (ADVICE r12)."""
    from sas_etl_spark.operators.ann import _write_index_meta

    _write_index_meta(table_dir, meta)


def _read_neardup_meta(table_dir: str) -> dict:
    """The persisted ``_index_meta.json``, or the historical defaults
    for pre-metadata indexes (all built with doc_id / 3-gram shingles
    / 128 hashes / 32 bands). Missing file -> defaults; a
    present-but-unparseable file raises (same contract as the IVF
    reader — a corrupt artifact must fail at the root cause)."""
    import json
    import os

    meta_path = os.path.join(table_dir, "_index_meta.json")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except FileNotFoundError:
        meta = {}
    except ValueError as e:
        raise ValueError(f"corrupt index metadata {meta_path}: {e}") from e
    return {
        "id_col": str(meta.get("id_col", "doc_id")),
        "shingle_n": int(meta.get("shingle_n", 3)),
        "num_hashes": int(meta.get("num_hashes", NUM_HASHES)),
        "num_bands": int(meta.get("num_bands", NUM_BANDS)),
    }


def _resolve_neardup_params(
    table_dir: str,
    shingle_n: int | None,
    num_hashes: int | None,
    num_bands: int | None,
) -> tuple[int, int, int]:
    """Resolve signature parameters against the persisted metadata:
    ``None`` (the default) takes the index's own value; an explicit
    value must MATCH it — a mismatch raises instead of silently
    computing band hashes the index can never join against."""
    meta = _read_neardup_meta(table_dir)
    resolved = []
    for name, given in (
        ("shingle_n", shingle_n),
        ("num_hashes", num_hashes),
        ("num_bands", num_bands),
    ):
        stored = meta[name]
        if given is not None and int(given) != stored:
            raise ValueError(
                f"near-dup index at {table_dir} was built with "
                f"{name}={stored}, got {name}={given}: mismatched "
                "signature parameters produce disjoint band hashes "
                "and silently drop every candidate pair"
            )
        resolved.append(stored)
    return resolved[0], resolved[1], resolved[2]


def _read_neardup_bands(spark, table_dir: str, id_col: str) -> DataFrame:
    """The index's MERGED band relation: the current base snapshot
    with re-ingested ids dropped (anti-join against the delta id set,
    size-gated broadcast) and the merge-on-read delta unioned in —
    the read half of append_neardup_index(mode="mor"), byte-for-byte
    the read_ivf_index delta-merge shape. Serving plans see one bands
    relation whether or not a compaction has run."""
    from sas_etl_spark.operators.broadcast import broadcast_if_small
    from sas_etl_spark.sources.snapshots import read_snapshot

    bands = read_snapshot(spark, f"{table_dir}/bands")
    delta = _read_bands_delta_if_any(spark, table_dir)
    if delta is not None:
        bands = bands.join(
            broadcast_if_small(delta.select(id_col).distinct()),
            id_col,
            "left_anti",
        ).unionByName(delta)
    return bands


def _read_bands_delta_if_any(spark, table_dir: str):
    """The current bands_delta snapshot, or None when never published."""
    import os

    from sas_etl_spark.sources.snapshots import read_snapshot

    delta_dir = f"{table_dir}/bands_delta"
    if not os.path.isdir(delta_dir):
        return None
    try:
        return read_snapshot(spark, delta_dir)
    except (FileNotFoundError, OSError):
        return None


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
    length, laid out Hive-partitioned BY BAND (num_bands directories):
    any band-selective read prunes (num_bands-1)/num_bands of the
    artifact at plan time, and a compaction can rewrite
    per-partition. Maintenance is append-only (a new batch's band
    rows union in — signatures never change for immutable docs) with
    the same snapshot versioning/time-travel as every other artifact;
    the signature parameters persist in ``_index_meta.json`` so
    queries and appends resolve them from the artifact instead of
    trusting callers to repeat them (a mismatch computes incomparable
    band hashes and silently drops every candidate pair)."""
    from sas_etl_spark.sources.snapshots import write_snapshot

    _, bands = band_signature_rows(
        master, id_col, text_col, shingle_n, num_hashes, num_bands,
        out_id=id_col,
    )
    v = write_snapshot(bands, f"{table_dir}/bands", partition_by=("_band",))
    _write_neardup_meta(
        table_dir,
        {
            "id_col": id_col,
            "shingle_n": shingle_n,
            "num_hashes": num_hashes,
            "num_bands": num_bands,
        },
    )
    return v


def append_neardup_index(
    new_docs: DataFrame,
    table_dir: str,
    id_col: str | None = None,
    text_col: str = "text",
    shingle_n: int | None = None,
    num_hashes: int | None = None,
    num_bands: int | None = None,
    mode: str = "cow",
) -> int:
    """Fold a new (already-accepted) batch into the persisted band
    index: compute ONLY the batch's band rows — the ingest-cadence
    maintenance the build docstring promises. Signatures of immutable
    docs never change, so this is pure append with keep-newest on id
    for re-ingested docs (ivf_upsert's upsert rule). Signature
    parameters resolve from the index's own ``_index_meta.json``
    (explicit mismatches raise — see _resolve_neardup_params).

    ``mode`` picks the publish strategy — VALUE-identical at read
    time, different write cost (pinned equal by
    tests/test_round13_semantics.py), the same two modes as
    ivf_upsert:

    - ``"mor"`` (merge-on-read — the 100 TB ingest shape):
      publish the batch's band rows into a SIDE DELTA table
      (bands_delta) and leave the base untouched — write cost
      O(accumulated deltas), i.e. O(batch) until compaction, the LSM
      L0 pattern. _read_neardup_bands merges on read (base anti-join
      delta ids, union delta; size-gated broadcast). Call
      neardup_compact when the delta grows past read-amplification
      comfort. At a 1000:1 master/batch ratio this removes the
      O(index) rewrite that made COW the per-ingest bill.
    - ``"cow"`` (copy-on-write, default): rewrite base ∪ batch as the
      next immutable version (band-partitioned). Right while the
      index is small or refreshes are rare; the only mode whose
      artifact is a single self-contained table version."""
    from sas_etl_spark.operators.broadcast import broadcast_if_small
    from sas_etl_spark.sources.snapshots import read_snapshot, write_snapshot

    spark = new_docs.sparkSession
    meta = _read_neardup_meta(table_dir)
    id_col = id_col if id_col is not None else meta["id_col"]
    shingle_n, num_hashes, num_bands = _resolve_neardup_params(
        table_dir, shingle_n, num_hashes, num_bands
    )
    _, bands = band_signature_rows(
        new_docs, id_col, text_col, shingle_n, num_hashes, num_bands,
        out_id=id_col,
    )
    if mode == "mor":
        prior = _read_bands_delta_if_any(spark, table_dir)
        if prior is not None:
            # keep-newest within the delta itself: this batch replaces
            # any delta rows it re-ingests
            prior = prior.join(
                broadcast_if_small(bands.select(id_col).distinct()),
                id_col,
                "left_anti",
            )
            bands = prior.unionByName(bands)
        return write_snapshot(bands, f"{table_dir}/bands_delta")
    if mode != "cow":
        raise ValueError(f"unknown append_neardup_index mode: {mode!r}")
    base = read_snapshot(spark, f"{table_dir}/bands")
    survivors = base.join(
        broadcast_if_small(bands.select(id_col).distinct()), id_col, "left_anti"
    )
    return write_snapshot(
        survivors.unionByName(bands),
        f"{table_dir}/bands",
        partition_by=("_band",),
    )


def neardup_compact(spark, table_dir: str) -> int:
    """Fold the accumulated merge-on-read bands delta into the base:
    publish base-anti-join-delta ∪ delta as the bands table's next
    band-partitioned version, then publish an EMPTY delta (same
    schema) so readers atomically switch to the compacted base — the
    one O(index) write the MOR mode defers, byte-for-byte ivf_compact
    over the bands schema. Delta-id broadcast size-gated: by
    compaction time the delta is at its LARGEST, exactly when an
    unconditional broadcast is most dangerous."""
    from sas_etl_spark.operators.broadcast import broadcast_if_small
    from sas_etl_spark.sources.snapshots import read_snapshot, write_snapshot

    id_col = _read_neardup_meta(table_dir)["id_col"]
    delta = _read_bands_delta_if_any(spark, table_dir)
    if delta is None:
        raise ValueError(f"no bands_delta published under {table_dir}")
    base = read_snapshot(spark, f"{table_dir}/bands")
    merged = base.join(
        broadcast_if_small(delta.select(id_col).distinct()),
        id_col,
        "left_anti",
    ).unionByName(delta)
    v = write_snapshot(merged, f"{table_dir}/bands", partition_by=("_band",))
    write_snapshot(delta.limit(0), f"{table_dir}/bands_delta")
    return v


def neardup_query_index(
    spark,
    table_dir: str,
    batch: DataFrame,
    master: DataFrame,
    threshold: float = 0.8,
    id_col: str | None = None,
    text_col: str = "text",
    shingle_n: int | None = None,
    num_hashes: int | None = None,
    num_bands: int | None = None,
) -> DataFrame:
    """Query a new batch against the PERSISTED band index: batch band
    rows compute scan-side (bounded — one ingest snapshot) and
    broadcast through the size gate against the index relation; the
    master corpus is touched ONLY to re-join shingles for candidate
    ids (a semi-joined point read), never to recompute signatures —
    the serve-many half of build_neardup_index's regime. Returns
    (batch_id, master_id, jaccard >= threshold) with exact-Jaccard
    verification, identical semantics to near_dup_pairs_between
    (recall ~1 - 5e-8 at j >= 0.8 under 32x4 banding).

    Signature parameters resolve from the index's persisted
    ``_index_meta.json`` (explicit mismatches raise), and the bands
    relation is the MERGED view — base plus any uncompacted
    merge-on-read delta (_read_neardup_bands) — so serving is correct
    mid-ingest, before a neardup_compact has folded the delta in."""
    from sas_etl_spark.operators.broadcast import broadcast_if_small

    meta = _read_neardup_meta(table_dir)
    id_col = id_col if id_col is not None else meta["id_col"]
    shingle_n, num_hashes, num_bands = _resolve_neardup_params(
        table_dir, shingle_n, num_hashes, num_bands
    )
    bands_m = _read_neardup_bands(spark, table_dir, meta["id_col"]).select(
        F.col(meta["id_col"]).alias("master_id"), "_band", "_h"
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
