"""Round-12 regression tests for the round-11 advisor items: index
metadata threading (custom id columns), size-gated index-maintenance
broadcasts, and the v2-streaming runtime fallback. Same bar as the
per-round semantics suites: synthetic fixtures containing the shape
the sf fixtures never produce."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ivf_index_meta_threads_custom_id_col(spark, tmp_path):
    """An index built with a NON-default id column must merge-on-read,
    upsert, and compact correctly with NO caller threading: the key
    column is persisted in _index_meta.json at build time and resolved
    by every reader (ADVICE r11 — read_ivf_index hardcoded 'vec_id')."""
    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.ann import (
        build_ivf_index,
        ivf_compact,
        ivf_upsert,
        read_ivf_index,
    )
    from sas_etl_spark.sources.snapshots import read_snapshot

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings").withColumnRenamed(
        "vec_id", "doc_key"
    )
    base = emb.filter(F.expr("doc_key >= 100 and doc_key % 10 != 3"))
    batch = emb.filter(F.expr("doc_key >= 100 and doc_key % 10 = 3"))
    d = str(tmp_path / "idx_custom")
    build_ivf_index(
        base, d, n_centroids=8, refine_iters=1, id_col="doc_key",
        sim_round_dp=4, mean_round_dp=6,
    )
    # no id_col passed anywhere below: resolved from the artifact
    ivf_upsert(spark, d, batch, sim_round_dp=4, mode="mor")
    _, lists = read_ivf_index(spark, d)
    assert "doc_key" in lists.columns
    want = base.count() + batch.count()
    assert lists.count() == want  # merged view, no dup keys
    # re-ingesting the same batch must REPLACE within the delta,
    # which requires the anti-join to key on doc_key, not vec_id
    ivf_upsert(spark, d, batch, sim_round_dp=4, mode="mor")
    assert read_snapshot(spark, f"{d}/lists_delta").count() == batch.count()
    assert read_ivf_index(spark, d)[1].count() == want
    ivf_compact(spark, d)
    assert read_snapshot(spark, f"{d}/lists").count() == want
    assert read_snapshot(spark, f"{d}/lists_delta").count() == 0


def _serve_sets(spark, table_dir, queries, nprobe, vectorized=False):
    from sas_etl_spark.operators.ann import (
        ivf_topk_batch_from,
        ivf_topk_batch_vectorized,
        read_ivf_index,
    )

    centroids, lists = read_ivf_index(spark, table_dir)
    if vectorized:
        out = ivf_topk_batch_vectorized(
            centroids, lists, queries, k=10, nprobe=nprobe,
            round_dp=4, probe_round_dp=4,
        ).toPandas()
    else:
        out = ivf_topk_batch_from(
            centroids, lists, queries, k=10, nprobe=nprobe,
            round_dp=4, probe_round_dp=4, norm_col="vec_norm",
        ).toPandas()
    return out.groupby("qid")["vec_id"].apply(set).to_dict()


def test_sq8_index_serves_within_recall_tolerance(spark, tmp_path):
    """VERDICT r11 item 2's attest bar: the int8-compressed index must
    serve within 0.05 recall of the UNCOMPRESSED exact serve (nprobe =
    all lists over the raw index), and its JVM + vectorized serving
    paths must return IDENTICAL rows over the compressed artifact."""
    import os

    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.ann import build_ivf_index

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 100)
    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    knobs = dict(
        n_centroids=16, refine_iters=2, sim_round_dp=4, mean_round_dp=6,
        train_ppm=250_000, train_seed=31,
    )
    raw_dir = str(tmp_path / "raw")
    build_ivf_index(corpus, raw_dir, **knobs)
    sq8_dir = str(tmp_path / "sq8")
    build_ivf_index(corpus, sq8_dir, quantize="int8", **knobs)

    exact = _serve_sets(spark, raw_dir, queries, nprobe=16)  # brute force
    raw4 = _serve_sets(spark, raw_dir, queries, nprobe=4)
    sq84 = _serve_sets(spark, sq8_dir, queries, nprobe=4)

    def recall(approx):
        return sum(
            len(approx[q] & exact[q]) / len(exact[q]) for q in exact
        ) / len(exact)

    r_raw, r_sq8 = recall(raw4), recall(sq84)
    assert r_raw >= 0.35, f"raw recall degenerate: {r_raw}"
    assert r_sq8 >= r_raw - 0.05, (r_sq8, r_raw)

    # JVM decode path == vectorized codes path over the SAME artifact
    jvm = _serve_sets(spark, sq8_dir, queries, nprobe=4)
    vec = _serve_sets(spark, sq8_dir, queries, nprobe=4, vectorized=True)
    assert jvm == vec

    # the compression is real: the sq8 lists snapshot is much smaller
    def snapshot_bytes(d):
        total = 0
        for root, _, files in os.walk(os.path.join(d, "lists")):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    raw_b, sq8_b = snapshot_bytes(raw_dir), snapshot_bytes(sq8_dir)
    assert sq8_b < raw_b * 0.5, (sq8_b, raw_b)


def test_sq8_upsert_into_compressed_index_keeps_layout(spark, tmp_path):
    """A batch upserted into an int8 index must quantize under the
    index's OWN metadata (no caller flag) and stay servable: merged
    lists carry codes for every row, and serving returns top-10 for
    every query."""
    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.ann import (
        build_ivf_index,
        ivf_upsert,
        read_ivf_index,
    )

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr("vec_id >= 100 and vec_id % 10 != 3"))
    batch = emb.filter(F.expr("vec_id >= 100 and vec_id % 10 = 3"))
    d = str(tmp_path / "sq8up")
    build_ivf_index(
        base, d, n_centroids=8, refine_iters=1, sim_round_dp=4,
        mean_round_dp=6, quantize="int8",
    )
    ivf_upsert(spark, d, batch, sim_round_dp=4, mode="mor")
    _, lists = read_ivf_index(spark, d)
    n_full = emb.filter(F.col("vec_id") >= 100).count()
    assert lists.count() == n_full
    assert lists.filter(F.col("vec_code").isNull()).count() == 0
    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    served = _serve_sets(spark, d, queries, nprobe=4, vectorized=True)
    assert len(served) == queries.count()
    assert all(len(v) == 10 for v in served.values())


def test_jpeg_fixture_roundtrip_is_bit_exact():
    """The attested contract: per-block-constant gray + unit quant
    tables round-trip the full encode/decode pipeline (huffman + DCT
    + YCbCr) BIT-exactly — this is what lets the SQL oracle regenerate
    expected pixels from the block spec."""
    import numpy as np

    from sas_etl_spark.operators.multimodal import (
        decode_jpeg,
        jpeg_encode,
        jpeg_fixture_array,
    )

    for i in (0, 3, 17, 42, 63):
        w, h = 8 * (1 + i % 4), 8 * (1 + i % 3)
        arr = jpeg_fixture_array(w, h, i)
        dec = decode_jpeg(jpeg_encode(arr))
        assert dec.shape == arr.shape
        assert np.array_equal(dec, arr), i


def test_jpeg_ac_path_roundtrips_within_tolerance():
    """The GENERAL decoder path (non-constant blocks: AC coefficients,
    zero runs, ZRL/EOB symbols, huffman over real magnitudes) must
    reconstruct within the classic +-few-counts DCT round-trip bound —
    the unit-test pin backing the oracle's DC-exact fixture."""
    import numpy as np

    from sas_etl_spark.operators.multimodal import decode_jpeg, jpeg_encode

    y, x = np.mgrid[0:24, 0:32]
    grad = np.stack(
        [(x * 3 + y * 2) % 256, (x + y * 5) % 256, (x * 2 + y) % 256],
        axis=2,
    ).astype(np.uint8)
    dec = decode_jpeg(jpeg_encode(grad))
    err = np.abs(dec.astype(int) - grad.astype(int)).max()
    assert err <= 8, err


def test_jpeg_idct_matches_textbook_reference():
    """The vectorized matrix IDCT must equal the O(n^4) textbook
    definition on random coefficient blocks (the decoder's only float
    kernel — everything else is integer/huffman plumbing)."""
    import numpy as np

    from sas_etl_spark.operators.multimodal import _dct_basis

    m = _dct_basis()
    rng = np.random.RandomState(11)
    coef = rng.randint(-200, 200, size=(8, 8)).astype(np.float64)
    fast = m.T @ coef @ m
    ref = np.zeros((8, 8))
    for xx in range(8):
        for yy in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += (
                        0.25 * cu * cv * coef[u, v]
                        * np.cos((2 * xx + 1) * u * np.pi / 16)
                        * np.cos((2 * yy + 1) * v * np.pi / 16)
                    )
            ref[xx, yy] = acc
    assert np.abs(fast - ref).max() < 1e-9


def test_decode_image_routes_jpeg():
    """decode_image routes by signature: JPEG decodes for real; since
    round 14 WebP routes to operators/webp (lossless natively, lossy
    via the system libwebp when present), and only a genuinely
    unrecognized signature raises."""
    import numpy as np
    import pytest

    from sas_etl_spark.operators.multimodal import (
        decode_image,
        jpeg_encode,
        jpeg_fixture_array,
    )
    from sas_etl_spark.operators.webp import webp_bytes

    arr = jpeg_fixture_array(16, 8, 5)
    assert np.array_equal(decode_image(jpeg_encode(arr)), arr)
    assert decode_image(webp_bytes(8, 6, 1)).shape == (6, 8, 3)
    with pytest.raises(NotImplementedError, match="unrecognized"):
        decode_image(b"BM00000000000000")  # BMP: genuinely unrouted


def test_vacuum_retains_pointer_and_numbering_never_reuses(spark, tmp_path):
    """vacuum_snapshots must (a) keep the newest keep_last versions and
    ALWAYS the pointer target, (b) make removed versions unreadable
    while retained pins still read, and (c) never let the next write
    reuse a vacuumed version number."""
    import pytest

    from sas_etl_spark.sources.snapshots import (
        current_version,
        read_snapshot,
        vacuum_snapshots,
        write_snapshot,
    )

    table = str(tmp_path / "t")
    for k in (1, 2, 3):
        write_snapshot(spark.range(k).toDF("v"), table)
    removed = vacuum_snapshots(table, keep_last=2)
    assert removed == [1]
    assert current_version(table) == 3
    assert read_snapshot(spark, table, version=2).count() == 2  # retained pin
    with pytest.raises(Exception):
        read_snapshot(spark, table, version=1).count()
    # next write continues from max, not from a reused slot
    v4 = write_snapshot(spark.range(4).toDF("v"), table)
    assert v4 == 4
    assert read_snapshot(spark, table).count() == 4
    # keep_last=1 still keeps the pointer target
    vacuum_snapshots(table, keep_last=1)
    assert read_snapshot(spark, table).count() == 4


def test_neardup_index_serve_equals_scan_side_and_appends(spark, tmp_path):
    """The persisted-index near-dup serve must return EXACTLY the
    scan-side relation (same candidates, same verified pairs), and
    append_neardup_index must fold a new batch in keep-newest so a
    later query sees it — the ingest-cadence maintenance contract."""
    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.minhash import (
        append_neardup_index,
        build_neardup_index,
        near_dup_pairs_between,
        neardup_query_index,
    )
    from sas_etl_spark.sources.snapshots import read_snapshot

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    planted = batch.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
    )
    master = docs.filter(F.col("doc_id") % 3 != 0)
    d = str(tmp_path / "nd_idx")
    build_ver = build_neardup_index(master, d)
    assert build_ver == 1

    def pairs(df):
        return {
            (r.batch_id, r.master_id, r.jaccard) for r in df.collect()
        }

    served = pairs(neardup_query_index(spark, d, batch, master, 0.8))
    scan = pairs(
        near_dup_pairs_between(batch, master, threshold=0.8).select(
            "batch_id", "master_id", "jaccard"
        )
    )
    assert served == scan
    # append the planted near-dups; a later batch query must now find
    # them from the UPDATED artifact
    n_master_rows = read_snapshot(spark, f"{d}/bands").count()
    assert append_neardup_index(planted, d) == 2
    grown = read_snapshot(spark, f"{d}/bands")
    assert grown.count() == n_master_rows + planted.count() * 32
    master2 = master.unionByName(planted)
    served2 = pairs(neardup_query_index(spark, d, batch, master2, 0.8))
    scan2 = pairs(
        near_dup_pairs_between(batch, master2, threshold=0.8).select(
            "batch_id", "master_id", "jaccard"
        )
    )
    assert served2 == scan2 and len(served2) > len(served)
    # re-appending the same docs must not grow the index (keep-newest)
    append_neardup_index(planted, d)
    assert read_snapshot(spark, f"{d}/bands").count() == grown.count()


def test_pre_metadata_index_defaults_to_vec_id(spark, tmp_path):
    """Indexes built before _index_meta.json existed (or whose meta
    file was lost) must keep working under the historical 'vec_id'
    default."""
    import os

    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.ann import build_ivf_index, read_ivf_index

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") >= 100)
    d = str(tmp_path / "idx_legacy")
    build_ivf_index(base, d, n_centroids=8, refine_iters=0, sim_round_dp=4)
    os.remove(os.path.join(d, "_index_meta.json"))  # simulate pre-meta
    _, lists = read_ivf_index(spark, d)
    assert lists.count() == base.count()
