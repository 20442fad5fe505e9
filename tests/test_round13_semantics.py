"""Round-13 regression tests for the round-12 verdict/advice items:
merge-on-read maintenance for the persisted near-dup band index
(O(batch) delta + read-side merge + compaction, value-identical to
copy-on-write), the band-partitioned artifact layout (pruned scans),
persisted signature parameters (mismatches raise instead of silently
dropping candidates), and loud failure on corrupt index metadata.
Same bar as the per-round semantics suites: synthetic fixtures
containing the shape the sf fixtures never produce."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def _docs(spark):
    from sas_etl_spark.catalog import load_table

    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def _bands_rows(spark, table_dir):
    """The merged bands view as a comparable set of tuples."""
    from sas_etl_spark.operators.minhash import _read_neardup_bands

    return {
        (r.doc_id, r._band, r._h)
        for r in _read_neardup_bands(spark, table_dir, "doc_id").collect()
    }


def test_neardup_mor_equals_cow_and_compact(spark, tmp_path):
    """append(mode='mor') must publish an O(batch) bands_delta and
    leave the base untouched; the READ-side merged view must be
    value-identical to the copy-on-write publish; and neardup_compact
    must fold the delta into a new base version (emptying the delta)
    without changing the served relation."""
    from sas_etl_spark.operators.minhash import (
        _read_bands_delta_if_any,
        append_neardup_index,
        build_neardup_index,
        neardup_compact,
    )
    from sas_etl_spark.sources.snapshots import current_version, read_snapshot

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter((F.col("doc_id") % 2 != 0) & (F.col("doc_id") % 3 == 0))
    n_batch = batch.count()

    d_mor = str(tmp_path / "nd_mor")
    d_cow = str(tmp_path / "nd_cow")
    build_neardup_index(base, d_mor)
    build_neardup_index(base, d_cow)
    base_rows = read_snapshot(spark, f"{d_mor}/bands").count()

    append_neardup_index(batch, d_mor, mode="mor")
    append_neardup_index(batch, d_cow, mode="cow")

    # O(batch) delta: exactly num_bands rows per batch doc, base
    # version untouched (still v1, same row count)
    delta = _read_bands_delta_if_any(spark, d_mor)
    assert delta is not None and delta.count() == n_batch * 32
    assert current_version(f"{d_mor}/bands") == 1
    assert read_snapshot(spark, f"{d_mor}/bands").count() == base_rows
    # while the COW twin rewrote the whole table as v2
    assert current_version(f"{d_cow}/bands") == 2

    # merged MOR view == COW table, row for row
    mor_view = _bands_rows(spark, d_mor)
    cow_view = _bands_rows(spark, d_cow)
    assert mor_view == cow_view and len(mor_view) == base_rows + n_batch * 32

    # compaction folds the delta into a new base version, empties the
    # delta, and preserves the relation exactly
    v = neardup_compact(spark, d_mor)
    assert v == 2
    assert _read_bands_delta_if_any(spark, d_mor).count() == 0
    assert _bands_rows(spark, d_mor) == cow_view


def test_neardup_mor_keep_newest_within_delta(spark, tmp_path):
    """Re-appending docs already in the delta must replace their delta
    rows (keep-newest), and re-appending docs in the BASE must shadow
    the base rows at read time (anti-join) — upsert semantics, no
    duplicate band rows in the merged view."""
    from sas_etl_spark.operators.minhash import (
        _read_bands_delta_if_any,
        append_neardup_index,
        build_neardup_index,
    )

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") < 40)
    d = str(tmp_path / "nd_keep")
    build_neardup_index(base, d)

    batch1 = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 50))
    append_neardup_index(batch1, d, mode="mor")
    # batch2 re-ingests half of batch1 AND half of the base
    batch2 = docs.filter(
        ((F.col("doc_id") >= 45) & (F.col("doc_id") < 55))
        | (F.col("doc_id") < 10)
    )
    append_neardup_index(batch2, d, mode="mor")

    delta = _read_bands_delta_if_any(spark, d)
    n_delta_docs = delta.select("doc_id").distinct().count()
    assert n_delta_docs == batch1.unionByName(batch2).select(
        "doc_id"
    ).distinct().count()
    assert delta.count() == n_delta_docs * 32
    merged = _bands_rows(spark, d)
    all_docs = base.unionByName(batch1).unionByName(batch2)
    assert len(merged) == all_docs.select("doc_id").distinct().count() * 32


def test_neardup_meta_param_mismatch_raises(spark, tmp_path):
    """Querying or appending with signature parameters that differ
    from the build's must raise — a silent mismatch computes disjoint
    band hashes and drops every candidate pair (ADVICE r12)."""
    from sas_etl_spark.operators.minhash import (
        append_neardup_index,
        build_neardup_index,
        neardup_query_index,
    )

    docs = _docs(spark)
    d = str(tmp_path / "nd_meta")
    build_neardup_index(docs.filter(F.col("doc_id") < 30), d, shingle_n=3)
    batch = docs.filter(F.col("doc_id") >= 30).limit(5)
    with pytest.raises(ValueError, match="shingle_n=3"):
        neardup_query_index(spark, d, batch, docs, shingle_n=4)
    with pytest.raises(ValueError, match="num_bands"):
        append_neardup_index(batch, d, num_bands=16)
    # matching explicit values are fine
    assert append_neardup_index(batch, d, shingle_n=3, mode="mor") >= 1


def test_neardup_meta_missing_defaults_corrupt_raises(spark, tmp_path):
    """A MISSING _index_meta.json (pre-metadata index) falls back to
    the historical defaults; a CORRUPT one raises at the root cause
    instead of silently defaulting (ADVICE r12 — both the near-dup
    and the IVF reader)."""
    import os

    from sas_etl_spark.operators.ann import _read_index_meta
    from sas_etl_spark.operators.minhash import (
        _read_neardup_meta,
        build_neardup_index,
        neardup_query_index,
    )

    docs = _docs(spark)
    d = str(tmp_path / "nd_oldidx")
    build_neardup_index(docs.filter(F.col("doc_id") < 30), d)
    meta_path = os.path.join(d, "_index_meta.json")
    os.remove(meta_path)
    meta = _read_neardup_meta(d)
    assert meta == {
        "id_col": "doc_id",
        "shingle_n": 3,
        "num_hashes": 128,
        "num_bands": 32,
    }
    # pre-metadata index still serves under the defaults
    batch = docs.filter(F.col("doc_id") < 30).limit(3)
    served = neardup_query_index(spark, d, batch, docs, threshold=0.99)
    assert served.count() >= 3  # every doc matches itself
    # corrupt metadata fails loudly, in both index families
    with open(meta_path, "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="corrupt index metadata"):
        _read_neardup_meta(d)
    with pytest.raises(ValueError, match="corrupt index metadata"):
        _read_index_meta(d)


def test_neardup_bands_partitioned_and_pruned(spark, tmp_path):
    """The persisted bands table must be Hive-partitioned by _band
    (VERDICT r12 item 4): a band-selective read prunes 31/32 of the
    artifact at plan time (PartitionFilters on the scan), and the
    compacted table preserves the layout."""
    import os

    from sas_etl_spark.operators.minhash import (
        append_neardup_index,
        build_neardup_index,
        neardup_compact,
    )
    from sas_etl_spark.plans import formatted_plan
    from sas_etl_spark.sources.snapshots import read_snapshot

    docs = _docs(spark)
    d = str(tmp_path / "nd_part")
    build_neardup_index(docs.filter(F.col("doc_id") < 60), d)
    v1_dir = os.path.join(d, "bands", "v=1")
    band_dirs = [p for p in os.listdir(v1_dir) if p.startswith("_band=")]
    assert len(band_dirs) == 32
    back = read_snapshot(spark, f"{d}/bands").filter(F.col("_band") == 7)
    plan = formatted_plan(back)
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "_band" in m.group(1), plan
    assert back.select("_band").distinct().count() == 1
    # compaction writes the same partitioned layout
    append_neardup_index(
        docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 70)),
        d,
        mode="mor",
    )
    v = neardup_compact(spark, d)
    v_dir = os.path.join(d, "bands", f"v={v}")
    assert sum(p.startswith("_band=") for p in os.listdir(v_dir)) == 32


def _serve_pq_sets(spark, table_dir, queries, nprobe, vectorized=False):
    """Per-query served-id sets from a (possibly PQ-) index: the JVM
    path scores the DECODED relational view (pq_decode_lists joins);
    the vectorized path ships raw codes and gathers from the
    broadcast codebooks."""
    from sas_etl_spark.operators.ann import (
        collect_pq_codebooks,
        ivf_topk_batch_from,
        ivf_topk_batch_vectorized,
        read_ivf_index,
    )
    from sas_etl_spark.sources.snapshots import read_snapshot

    if vectorized:
        centroids, lists = read_ivf_index(spark, table_dir, decode=False)
        cbs = collect_pq_codebooks(
            read_snapshot(spark, f"{table_dir}/codebooks")
        )
        out = ivf_topk_batch_vectorized(
            centroids, lists, queries, k=10, nprobe=nprobe,
            round_dp=4, probe_round_dp=4, pq_codebooks=cbs,
        ).toPandas()
    else:
        centroids, lists = read_ivf_index(spark, table_dir)
        out = ivf_topk_batch_from(
            centroids, lists, queries, k=10, nprobe=nprobe,
            round_dp=4, probe_round_dp=4, norm_col="vec_norm",
        ).toPandas()
    return out.groupby("qid")["vec_id"].apply(set).to_dict()


def test_pq_index_serves_within_recall_tolerance(spark, tmp_path):
    """VERDICT r12 item 2's attest bar, PQ edition: the
    product-quantized index must serve within 0.05 recall of the
    UNCOMPRESSED exact serve; its JVM (decoded view) and vectorized
    (code gather) serving paths must return IDENTICAL rows; and the
    lists artifact must be much smaller than both raw AND SQ8."""
    import os

    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.ann import build_ivf_index

    sf_dir = SF_SMOKE
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
    pq_dir = str(tmp_path / "pq")
    vers = build_ivf_index(corpus, pq_dir, quantize="pq8", **knobs)
    assert vers["codebooks"] == 1

    exact = _serve_pq_sets(spark, raw_dir, queries, nprobe=16)
    raw4 = _serve_pq_sets(spark, raw_dir, queries, nprobe=4)
    pq4 = _serve_pq_sets(spark, pq_dir, queries, nprobe=4)

    def recall(approx):
        return sum(
            len(approx[q] & exact[q]) / len(exact[q]) for q in exact
        ) / len(exact)

    r_raw, r_pq = recall(raw4), recall(pq4)
    assert r_raw >= 0.35, f"raw recall degenerate: {r_raw}"
    assert r_pq >= r_raw - 0.05, (r_pq, r_raw)

    # JVM decode-view path == vectorized code-gather path
    jvm = _serve_pq_sets(spark, pq_dir, queries, nprobe=4)
    vec = _serve_pq_sets(spark, pq_dir, queries, nprobe=4, vectorized=True)
    assert jvm == vec

    def snapshot_bytes(d):
        total = 0
        for root, _, files in os.walk(os.path.join(d, "lists")):
            total += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )
        return total

    raw_b, sq8_b, pq_b = map(snapshot_bytes, (raw_dir, sq8_dir, pq_dir))
    assert pq_b < sq8_b < raw_b, (pq_b, sq8_b, raw_b)


def test_pq_upsert_into_compressed_index_keeps_layout(spark, tmp_path):
    """A batch upserted into a PQ index must encode under the INDEX'S
    OWN persisted codebooks (metadata-driven, no caller flag) so the
    merged table stays one layout — the sq8 upsert contract, PQ
    edition."""
    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.ann import (
        build_ivf_index,
        ivf_upsert,
        read_ivf_index,
    )
    from sas_etl_spark.sources.snapshots import read_snapshot

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.filter(F.expr("vec_id >= 100 and vec_id % 10 != 3"))
    batch = emb.filter(F.expr("vec_id >= 100 and vec_id % 10 = 3"))
    d = str(tmp_path / "pq_upsert")
    build_ivf_index(
        base, d, n_centroids=8, refine_iters=1, sim_round_dp=4,
        mean_round_dp=6, quantize="pq8",
    )
    ivf_upsert(spark, d, batch, sim_round_dp=4)
    lists = read_snapshot(spark, f"{d}/lists")
    assert "pq_code" in lists.columns and "vec_norm" in lists.columns
    assert lists.count() == base.count() + batch.count() - base.join(
        batch.select("vec_id"), "vec_id", "left_semi"
    ).count()
    # decoded read-back view still exposes the vector column
    _, merged = read_ivf_index(spark, d)
    assert "embedding" in merged.columns
    assert merged.count() == lists.count()


def test_stream_totals_lane_is_recorded(spark):
    """The v2/v1 streaming lane record must be observable after the
    running-totals query runs (ADVICE r12: a silent v2->v1 fallback
    would hide a permanent v2 regression behind a green check)."""
    from sas_etl_spark.registry import queries_map
    from sas_etl_spark.streaming import stateful

    stateful.LAST_TOTALS_LANE = None
    queries_map()["q_stream_stateful_totals_v2"](spark, SF_SMOKE).collect()
    assert stateful.LAST_TOTALS_LANE in ("v1", "v2")


def test_semdedup_drops_exactly_the_planted_copies(spark):
    """q_semdedup's cluster-blocked path must reproduce the brute-force
    dedup decision: every planted copy (vec_id >= 1e6, the scaled-by-2
    twin of vec_id - 1e6) is dropped with exactly one lower-keyed
    duplicate (its original), every base vector is kept — the
    co-clustering guarantee (power-of-two scaling leaves every rounded
    cosine bit-identical) made observable, not just hash-attested."""
    from sas_etl_spark.registry import queries_map

    rows = queries_map()["q_semdedup"](spark, SF_SMOKE).collect()
    planted = [r for r in rows if r.vec_id >= 1_000_000]
    base = [r for r in rows if r.vec_id < 1_000_000]
    assert planted, "fixture must plant copies (vec_id % 25 == 0)"
    assert all(r.kept == 0 and r.n_dups_lower == 1 for r in planted)
    assert all(r.kept == 1 and r.n_dups_lower == 0 for r in base)
    # the decision partitions the corpus: kept + dropped = all rows
    assert len(planted) + len(base) == len(rows)


def test_bloom_contamination_equals_exact_twin(spark):
    """The bloom-prefiltered plan must compute the EXACT contamination
    relation (no false negatives by construction; false positives
    removed by the verify join) — pinned Spark-vs-Spark against
    q_ngram_contamination, the same ground truth its shared oracle
    attests cross-engine."""
    from sas_etl_spark.registry import queries_map

    q = queries_map()
    bloom = {tuple(r) for r in q["q_bloom_contamination"](spark, SF_SMOKE).collect()}
    exact = {tuple(r) for r in q["q_ngram_contamination"](spark, SF_SMOKE).collect()}
    assert bloom == exact
