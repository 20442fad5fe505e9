"""Round-11 regression tests for the degenerate-input fixes the
round-10 advisor flagged: inputs the sf fixtures never produce but a
real corpus will. Each test builds a synthetic fixture that CONTAINS
the degenerate shape and asserts exact Spark-vs-DuckDB parity on it —
the same bar as the driver, on inputs the driver never feeds."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd

from sas_etl_spark.registry import QUERIES, queries_map
from tests.parity import assert_parity

queries_map()


def _oracle_con(sf_dir: str, tables: list[str]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _write_documents(tmp_path, texts: list[str]) -> str:
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["synth"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    sf_dir = tmp_path / "sf_synth"
    sf_dir.mkdir()
    pdf.to_parquet(str(sf_dir / "documents.parquet"))
    return str(sf_dir)


def test_bpe_train_survives_empty_and_one_char_docs(spark, tmp_path):
    """ADVICE r10 (medium): a document rendering to 0/1 symbols used to
    make sequence(1, size-1) descend ([1, 0]) and element_at(_sy, 0)
    throw INVALID_INDEX_OF_ZERO — crashing the whole training query —
    while the oracle's range(1, len) was merely empty. The guard drops
    such docs from pair extraction; both engines must agree on the full
    trajectory over a corpus that contains them."""
    sf_dir = _write_documents(
        tmp_path,
        [
            "",  # 0 symbols
            "a",  # 1 symbol
            "low lower lowest",
            "new newer newest",
            "low low low newer",
        ],
    )
    spec = QUERIES["q_bpe_train"]
    out = spec.fn(spark, sf_dir)
    con = _oracle_con(sf_dir, ["documents"])
    assert_parity(out, con, spec.oracle, "q_bpe_train/degenerate-docs")


def test_bpe_encode_survives_empty_and_one_char_docs(spark, tmp_path):
    """The tokenizer APPLY must also pass a corpus with empty/1-char
    documents (its length >= 2 word guard predates the fix; this pins
    it against regression)."""
    sf_dir = _write_documents(
        tmp_path, ["", "a", "the cat sat on the mat", "a ab abc"]
    )
    spec = QUERIES["q_bpe_encode"]
    out = spec.fn(spark, sf_dir)
    con = _oracle_con(sf_dir, ["documents"])
    assert_parity(out, con, spec.oracle, "q_bpe_encode/degenerate-docs")


def test_bootstrap_ci_survives_all_zero_weight_replicates(spark, tmp_path):
    """ADVICE r10: a 1-row group draws weight 0 in ~e^-1 of replicates
    (~74 of 200), so some replicate means are undefined. Spark ranks
    NULLs first and DuckDB last — before the fix the rank-5/196 order
    statistics selected DIFFERENT replicates per engine. Both sides now
    drop zero-weight replicates and rank over the surviving count; the
    fixture forces dozens of dropped replicates and demands exact
    parity."""
    day0 = datetime.datetime(2024, 5, 1)
    rows = []
    # a healthy group and two degenerate ones (1 and 2 rows)
    for i in range(60):
        rows.append((i, day0 + datetime.timedelta(hours=i), i % 7,
                     "click", float(10 + i % 9), "{}"))
    rows.append((1000, day0, 1, "rare_single", 42.0, "{}"))
    rows.append((1001, day0, 2, "rare_pair", 7.0, "{}"))
    rows.append((1002, day0, 3, "rare_pair", 9.0, "{}"))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sf_dir = tmp_path / "sf_synth"
    sf_dir.mkdir()
    pdf.to_parquet(str(sf_dir / "events.parquet"))
    spec = QUERIES["q_bootstrap_ci"]
    out = spec.fn(spark, str(sf_dir))
    con = _oracle_con(str(sf_dir), ["events"])
    assert_parity(out, con, spec.oracle, "q_bootstrap_ci/zero-weight")
    # the degenerate 1-row group MUST still appear with a defined CI
    res = out.toPandas().set_index("event_type")
    assert "rare_single" in res.index
    assert res.loc["rare_single", "ci_lo"] == res.loc["rare_single", "ci_hi"]


def _serve_sets(spark, table_dir, queries, nprobe):
    from sas_etl_spark.operators.ann import (
        ivf_topk_batch_from,
        read_ivf_index,
    )

    centroids, lists = read_ivf_index(spark, table_dir)
    out = ivf_topk_batch_from(
        centroids, lists, queries, k=10, nprobe=nprobe,
        round_dp=4, probe_round_dp=4, norm_col="vec_norm",
    ).toPandas()
    return out.groupby("qid")["vec_id"].apply(set).to_dict()


def test_ivf_upsert_serve_recall_matches_full_rebuild(spark, tmp_path):
    """VERDICT r10 item 2's attest bar: serving over the UPSERTED index
    (base build + frozen-centroid batch assignment) must reach the same
    recall as a FULL REBUILD over base+batch — the upsert trades a
    k-means re-train for centroid staleness, and on a stationary corpus
    that trade must be recall-neutral. Recall is measured against exact
    search (nprobe = all lists ≡ brute force over the same index)."""
    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.ann import build_ivf_index, ivf_upsert
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr("vec_id >= 100 and vec_id % 10 not in (3, 7)"))
    batch = emb.filter(F.expr("vec_id >= 100 and vec_id % 10 in (3, 7)"))
    full = emb.filter(F.col("vec_id") >= 100)
    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    knobs = dict(
        n_centroids=16, refine_iters=2, sim_round_dp=4, mean_round_dp=6,
        train_ppm=250_000, train_seed=31,
    )
    up_dir = str(tmp_path / "upserted")
    build_ivf_index(base, up_dir, **knobs)
    ivf_upsert(spark, up_dir, batch, sim_round_dp=4)
    rb_dir = str(tmp_path / "rebuilt")
    build_ivf_index(full, rb_dir, **knobs)

    exact = _serve_sets(spark, rb_dir, queries, nprobe=16)  # all lists
    up = _serve_sets(spark, up_dir, queries, nprobe=4)
    rb = _serve_sets(spark, rb_dir, queries, nprobe=4)

    def recall(approx):
        return sum(
            len(approx[q] & exact[q]) / len(exact[q]) for q in exact
        ) / len(exact)

    r_up, r_rb = recall(up), recall(rb)
    # absolute floor only guards degeneracy (the sf0.001 fixture is
    # near-uniform, so nprobe=4/16 recall sits ~0.5 for ANY correct
    # index — cluster-structured corpora score far higher, see
    # tests/test_llm_operators.py); the REAL assertion is parity:
    # upsert must not cost recall vs a full k-means rebuild.
    assert r_rb >= 0.35, f"rebuild recall degenerate: {r_rb}"
    assert r_up >= r_rb - 0.05, (r_up, r_rb)
    # the upserted lists must hold the FULL corpus exactly once each
    from sas_etl_spark.operators.ann import read_ivf_index

    _, lists = read_ivf_index(spark, up_dir)
    assert lists.count() == full.count()
    assert lists.select("vec_id").distinct().count() == full.count()


def test_ivf_upsert_replaces_reingested_ids(spark, tmp_path):
    """Upsert REPLACE semantics: re-upserting an already-indexed batch
    must not grow the lists table (keep-newest, not append)."""
    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.ann import (
        build_ivf_index,
        ivf_upsert,
        read_ivf_index,
    )
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    full = emb.filter(F.col("vec_id") >= 100)
    d = str(tmp_path / "idx")
    build_ivf_index(full, d, n_centroids=8, refine_iters=1,
                    sim_round_dp=4, mean_round_dp=6)
    n0 = read_ivf_index(spark, d)[1].count()
    v = ivf_upsert(
        spark, d, full.filter(F.col("vec_id") % 10 == 3), sim_round_dp=4
    )
    assert v == 2  # a NEW immutable snapshot version was published
    _, lists = read_ivf_index(spark, d)
    assert lists.count() == n0  # replaced, not appended
    from sas_etl_spark.sources.snapshots import read_snapshot

    # time travel: the pre-upsert version is still readable
    assert read_snapshot(spark, f"{d}/lists", version=1).count() == n0


def test_cusum_single_baseline_day_pins_sigma_zero(spark, tmp_path):
    """k = 1 baseline day: stddev_samp is undefined; the integer-
    accumulator rewrite pins sigma6 = 0 on batch, oracle, AND the
    streaming twin (which always used 0) — the chart stays defined and
    both engines agree exactly."""
    day0 = datetime.datetime(2024, 6, 1)
    rows = []
    for j in range(50):
        rows.append((j, day0 + datetime.timedelta(seconds=j), j % 5,
                     "solo_day", 1.0, "{}"))
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    sf_dir = tmp_path / "sf_synth"
    sf_dir.mkdir()
    pdf.to_parquet(str(sf_dir / "events.parquet"))
    spec = QUERIES["q_cusum"]
    out = spec.fn(spark, str(sf_dir))
    con = _oracle_con(str(sf_dir), ["events"])
    assert_parity(out, con, spec.oracle, "q_cusum/k1-baseline")


def test_ivf_upsert_mor_equals_cow_and_compacts(spark, tmp_path):
    """Merge-on-read upsert must be VALUE-identical to copy-on-write
    (same merged lists relation, same serving results) while writing
    only O(batch) per ingest; compaction folds the delta into the base
    and empties it — the LSM L0 contract."""
    from pyspark.sql import functions as F

    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.operators.ann import (
        build_ivf_index,
        ivf_compact,
        ivf_upsert,
        read_ivf_index,
    )
    from sas_etl_spark.sources.snapshots import read_snapshot

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.expr("vec_id >= 100 and vec_id % 10 not in (3, 7)"))
    b1 = emb.filter(F.expr("vec_id >= 100 and vec_id % 10 = 3"))
    b2 = emb.filter(F.expr("vec_id >= 100 and vec_id % 10 in (3, 7)"))
    knobs = dict(n_centroids=8, refine_iters=1, sim_round_dp=4,
                 mean_round_dp=6)

    def snap(table_dir):
        _, lists = read_ivf_index(spark, table_dir)
        return {
            (r.vec_id, r.centroid_id)
            for r in lists.select("vec_id", "centroid_id").collect()
        }

    cow = str(tmp_path / "cow")
    build_ivf_index(base, cow, **knobs)
    ivf_upsert(spark, cow, b1, sim_round_dp=4)  # default cow
    ivf_upsert(spark, cow, b2, sim_round_dp=4)  # b2 re-ingests decile 3

    mor = str(tmp_path / "mor")
    build_ivf_index(base, mor, **knobs)
    ivf_upsert(spark, mor, b1, sim_round_dp=4, mode="mor")
    ivf_upsert(spark, mor, b2, sim_round_dp=4, mode="mor")

    want = snap(cow)
    assert snap(mor) == want
    # MOR left the base untouched (only lists_delta accumulated)...
    assert read_snapshot(spark, f"{mor}/lists").count() == base.count()
    # ...and the delta holds each upserted id exactly once (keep-newest
    # WITHIN the delta across the two batches)
    delta = read_snapshot(spark, f"{mor}/lists_delta")
    assert delta.count() == b2.count()
    # compaction folds delta into base and empties it; the merged view
    # is unchanged before vs after
    ivf_compact(spark, mor)
    assert read_snapshot(spark, f"{mor}/lists_delta").count() == 0
    assert read_snapshot(spark, f"{mor}/lists").count() == len(want)
    assert snap(mor) == want
