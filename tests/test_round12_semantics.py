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
