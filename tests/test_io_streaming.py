"""Tests for sources/sinks, streaming equivalence, and multimodal
plumbing (SURVEY.md §2.1, §2.10, §2.9 #56)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.operators.events import session_counts
from sas_etl_spark.operators.multimodal import attach_fake_payload, extract_features
from sas_etl_spark.queries.events_stream import q_tumbling_counts
from sas_etl_spark.sources import multi_output_split, read_csv, write_csv
from sas_etl_spark.streaming import (
    run_bounded_to_memory,
    session_window_agg,
    stream_events,
    tumbling_agg,
)
from tests.conftest import SF_SMOKE


def test_csv_roundtrip_preserves_rows(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="csv_rt_")
    write_csv(orders, path)
    back = read_csv(
        spark, path, "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    )
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    src_sum = orders.agg(F.sum("o_totalprice")).first()[0]
    rt_sum = back.agg(F.sum("o_totalprice")).first()[0]
    assert abs(src_sum - rt_sum) < 1e-6 * abs(src_sum)


def test_multi_output_split_counts_and_overlap(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    base = tempfile.mkdtemp(prefix="split_")
    counts = multi_output_split(
        orders,
        {
            "open": F.col("o_orderstatus") == "O",
            "rest": F.col("o_orderstatus") != "O",
            "all": F.lit(True),  # overlapping output, like SAS OUTPUT a; OUTPUT b;
        },
        base,
    )
    assert counts["open"] + counts["rest"] == orders.count()
    assert counts["all"] == orders.count()
    assert spark.read.parquet(f"{base}/open").count() == counts["open"]


def test_stream_tumbling_equals_batch(spark):
    """Streaming (file source -> window agg -> memory sink) must equal
    the batch DataFrame answer on the bounded fixture."""
    stream_result = run_bounded_to_memory(
        tumbling_agg(stream_events(spark, SF_SMOKE)), spark
    )
    batch_result = q_tumbling_counts(spark, SF_SMOKE).withColumnRenamed(
        "bucket", "bucket"
    )
    s = {tuple(r) for r in stream_result.collect()}
    b = {tuple(r) for r in batch_result.collect()}
    assert s == b


def test_session_window_matches_lag_gap_session_count(spark):
    """F.session_window (streaming twin) and the batch lag-gap
    operator must agree on sessions per user."""
    events = load_table(spark, SF_SMOKE, "events")
    sw = (
        session_window_agg(events, gap="30 minutes")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("sessions"))
    )
    lag_gap = session_counts(events, gap_seconds=30 * 60)
    s = {(r.user_id, r.sessions) for r in sw.collect()}
    b = {(r.user_id, r.sessions) for r in lag_gap.collect()}
    assert s == b


def test_multimodal_feature_plumbing(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    feats = extract_features(attach_fake_payload(docs, key_col="doc_id"))
    assert [f.name for f in feats.schema.fields] == ["doc_id", "lang", "media", "features"]
    assert feats.schema["features"].dataType.simpleString() == "array<double>"
    rows = feats.select("doc_id", "features").orderBy("doc_id").limit(5).collect()
    assert all(len(r.features) == 8 for r in rows)
    again = (
        extract_features(attach_fake_payload(docs, key_col="doc_id"))
        .select("doc_id", "features")
        .orderBy("doc_id")
        .limit(5)
        .collect()
    )
    assert rows == again  # deterministic fake decode
    assert feats.count() == docs.count()
