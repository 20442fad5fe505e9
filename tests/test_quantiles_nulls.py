"""Regression for ADVICE r8: exact_percentiles_hist must IGNORE null
values (like Spark's percentile() and DuckDB's quantile_cont), not
count them into the cumulative ranks. Before the round-9 fix a null
row shifted every rank even though its value never won the
conditional min; callers happened to pass non-null columns so oracle
parity never caught it."""

from __future__ import annotations

from pyspark.sql import functions as F

from sas_etl_spark.operators.quantiles import exact_percentiles_hist


def test_nulls_do_not_shift_ranks(spark) -> None:
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]]
    rows += [("a", None)] * 7  # nulls that must not move P25/P50/P75
    df = spark.createDataFrame(rows, ["g", "v"])
    got = exact_percentiles_hist(
        df, "g", "v", {"p25": 0.25, "p50": 0.5, "p75": 0.75}, round_dp=6
    ).collect()[0]
    ref = df.where(F.col("v").isNotNull()).agg(
        F.round(F.expr("percentile(v, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(v, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(v, 0.75)"), 6).alias("p75"),
    ).collect()[0]
    assert (got["p25"], got["p50"], got["p75"]) == (
        ref["p25"], ref["p50"], ref["p75"],
    )


def test_all_null_group_absent_or_null(spark) -> None:
    """A group whose values are ALL null has no order statistics; it
    must not produce fabricated cut points."""
    rows = [("a", 1.0), ("a", 2.0), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {
        r["g"]: r
        for r in exact_percentiles_hist(
            df, "g", "v", {"p50": 0.5}, round_dp=6
        ).collect()
    }
    assert out["a"]["p50"] == 1.5
    assert "b" not in out or out["b"]["p50"] is None
