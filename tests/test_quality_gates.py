"""Semantics pins for the quality-selection lane (queries/quality_gates,
q_span_dedup, q_reservoir_sample) beyond the DuckDB hash parity that
test_oracle_parity already enforces:

- the two-level scale forms (bucketed reservoir cut, histogram-ranked
  pruning threshold) must select IDENTICAL rows to their naive
  window-over-everything spellings, and
- the fixture must exercise both branches of every gate rule (a rule
  that always passes tests nothing).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table
from sas_etl_spark.queries.cube_sample import (
    RESERVOIR_K,
    RESERVOIR_SEED,
    q_reservoir_sample,
)
from sas_etl_spark.queries.quality_gates import q_gopher_rules, q_quality_prune
from sas_etl_spark.queries.text_curation import SPAN_TOKENS, q_span_dedup
from tests.conftest import SF_CORRECTNESS, SF_SMOKE


def test_reservoir_two_level_matches_naive_window(spark):
    """The bucketed candidate cut must pick exactly the rows a full
    per-source window would — the cut is an optimization, never a
    semantic change."""
    docs = load_table(spark, SF_SMOKE, "documents")
    h60 = F.conv(
        F.substring(
            F.sha2(
                F.concat(
                    F.lit(f"{RESERVOIR_SEED}:"),
                    F.col("doc_id").cast("string"),
                ),
                256,
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy("h60", "doc_id")
    naive = (
        docs.select("doc_id", "source", h60.alias("h60"))
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= RESERVOIR_K)
        .select("source", "doc_id", "sample_rank")
    )
    got = q_reservoir_sample(spark, SF_SMOKE)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_reservoir_exact_k_per_group(spark):
    counts = (
        q_reservoir_sample(spark, SF_CORRECTNESS)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.max("sample_rank").alias("mx"))
        .collect()
    )
    assert len(counts) == 20
    assert all(r.n == RESERVOIR_K and r.mx == RESERVOIR_K for r in counts)


def test_quality_prune_keeps_exact_top_half(spark):
    """n_kept must equal ceil(n/2) per source, and the kept set must be
    exactly the naive (score desc, doc_id) top-k — threshold + boundary
    assembly is an optimization, never a semantic change."""
    rows = q_quality_prune(spark, SF_CORRECTNESS).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_kept == (r.n_total + 1) // 2, r.source

    docs = load_table(spark, SF_CORRECTNESS, "documents")
    sc = docs.select(
        "doc_id", "source", F.split("text", " ").alias("toks")
    ).select(
        "doc_id",
        "source",
        F.expr(
            "cast(size(array_distinct(toks)) * 1000000L as bigint)"
            " div size(toks)"
        ).alias("score_ppm"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score_ppm"), F.asc("doc_id")
    )
    n_w = Window.partitionBy("source")
    naive = (
        sc.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(n_w))
        .filter(F.col("rn") <= F.expr("(n + 1) div 2"))
    )
    digest = F.conv(
        F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 15),
        16,
        10,
    ).cast("long")
    naive_digests = {
        r.source: r.d
        for r in naive.groupBy("source")
        .agg(F.bit_xor(digest).alias("d"))
        .collect()
    }
    got_digests = {r.source: r.id_digest for r in rows}
    assert got_digests == naive_digests


def test_gopher_every_rule_exercises_both_branches(spark):
    agg = (
        q_gopher_rules(spark, SF_CORRECTNESS)
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(c).alias(c)
                for c in ("ok_len", "ok_wlen", "ok_stop", "ok_rep", "pass_all")
            ],
        )
        .first()
    )
    for c in ("ok_len", "ok_wlen", "ok_stop", "ok_rep", "pass_all"):
        assert 0 < agg[c] < agg["n"], f"rule {c} never fails (or never passes)"


def test_gopher_verdict_is_conjunction(spark):
    bad = (
        q_gopher_rules(spark, SF_CORRECTNESS)
        .filter(
            F.col("pass_all")
            != (
                F.col("ok_len")
                * F.col("ok_wlen")
                * F.col("ok_stop")
                * F.col("ok_rep")
            )
        )
        .count()
    )
    assert bad == 0


def test_span_dedup_conservation_and_first_occurrence(spark):
    """Every document's spans are all accounted for (kept + dropped),
    the corpus-wide drop count equals the duplicate-occurrence count of
    the span multiset, and a document with no duplicated spans keeps
    its text verbatim (kept_sha == sha of the original span join)."""
    out = q_span_dedup(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    grid_n = docs.select(
        (
            F.floor((F.size(F.split("text", " ")) - 1) / SPAN_TOKENS) + 1
        ).alias("n")
    ).agg(F.sum("n")).first()[0]
    tot = out.agg(
        F.sum("n_spans").alias("s"), F.sum("n_dropped").alias("d")
    ).first()
    assert tot.s == grid_n

    dup_occurrences = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.floor(
                            (F.size(F.split("text", " ")) - 1) / SPAN_TOKENS
                        ).cast("int"),
                    ),
                    lambda i: F.array_join(
                        F.slice(
                            F.split("text", " "),
                            i * SPAN_TOKENS + 1,
                            SPAN_TOKENS,
                        ),
                        " ",
                    ),
                )
            ).alias("cid", "span"),
        )
        .groupBy("span")
        .agg((F.count(F.lit(1)) - 1).alias("extra"))
        .agg(F.sum("extra"))
        .first()[0]
    )
    assert tot.d == dup_occurrences

    # untouched documents keep their exact text
    untouched = out.filter(F.col("n_dropped") == 0)
    verbatim = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("text_sha")
    )
    mismatch = (
        untouched.join(verbatim, "doc_id")
        .filter(F.col("kept_sha") != F.col("text_sha"))
        .count()
    )
    assert mismatch == 0
    assert untouched.count() > 0


def test_isqrt_sql_exact_on_both_engines(spark):
    """The portable isqrt (q_temperature_mixture's weight kernel) must
    be the EXACT integer square root on both engines — including past
    2^53 where the double seed is fed a rounded input — and identical
    between them. Adversarial values: perfect squares and their
    neighbors across the whole supported range (to ~4e18)."""
    import duckdb

    from sas_etl_spark.queries.cube_sample import _isqrt_sql

    roots = [1, 2, 3, 10, 999, 10**6, 94906265, 10**9, 1999999999]
    xs = sorted(
        {r * r + d for r in roots for d in (-1, 0, 1) if r * r + d > 0}
        | {2**53 - 1, 2**53, 2**53 + 1, 4 * 10**18}
    )
    expr = _isqrt_sql("x")
    sdf = spark.createDataFrame([(x,) for x in xs], "x long").selectExpr(
        "x", f"{expr} as r"
    )
    got_spark = {r.x: r.r for r in sdf.collect()}
    con = duckdb.connect()
    got_duck = {
        x: r
        for x, r in con.execute(
            f"select x, {expr} as r from (select unnest(?::bigint[]) as x)",
            [xs],
        ).fetchall()
    }
    con.close()
    import math

    for x in xs:
        exact = math.isqrt(x)
        assert got_spark[x] == exact, (x, got_spark[x], exact)
        assert got_duck[x] == exact, (x, got_duck[x], exact)
