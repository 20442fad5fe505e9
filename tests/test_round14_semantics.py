"""Round-14 semantics pins: derived bloom geometry (VERDICT r13 item
3), the SemDeDup cluster-count rule and serve-from-index guard (item
2), and the no-natural-near-pairs fixture assumption the embedding
dedup attestations rest on (ADVICE r13), stated as an assertion
instead of docstring lore."""

from __future__ import annotations

import numpy as np
import pytest

from sas_etl_spark.operators.ann import semdedup_against_index, semdedup_k_for
from sas_etl_spark.queries.llm import (
    _BLOOM_M_MAX,
    _BLOOM_M_MIN,
    bloom_m_for,
)
from tests.conftest import SF_CORRECTNESS


def test_bloom_m_floor_covers_driver_fixture() -> None:
    """Tiny eval suites keep the attested r13 geometry (2^20)."""
    assert bloom_m_for(0) == _BLOOM_M_MIN
    assert bloom_m_for(1) == _BLOOM_M_MIN
    # floor holds exactly up to 2^20 / 64 grams
    assert bloom_m_for(_BLOOM_M_MIN // 64) == _BLOOM_M_MIN
    assert bloom_m_for(_BLOOM_M_MIN // 64 + 1) == _BLOOM_M_MIN * 2


def test_bloom_m_tracks_eval_cardinality() -> None:
    """The sf10 sweep's measured optimum falls out of the rule: 372k
    eval grams (the r13 measurement) -> 2^25; the r14 ddup_sf10
    fixture's 196k grams -> 2^24; always the next power of two >= 64n."""
    assert bloom_m_for(196_095) == 1 << 24
    assert bloom_m_for(372_000) == 1 << 25
    for n in (1_000, 50_000, 1_000_000):
        m = bloom_m_for(n)
        assert m >= min(64 * n, _BLOOM_M_MAX)
        assert m == _BLOOM_M_MIN or m // 2 < 64 * n or m == _BLOOM_M_MAX
        assert m & (m - 1) == 0  # power of two


def test_bloom_m_cap() -> None:
    """The cap bounds the position table even at absurd eval sizes."""
    assert bloom_m_for(10**9) == _BLOOM_M_MAX


def test_semdedup_k_rule() -> None:
    """k = max(16, n/1250): the driver fixture resolves to the
    attested 16-centroid recipe; the demb growth rungs resolve to the
    measured r13 scaling discipline (20k -> 16, 200k -> 160)."""
    assert semdedup_k_for(500) == 16
    assert semdedup_k_for(20_000) == 16
    assert semdedup_k_for(200_000) == 160
    assert semdedup_k_for(2_000_000) == 1600


def test_fixture_has_no_natural_near_pairs() -> None:
    """ADVICE r13: q_semdedup / q_semdedup_serve / q_near_dup_embedding
    are hash-attested against brute-force oracles on the argument that
    ONLY the planted IEEE-scaled copies reach cosine >= 0.99 — a
    natural base-base pair at the threshold could cross cluster/bucket
    boundaries and break blocked-plan equality. Assert the assumption
    on the driver-fixture embeddings instead of trusting it."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_CORRECTNESS}/embeddings.parquet", columns=["embedding"])
    mat = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    unit = mat / norms
    sims = unit @ unit.T
    np.fill_diagonal(sims, -1.0)
    max_sim = float(sims.max())
    assert round(max_sim, 6) < 0.99, (
        f"fixture assumption broken: natural base-base cosine {max_sim:.6f} "
        ">= 0.99 — the blocked dedup plans are no longer oracle-equal by "
        "construction"
    )


def test_semdedup_serve_refuses_without_index(spark, tmp_path) -> None:
    """The serve form must prove it served from the artifact: no
    centroids table -> loud refusal, never a silent inline rebuild
    (the q_neardup_mor_serve recipe)."""
    from pyspark.sql import functions as F

    batch = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(RuntimeError, match="requires a built semantic index"):
        semdedup_against_index(spark, str(tmp_path / "nope"), batch, 0.99)
