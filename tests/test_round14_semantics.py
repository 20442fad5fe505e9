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


def _tiny_docs(spark, ids):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(i, f"alpha bravo charlie delta echo foxtrot tok{i} golf hotel") for i in ids],
        "doc_id long, text string",
    ).select("doc_id", "text")


def test_maybe_compact_neardup_boundary(spark, tmp_path) -> None:
    """The compaction trigger (VERDICT r13 item 7): below the
    threshold the O(batch) delta stays (lazy — the band-partitioned
    base makes small deltas ~free to read through); at the threshold
    the fold runs, the delta empties, and the decision + measured
    stats persist as the _index_meta.json maintenance breadcrumb."""
    import json

    from sas_etl_spark.operators.maintenance import (
        index_maintenance_stats,
        maybe_compact,
    )
    from sas_etl_spark.operators.minhash import (
        _read_bands_delta_if_any,
        _read_neardup_meta,
        append_neardup_index,
        build_neardup_index,
    )

    d = str(tmp_path / "ndidx")
    build_neardup_index(_tiny_docs(spark, range(20)), d)
    append_neardup_index(_tiny_docs(spark, range(100, 104)), d, mode="mor")
    stats = index_maintenance_stats(spark, d)
    assert stats["family"] == "neardup"
    assert 0 < stats["delta_fraction"] < 0.25  # 4/20 of the band rows

    below = maybe_compact(spark, d)  # default threshold 0.25
    assert below["compacted"] is False
    delta = _read_bands_delta_if_any(spark, d)
    assert delta is not None and delta.count() > 0  # delta untouched

    at = maybe_compact(spark, d, max_delta_fraction=stats["delta_fraction"])
    assert at["compacted"] is True and "version" in at
    delta = _read_bands_delta_if_any(spark, d)
    assert delta is None or delta.count() == 0  # folded + emptied

    with open(f"{d}/_index_meta.json") as f:
        meta = json.load(f)
    assert meta["maintenance"]["compacted"] is True
    assert meta["maintenance"]["delta_rows"] == stats["delta_rows"]
    # the build-written keys survive the breadcrumb merge
    assert _read_neardup_meta(d)["id_col"] == "doc_id"


def test_maybe_compact_ivf_boundary(spark, tmp_path) -> None:
    """Same policy, IVF family by layout detection; fresh index reads
    as zero delta and maybe_compact is a recorded no-op."""
    from pyspark.sql import functions as F

    from sas_etl_spark.operators.ann import _read_index_meta, ivf_upsert
    from sas_etl_spark.operators.ann import build_ivf_index
    from sas_etl_spark.operators.maintenance import maybe_compact

    def vecs(ids):
        return spark.createDataFrame(
            [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in ids],
            "vec_id long, embedding array<double>",
        )

    d = str(tmp_path / "ivfidx")
    build_ivf_index(vecs(range(40)), d, n_centroids=2, refine_iters=1, dim=3)
    fresh = maybe_compact(spark, d)
    assert fresh == {**fresh, "family": "ivf", "delta_rows": 0, "compacted": False}

    ivf_upsert(spark, d, vecs(range(200, 230)), dim=3, mode="mor")
    decision = maybe_compact(spark, d)  # 30/40 = 0.75 >= 0.25
    assert decision["compacted"] is True and decision["delta_rows"] == 30
    # meta still resolves the layout after the breadcrumb write
    assert _read_index_meta(d)["id_col"] == "vec_id"
