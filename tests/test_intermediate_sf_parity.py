"""Intermediate-SF parity for the O(n²)-oracle family (VERDICT r6
item 8): q_jaccard_pairs / q_near_dup_minhash / q_dup_clusters (and
round 8's q_containment_pairs, same all-pairs oracle shape) are
hash-exact at sf0.01 and protocol-skipped at sf0.1 (their DuckDB
twins — all-pairs Jaccard and a recursive transitive closure — run
50+ minutes there). This suite fills the gap in between: the SAME
exact comparison on a deterministic ~1.66x subset of the DRIVER'S
sf0.1 documents fixture (doc_id % 6 == 0 -> ~833 docs, ~2.8x the
pair count of sf0.01), so "exact-verified" does not stop at 500
docs. Subsetting driver data keeps both engines reading identical
driver-generated rows — nothing synthesized.

Budget: the three oracles cost ~13/12/38 s at 500 docs and scale
with pairs; at ~833 docs the whole module runs in roughly 3-4
minutes, dominated by DuckDB's recursive closure — intentionally the
point (the Spark side stays banded/blocked and flat)."""

from __future__ import annotations

import duckdb
import pytest

from sas_etl_spark.registry import QUERIES, queries_map
from tests.parity import assert_parity

queries_map()

SF_SOURCE = "/root/testdata/sf0.1"
TRIO = ("q_jaccard_pairs", "q_near_dup_minhash", "q_dup_clusters",
        "q_containment_pairs")


@pytest.fixture(scope="module")
def mid_sf_dir(spark, tmp_path_factory):
    """Write the deterministic documents subset once per module."""
    out = tmp_path_factory.mktemp("sf_mid")
    (
        spark.read.parquet(f"{SF_SOURCE}/documents.parquet")
        .filter("doc_id % 6 = 0")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(out / "documents.parquet"))
    )
    return str(out)


@pytest.fixture(scope="module")
def mid_oracle_con(mid_sf_dir):
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{mid_sf_dir}/documents.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", TRIO)
def test_onsquared_oracle_parity_at_intermediate_sf(
    spark, mid_sf_dir, mid_oracle_con, name
):
    spec = QUERIES[name]
    sdf = spec.fn(spark, mid_sf_dir)
    assert_parity(sdf, mid_oracle_con, spec.oracle, name=f"{name}@mid-sf")


def test_subset_is_nontrivial(spark, mid_sf_dir):
    """The subset must be a real intermediate point: strictly more
    docs than sf0.01's 500, and it must still CONTAIN near-duplicate
    structure (the planted dup pairs aren't all modulo'd away) —
    otherwise the trio's parity above would be vacuously comparing
    empty results."""
    n = spark.read.parquet(f"{mid_sf_dir}/documents.parquet").count()
    assert n > 600, n
    clusters = QUERIES["q_dup_clusters"].fn(spark, mid_sf_dir)
    assert clusters.count() > 0
