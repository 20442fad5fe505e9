"""Connected-components operator (tests the iterative driver loop the
SQL oracle can't express directly; q_dup_clusters pins oracle parity).
"""

from __future__ import annotations

import pytest

from sas_etl_spark.operators.graph import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    got = connected_components(df, **kw).collect()
    return {r.node: r.component for r in got}


def test_two_components_and_orientation_invariance(spark):
    # {1,2,3} via 1-2, 3-2 (mixed orientation); {10,11}
    labels = _cc(spark, [(1, 2), (3, 2), (11, 10)])
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_needs_many_rounds(spark):
    # path 0-1-2-...-9: diameter 9 forces multiple rounds, each of
    # which crosses a localCheckpoint boundary (every round —
    # operators/graph.py _CHECKPOINT_EVERY = 1).
    edges = [(i, i + 1) for i in range(9)]
    labels = _cc(spark, edges)
    assert labels == {i: 0 for i in range(10)}


def test_clique_converges_in_one_round(spark):
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    labels = _cc(spark, edges)
    assert labels == {i: 0 for i in range(4)}


def test_self_loop_is_harmless(spark):
    labels = _cc(spark, [(5, 5), (5, 6)])
    assert labels == {5: 5, 6: 5}


def test_round_budget_exhaustion_raises(spark):
    edges = [(i, i + 1) for i in range(9)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, edges, max_iter=3)


def test_pointer_jumping_converges_logarithmically(spark):
    """A 128-node path labels in <= 8 rounds (measured; plain
    propagation would need 127) — proof the shortcut step is active
    and the operator scales to long-chain graphs."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(127)], "a_id long, b_id long"
    )
    labels = {
        r.node: r.component
        for r in connected_components(edges, max_iter=8).collect()
    }
    assert labels == {i: 0 for i in range(128)}
