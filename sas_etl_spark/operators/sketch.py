"""Bounded-memory frequency sketches — the heavy-hitter family.

Misra-Gries candidate generation: each task keeps at most ``m``
counters no matter how many distinct keys stream through it — the
regime where even map-side partial-agg hash maps blow memory (billions
of distinct keys per task). The MG guarantee makes the sketch SAFE to
compose with an exact pass: every item whose true count exceeds
N/(m+1) is guaranteed to survive the summary (per partition, and any
globally-heavy item is heavy in at least one partition), so

    candidates = union of per-task MG survivors   (tiny)
    output     = exact recount of candidates, filtered by the exact
                 threshold

is provably EQUAL to the exact heavy-hitter set — deterministic under
any partitioning and any row order, which is what lets q_heavy_hitters
hash-verify against a plain GROUP BY / HAVING oracle.

The per-task summary is built with the MERGEABLE form of MG
(Agarwal et al., "Mergeable Summaries"): per Arrow batch, exact
vectorized value_counts (memory bounded by the batch row cap), merged
into the running summary by count addition, then reduced back to m
counters by subtracting the (m+1)-th largest count — summary error
adds but stays <= N_task/(m+1). No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, col: str, m: int) -> DataFrame:
    """Distinct heavy-hitter CANDIDATES of ``df[col]`` — at most m per
    task, provably a superset of every item with global count
    > N/(m+1). One pass, bounded memory, Arrow-vectorized."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > m:
                # mergeable-MG reduction: subtract the (m+1)-th
                # largest count, keep strictly-positive survivors
                t = sorted(counters.values(), reverse=True)[m]
                counters = {
                    k: c - t for k, c in counters.items() if c - t > 0
                }
        yield pd.DataFrame({col: list(counters.keys())})

    return df.mapInPandas(summarize, f"{col} string").distinct()


def heavy_hitters_exact(df: DataFrame, col: str, m: int) -> DataFrame:
    """Exact heavy hitters (count * (m+1) > N — integer arithmetic,
    no float threshold) computed at sketch cost: MG candidates, exact
    recount of ONLY the candidate keys, exact integer filter.
    Returns (col, c, n_total)."""
    cands = misra_gries_candidates(df, col, m)
    counts = (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("c") * (m + 1) > F.col("n_total"))
        .select(col, F.col("c").cast("long").alias("c"),
                F.col("n_total").cast("long").alias("n_total"))
    )
