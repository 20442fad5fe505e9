"""Deterministic hash-based splits (train/validation/test).

The training-pipeline counterpart of seeded `df.sample`: a row's split
is a pure function of its key, so the assignment is stable across
runs, engines, cluster sizes, and data re-partitioning — the property
a 100 TB training pipeline actually needs (re-running the pipeline
must not migrate documents between train and test). Spark's
`randomSplit`/`sample` are seed-deterministic only per partitioning,
and not reproducible in any other engine; `pmod(sha256(key), 100)` is
reproducible everywhere (the DuckDB oracle recomputes it exactly).

Narrow, shuffle-free: one codegen Project per row, no exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 100, seed: int | None = None) -> Column:
    """Stable bucket in [0, buckets) from sha256 of the key's string
    form. First 15 hex digits -> bigint (60 bits, fits a long exactly)
    -> mod. Engine-portable: any system with sha256 reproduces it.

    ``seed`` (optional) is prepended to the hashed string (``"42:"``),
    giving seeded-RNG semantics with hash determinism: the same seed
    always selects the same rows; a different seed draws a fresh,
    statistically independent membership — the PROC SURVEYSELECT
    SEED= behavior, but reproducible across engines and partitionings.
    """
    key_str = (F.col(key) if isinstance(key, str) else key).cast("string")
    if seed is not None:
        key_str = F.concat(F.lit(f"{seed}:"), key_str)
    h = F.conv(F.substring(F.sha2(key_str, 256), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def srs_sample(
    df: DataFrame, key: str, rate_per_mille: int, seed: int | None = None
) -> DataFrame:
    """Simple random sample at ``rate_per_mille``/1000 by seeded key
    hash (SAS: PROC SURVEYSELECT METHOD=SRS SEED=n).

    The deterministic twin of ``df.sample(fraction, seed)``: membership
    is a pure function of (seed, key) instead of Spark's
    partition-dependent RNG stream, so the drawn rows are identical
    across engines, runs, cluster sizes, and repartitioning — and a
    cross-engine oracle can reproduce the exact member ROWS. Narrow,
    shuffle-free: one codegen Project + filter at the scan; the
    unsampled rest is never materialized.
    """
    return df.filter(hash_bucket(key, 1000, seed=seed) < rate_per_mille)


def deterministic_split(
    df: DataFrame,
    key: str,
    splits: Sequence[tuple[str, int]] = (("train", 80), ("valid", 10), ("test", 10)),
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name by hash-bucketing its key.

    ``splits`` maps names to integer percentages (must sum to 100).
    Bucket thresholds are cumulative: with the default, buckets 0-79
    -> train, 80-89 -> valid, 90-99 -> test.
    """
    weights = [w for _, w in splits]
    if sum(weights) != 100:
        raise ValueError(f"split percentages must sum to 100, got {sum(weights)}")
    bucket = hash_bucket(key, 100)
    expr: Column | None = None
    cum = 0
    for name, w in splits[:-1]:
        cum += w
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    labeled = expr.otherwise(last) if expr is not None else F.lit(last)
    return df.withColumn(split_col, labeled)
