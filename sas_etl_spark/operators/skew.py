"""Skew mitigation: two-stage salted aggregation and salted broadcast
join (SURVEY.md §4.1 "skew handling"; SAS analog: the manual
split-and-union idiom).

AQE's skew-join splitting covers join-side skew at shuffle
boundaries; these operators cover the cases AQE does not:
- a groupBy whose hot key overwhelms one reducer (salted_agg), and
- deliberate salting when the skew is known a priori and you want a
  deterministic plan (salted_count_join).

Salting is semantics-preserving only for MERGEABLE aggregates; the
helpers expose sum/count/min/max (avg = salted sum / salted count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # stage-2 merges stage-1 partial counts by summing
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: stage 1 groups by (keys..., salt) so a
    hot key spreads over salt_buckets reducers; stage 2 merges the
    partials by the true keys (tiny shuffle: buckets x groups rows).

    aggs: out_col -> (fn_name in {sum,count,min,max}, in_col).
    """
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets)))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[
            _PARTIAL[fn](col).alias(f"_p_{out}")
            for out, (fn, col) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _MERGE[fn](f"_p_{out}").alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )


def explode_salt_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join for a skewed big side against a non-broadcastable
    small side: the big side gets a random-ish salt (derived from its
    partition id — deterministic per execution plan), the small side is
    exploded across every salt value, and the join key becomes
    (on, salt). Row multiplication: small x salt_buckets only.

    Only ``inner`` and ``left`` are semantics-preserving: under a
    right/full outer join every UNMATCHED small-side row would surface
    once per exploded salt copy (salt_buckets null-extended duplicates).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"explode_salt_join: how={how!r} not supported — an unmatched "
            "small-side row would appear salt_buckets times under "
            "right/full outer; use inner or left"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = salted_big.join(exploded_small, on=[on, "_salt"], how=how)
    return joined.drop("_salt")
