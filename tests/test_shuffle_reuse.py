"""Pins the engine behavior behind the round-9 measurement correction
(SCALE.md): re-collecting the SAME DataFrame reuses its shuffle map
outputs, so warm re-collects measure resident-plan re-serving, while
a freshly built plan re-executes every stage. If a Spark upgrade ever
changes this, the bench protocol notes must be revisited."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_warm_recollect_reuses_shuffle(spark) -> None:
    # A genuinely shuffle-bound aggregation, large enough that map-side
    # work dominates the job floor.
    def build():
        return (
            spark.range(2_000_000)
            .select((F.col("id") % 100_000).alias("k"), F.col("id").alias("v"))
            .groupBy("k")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .agg(F.sum("s").alias("total"), F.sum("n").alias("rows"))
        )

    df = build()
    df.collect()  # warm: JIT, codegen, page cache
    warm = min(_timed(df.collect) for _ in range(3))
    fresh = min(_timed(lambda: build().collect()) for _ in range(3))
    # Fresh plans re-run the map stage; warm re-collects skip it. The
    # margin is enormous in practice (>10x at bench SFs); assert a
    # conservative 2x so scheduler jitter can't flake the test.
    assert fresh > 2 * warm, (
        f"shuffle reuse no longer detected: fresh {fresh*1000:.0f} ms vs "
        f"warm {warm*1000:.0f} ms — revisit bench.py/SCALE.md protocol notes"
    )
