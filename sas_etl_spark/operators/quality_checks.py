"""Declarative data-quality checks — one aggregation pass per table.

SAS analog: the validation idiom of PROC FREQ / PROC MEANS output
inspected by macro asserts, or PROC SQL counts feeding %if abort
logic (SURVEY.md §2 family notes); modern analog: dbt tests /
Deequ-style constraint suites. The design rule here is the 100 TB
one: a suite of N checks must cost ONE scan, not N — every check
compiles to a conditional aggregate (`sum(case when violated)`),
so the whole suite is a single Project + partial/final HashAggregate
with no shuffle of data rows (only the 1-row partials merge), and
Catalyst prunes the scan to exactly the checked columns.

Each check is (name, violation_predicate) — a row violates when the
predicate is true. Uniqueness is the one check that genuinely needs
a shuffle (group on the key); it runs as its own keyed aggregation
and unions its 1-row result with the scan-side suite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_suite(
    df: DataFrame,
    checks: Sequence[tuple[str, Column]],
    unique_keys: Sequence[Sequence[str]] = (),
) -> DataFrame:
    """Evaluate all checks in one scan; returns one row per check:
    (check, n_violations, passed).

    ``checks``: (name, violation_predicate) pairs — predicate TRUE
    means the row violates. NULL predicates count as violations
    (unknown is not proof of validity; matches SQL's treatment of
    constraint checks needing explicit null handling).

    ``unique_keys``: column lists that must be duplicate-free; each
    contributes a check named ``unique(<cols>)`` counting the rows in
    excess of one per key value.
    """
    if not checks and not unique_keys:
        raise ValueError(
            "check_suite needs at least one check or unique-key spec"
        )
    # Check names are interpolated into a selectExpr stack() string
    # (as '<name>' literals and `<name>` column refs): a quote or
    # backtick in a name would produce a confusing parse error — or
    # malformed SQL — at plan time. Fail with a clear message instead.
    bad = [n for n, _ in checks if "'" in n or "`" in n]
    if bad:
        raise ValueError(
            f"check names must not contain quotes or backticks: {bad}"
        )
    aggs = [
        F.sum(
            F.when(F.coalesce(pred, F.lit(True)), 1).otherwise(0)
        ).cast("long").alias(name)
        for name, pred in checks
    ]
    wide = df.agg(*aggs) if aggs else None
    parts = []
    if wide is not None:
        stack_expr = ", ".join(f"'{n}', `{n}`" for n, _ in checks)
        parts.append(
            wide.selectExpr(
                f"stack({len(checks)}, {stack_expr}) as (check, n_violations)"
            )
        )
    for keys in unique_keys:
        name = f"unique({','.join(keys)})"
        parts.append(
            df.groupBy(*[F.col(k) for k in keys])
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.lit(name).alias("check"),
                F.sum(F.col("_n") - 1).cast("long").alias("n_violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )
