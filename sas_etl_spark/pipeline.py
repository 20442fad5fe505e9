"""Metadata-driven pipelines: ETL jobs defined as DATA, not code.

SAS analog: the macro-driven job pattern — %macros reading control
tables that decide which datasets to read, which WHERE clauses and
derived columns to apply, and which summaries to produce (the
dominant idiom of production SAS ETL; SURVEY.md §1.1 namespaces +
§3.1 lifecycle). Here a pipeline is a JSON-able list of step dicts,
compiled step-by-step into ONE DataFrame plan:

    [{"op": "load",   "table": "lineitem"},
     {"op": "filter", "where": "l_shipdate <= timestamp '...'"},
     {"op": "derive", "cols": {"revenue": "l_extendedprice * (1 - l_discount)"}},
     {"op": "join",   "table": "orders", "on": ["l_orderkey=o_orderkey"], "how": "inner"},
     {"op": "agg",    "by": ["l_returnflag"], "aggs": {"rev": "round(sum(revenue), 2)"}},
     {"op": "select", "cols": ["l_returnflag", "rev"]}]

Everything compiles to `F.expr` column expressions on DataFrames, so
the WHOLE spec becomes one Catalyst logical plan: filters still push
to scans, joins still broadcast small sides, aggs still get map-side
partials — declaring the job as data costs nothing at 100 TB because
no step materializes. Unknown ops and malformed steps raise
immediately with the step index (a control-table typo fails at
compile, not mid-job).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sas_etl_spark.catalog import load_table


def _fail(i: int, step: Mapping, msg: str) -> None:
    raise ValueError(f"pipeline step {i} {dict(step)!r}: {msg}")


def run_pipeline(
    spark: SparkSession, sf_dir: str, steps: Sequence[Mapping]
) -> DataFrame:
    """Compile a step list into one DataFrame plan (no actions run)."""
    df: DataFrame | None = None
    for i, step in enumerate(steps):
        try:
            df = _apply_step(spark, sf_dir, df, i, step)
        except KeyError as e:  # missing required key -> compile error
            _fail(i, step, f"missing required key {e.args[0]!r}")
    if df is None:
        raise ValueError("empty pipeline")
    return df


def _apply_step(
    spark: SparkSession,
    sf_dir: str,
    df: DataFrame | None,
    i: int,
    step: Mapping,
) -> DataFrame:
    op = step.get("op")
    if op == "load":
        if df is not None:
            _fail(i, step, "load must be the first step")
        return load_table(spark, sf_dir, step["table"])
    if df is None:
        _fail(i, step, "pipeline must start with a load step")
    if op == "filter":
        return df.filter(F.expr(step["where"]))
    if op == "derive":
        # one projection for all derived columns — a per-column
        # withColumn loop stacks an analyzer pass per column
        return df.withColumns({n: F.expr(e) for n, e in step["cols"].items()})
    if op == "join":
        if not step["on"]:
            _fail(i, step, "join needs at least one 'left=right' key")
        # Alias both sides so a table-to-itself join (load_table
        # returns the SAME cached plan handle for the same table)
        # resolves by qualifier instead of failing as ambiguous.
        ltag, rtag = f"_l{i}", f"_r{i}"
        left_df = df.alias(ltag)
        right_df = load_table(spark, sf_dir, step["table"]).alias(rtag)
        cond = None
        for pair in step["on"]:
            lcol, _, rcol = pair.partition("=")
            if not rcol:
                _fail(i, step, f"join key {pair!r} must be 'left=right'")
            c = F.col(f"{ltag}.{lcol.strip()}") == F.col(f"{rtag}.{rcol.strip()}")
            cond = c if cond is None else cond & c
        return left_df.join(right_df, cond, step.get("how", "inner"))
    if op == "agg":
        aggs = [F.expr(e).alias(n) for n, e in step["aggs"].items()]
        return df.groupBy(*[F.col(c) for c in step.get("by", [])]).agg(*aggs)
    if op == "select":
        return df.select(*step["cols"])
    if op == "sort":
        return df.orderBy(*[F.expr(e) for e in step["by"]])
    if op == "limit":
        return df.limit(int(step["n"]))
    _fail(i, step, f"unknown op {op!r} (known: load/filter/derive/"
                   "join/agg/select/sort/limit)")
    raise AssertionError("unreachable")
