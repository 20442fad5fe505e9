"""Vector-similarity operators over array<float> embedding columns.

SURVEY.md §2.9 #53. Exact top-k cosine is the verified baseline
(oracle: DuckDB list_cosine_similarity); LSH/IVF approximate variants
are the 100 TB scale path (rows-only checks) and live in
``ann.py``.

All arithmetic stays JVM-side via higher-order array functions
(zip_with/aggregate) — no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two array columns, computed in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: ColumnOrName) -> Column:
    """Euclidean norm of an array column, computed in double."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity of two array columns (double)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    candidates: DataFrame,
    query: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qv",
    sim_col: str = "sim",
) -> DataFrame:
    """Exact top-k cosine neighbors of a (tiny, broadcast) query set.

    ``query`` must be small — it is broadcast to every task, so the
    "cross join" is really a map-side loop: no shuffle of the
    candidate side at all. The top-k is `orderBy().limit(k)` which
    Spark executes as TakeOrderedAndProject (per-partition heap +
    driver merge of k rows), not a global sort — the plan that
    survives a 100 TB candidate table.
    """
    joined = candidates.crossJoin(F.broadcast(query))
    return (
        joined.select(id_col, cosine(vec_col, query_vec_col).alias(sim_col))
        .orderBy(F.desc(sim_col), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_literal(
    candidates: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_col: str = "sim",
) -> DataFrame:
    """Exact top-k cosine against a *bound* query vector.

    The vector is compiled into the plan as an array literal — the
    prepared-statement-with-parameter form of cosine_topk. One job,
    no broadcast build stage; right for single-vector point lookups
    (the query vector is a parameter, not data). Use cosine_topk when
    the query set itself is a DataFrame.
    """
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        candidates.select(id_col, cosine(vec_col, qv).alias(sim_col))
        .orderBy(F.desc(sim_col), F.asc(id_col))
        .limit(k)
    )
