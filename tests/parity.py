"""Spark-vs-DuckDB parity comparator mirroring the driver's verify:
row-count + schema + order-insensitive value comparison.

Stricter than the driver in one way: values are compared EXACTLY
(floats included). Queries are required to round floating outputs
identically on both sides (registry.py rules), so exact equality is
the honest bar — if it flakes here it could flake in the driver's
hash."""

from __future__ import annotations

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, then rows by all columns — order-insensitive."""
    df = df[sorted(df.columns)]
    # datetime columns: strip tz and unify resolution so Spark (us, UTC)
    # and DuckDB (us, naive) compare equal when values match.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            col = df[c]
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_parity(spark_df, oracle_con, oracle_sql: str, name: str = "") -> None:
    sp = _normalize(spark_df.toPandas())
    du = _normalize(oracle_con.execute(oracle_sql).df())
    assert len(sp) == len(du), f"{name}: row count {len(sp)} != oracle {len(du)}"
    assert list(sp.columns) == list(du.columns), (
        f"{name}: columns {list(sp.columns)} != oracle {list(du.columns)}"
    )
    # dtype kinds must agree (int vs int, float vs float, ...)
    for c in sp.columns:
        assert sp[c].dtype.kind == du[c].dtype.kind, (
            f"{name}.{c}: dtype {sp[c].dtype} vs oracle {du[c].dtype}"
        )
    pd.testing.assert_frame_equal(sp, du, check_dtype=False, check_exact=True, obj=name)
