"""The sanctioned Python surfaces (SURVEY.md §2.11): Arrow-batched
pandas UDFs standing in for SAS PROC FCMP functions and BY-group
DATA-step logic.

Rules of engagement (SURVEY.md §3.2): the built-in expression forms of
these operations are preferred everywhere (every one of these has a
pure-Catalyst twin registered as an oracle query); the UDF forms exist
to (a) carry genuinely custom Python logic when needed and (b) prove
the Arrow path is result-identical to the JVM path — each UDF query is
oracle-paired against plain SQL.

All closures are self-contained (imports inside, no module globals) so
cloudpickle ships them by value and executors never need the package
importable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def charge_udf(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Scalar pandas UDF (SAS: PROC FCMP function): extended charge.
    Same IEEE double ops as the SQL expression — bit-identical."""
    return price * (1 - discount) * (1 + tax)


@F.pandas_udf(DoubleType())
def weighted_avg_udaf(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-agg pandas UDF (SAS: custom statistic via FCMP in PROC
    MEANS): weight-averaged value."""
    return float((value * weight).sum() / weight.sum())


def zscore_per_group(df: DataFrame, group_col: str, value_col: str, out_schema: str) -> DataFrame:
    """Grouped-map applyInPandas (SAS: BY-group DATA step with
    arbitrary logic): z-score value_col within each group, sample
    stddev, null for singleton/degenerate groups (matching
    stddev_samp semantics)."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf[value_col]
        sd = x.std(ddof=1)
        if pd.isna(sd) or sd == 0.0:
            z = pd.Series([None] * len(x), dtype="float64", index=x.index)
        else:
            z = (x - x.mean()) / sd
        out = pdf.copy()
        out["z"] = z
        return out

    return df.groupBy(group_col).applyInPandas(per_group, schema=out_schema)


def register_tokenize_udtf(spark) -> None:
    """Python UDTF (SAS analog: a DATA step emitting multiple OUTPUT
    rows per input row) — completes the §2.11 surface triplet
    (UDF/UDAF/UDTF). Splits text into (position, token) rows via a
    lateral join. Arrow-batched (useArrow) like every other Python
    lane; still row-generating Python, so — like the UDF/UDAF twins —
    the built-in explode/posexplode form is the hot-path choice and
    this exists to prove the surface is result-identical to SQL.
    Registration is idempotent per session."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx: bigint, token: string", useArrow=True)
    class TokenizeUDTF:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
