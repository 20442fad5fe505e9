"""Text-analysis operators over document tables.

SURVEY.md §2.9 #54-55 plus the driver-mandated LLM-pipeline additions:
tokenization, term stats, quality scoring, language id, fingerprints.
Everything is built from JVM-side expressions (split/explode/regexp) —
no Python in the hot path, so the scan parallelism is the only limit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def tokens(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """One row per whitespace token (SAS: SCAN loop + OUTPUT)."""
    return df.select(F.explode(F.split(F.col(text_col), " ")).alias(out_col))


def term_counts(
    df: DataFrame, text_col: str = "text", word_col: str = "word", count_col: str = "c"
) -> DataFrame:
    """Corpus-wide term frequencies (map-side partial aggregation
    makes this a small shuffle even on huge corpora)."""
    return tokens(df, text_col, word_col).groupBy(word_col).agg(
        F.count(F.lit(1)).alias(count_col)
    )


def top_terms(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    word_col: str = "word",
    count_col: str = "c",
) -> DataFrame:
    """Top-n terms by frequency, tiebroken by word for determinism.
    Executes as TakeOrderedAndProject (no global sort)."""
    return (
        term_counts(df, text_col, word_col, count_col)
        .orderBy(F.desc(count_col), F.asc(word_col))
        .limit(n)
    )
