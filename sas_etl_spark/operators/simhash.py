"""SimHash fingerprinting + Hamming-distance near-dup blocking.

Driver-mandated LLM-pipeline operator (SURVEY.md §2.9 #52, SimHash
variant). A document's 64-bit SimHash: bit j is the sign of
sum over tokens of ±1 according to bit j of the token's hash.
Near-duplicates = pairs within Hamming distance d.

Candidate generation uses the pigeonhole block trick: split the 64
bits into 4 16-bit blocks; any pair with Hamming distance <= 3 agrees
exactly on at least one block, so an equi-join per block finds all
such pairs — no O(n²) comparison. Everything is Catalyst expressions
(nested higher-order lambdas + bit ops); no Python UDF. The core is
written as a SQL expression because the Python shiftleft/shiftright
wrappers only take literal shift amounts, while Catalyst itself
accepts any expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_HAMMING = 3


def simhash64_expr(text_col: str) -> Column:
    """64-bit SimHash of whitespace tokens (unweighted) of the named
    string column."""
    return F.expr(
        f"""
        aggregate(
          sequence(0, 63),
          cast(0 as bigint),
          (acc, j) -> acc + if(
            aggregate(
              transform(split({text_col}, ' '), x -> xxhash64(x)),
              0,
              (a, h) -> a + if((shiftright(h, j) & 1) = 1, 1, -1)
            ) > 0,
            shiftleft(cast(1 as bigint), j),
            cast(0 as bigint))
        )
        """
    )


def with_simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    return df.withColumn(out_col, simhash64_expr(text_col))


#: Bit width of the engine-portable simhash: the token hash is the top
#: 15 hex chars (60 bits) of sha256, the widest prefix that fits a
#: signed 64-bit integer in both engines.
PORTABLE_BITS = 60


def portable_token_hashes_expr(text_col: str) -> Column:
    """Per-token 60-bit sha256-prefix hashes (engine-portable twin of
    xxhash64 tokens — reproducible in DuckDB via Horner over hex)."""
    return F.expr(
        f"""
        transform(split({text_col}, ' '),
                  x -> cast(conv(substr(sha2(x, 256), 1, 15), 16, 10) as bigint))
        """
    )


def simhash_from_hashes_expr(hashes_col: str, bits: int = PORTABLE_BITS) -> Column:
    """SimHash folded from a precomputed token-hash array column.

    Hoisting the hashes into their own column matters: lambdas are not
    CSE'd across iterations, so inlining the hash transform here would
    recompute every token hash once per bit (60x the sha256 work).
    """
    return F.expr(
        f"""
        aggregate(
          sequence(0, {bits - 1}),
          cast(0 as bigint),
          (acc, j) -> acc + if(
            aggregate(
              {hashes_col},
              0,
              (a, h) -> a + if((shiftright(h, j) & 1) = 1, 1, -1)
            ) > 0,
            shiftleft(cast(1 as bigint), j),
            cast(0 as bigint))
        )
        """
    )


def with_simhash_portable(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash"
) -> DataFrame:
    """Engine-portable SimHash (60-bit sha256 token hashes) — the
    DuckDB-verifiable twin of with_simhash; production pipelines keep
    the xxhash64 form (~10x cheaper per token)."""
    return (
        df.withColumn("_hs", portable_token_hashes_expr(text_col))
        .withColumn(out_col, simhash_from_hashes_expr("_hs"))
        .drop("_hs")
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def _block_array(sh: Column, num_blocks: int, total_bits: int = 64) -> Column:
    """Split a total_bits-wide simhash into num_blocks near-equal bit
    blocks (shift amounts are Python ints, so the plain wrappers
    apply)."""
    base, extra = divmod(total_bits, num_blocks)
    widths = [base + (1 if k < extra else 0) for k in range(num_blocks)]
    offsets = [sum(widths[:k]) for k in range(num_blocks)]
    return F.array(
        *[
            F.shiftrightunsigned(sh, off).bitwiseAND(F.lit((1 << w) - 1))
            for off, w in zip(offsets, widths)
        ]
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = DEFAULT_MAX_HAMMING,
    portable: bool = False,
) -> DataFrame:
    """Id pairs (a_id < b_id) with SimHash Hamming distance <=
    max_hamming. Uses max_hamming+1 blocks: a pair within distance d
    must agree exactly on at least one of d+1 disjoint blocks
    (pigeonhole), so the per-block equi-join finds every such pair.
    Larger d -> narrower blocks -> more candidates; precision stays
    exact via the hamming filter. ``portable=True`` fingerprints with
    the 60-bit sha256 hash (DuckDB-verifiable) instead of xxhash64."""
    num_blocks = max_hamming + 1
    total_bits = PORTABLE_BITS if portable else 64
    if portable:
        hashed = with_simhash_portable(df, text_col, "_sh").select(
            F.col(id_col).alias("_id"), "_sh"
        )
    else:
        hashed = df.select(
            F.col(id_col).alias("_id"), simhash64_expr(text_col).alias("_sh")
        )
    blocks = hashed.select(
        "_id",
        "_sh",
        F.posexplode(_block_array(F.col("_sh"), num_blocks, total_bits)).alias(
            "_blk", "_bh"
        ),
    )
    left = blocks.select(
        F.col("_id").alias("a_id"), F.col("_sh").alias("_sha"), "_blk", "_bh"
    )
    right = blocks.select(
        F.col("_id").alias("b_id"),
        F.col("_sh").alias("_shb"),
        F.col("_blk").alias("_blk2"),
        F.col("_bh").alias("_bh2"),
    )
    return (
        left.join(
            right,
            (left._blk == right._blk2)
            & (left._bh == right._bh2)
            & (left.a_id < right.b_id),
        )
        .select("a_id", "b_id", hamming64(F.col("_sha"), F.col("_shb")).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
