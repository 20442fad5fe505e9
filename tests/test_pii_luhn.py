"""De-circularizes q_pii_luhn's plant-vs-detect: the query plants its
own card candidates with the same digit arithmetic it later validates,
so a parity-preserved sign error in the fold would cancel out. These
tests pin BOTH engines' validator expressions against a pure-Python
reference implementation and against published Luhn vectors."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sas_etl_spark.queries.text_curation import _DUCK_LUHN, _SPARK_LUHN

#: Published vectors: (16-digit string, Luhn-valid). The valid ones
#: are the standard documentation/test PANs (ISO/IEC 7812 examples
#: used by every payment sandbox); each invalid twin flips one digit.
VECTORS = [
    ("4532015112830366", True),  # classic Visa test number
    ("4532015112830367", False),
    ("5555555555554444", True),  # Mastercard sandbox PAN
    ("5555555555554443", False),
    ("4111111111111111", True),  # Visa sandbox PAN
    ("4111111111111112", False),
    ("1234567890123456", False),
    ("0000000000000000", True),  # degenerate all-zeros: sum 0
]


def _luhn_ref(num: str) -> bool:
    """Independent reference: textbook right-to-left implementation."""
    total = 0
    for i, ch in enumerate(reversed(num), start=1):
        d = int(ch)
        if i % 2 == 0:
            d = d * 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_reference_agrees_with_published_vectors() -> None:
    for num, expected in VECTORS:
        assert _luhn_ref(num) is expected, num


def test_spark_validator_matches_reference(spark) -> None:
    df = spark.createDataFrame([(n,) for n, _ in VECTORS], ["c"])
    got = {
        r["c"]: r["ok"]
        for r in df.select(
            "c",
            F.expr(
                f"exists(array(c), c -> {_SPARK_LUHN['valid_sum']} % 10 = 0)"
            ).alias("ok"),
        ).collect()
    }
    assert got == {n: v for n, v in VECTORS}


def test_duckdb_validator_matches_reference() -> None:
    con = duckdb.connect()
    vals = ", ".join(f"('{n}')" for n, _ in VECTORS)
    rows = con.execute(
        f"""
        select c, len(list_filter([c],
            c -> {_DUCK_LUHN["valid_sum"]} % 10 = 0)) = 1 as ok
        from (values {vals}) t(c)
        """
    ).fetchall()
    assert {c: ok for c, ok in rows} == {n: v for n, v in VECTORS}


@pytest.mark.parametrize("doc_id", [0, 1, 7, 123, 9999])
def test_planted_check_digit_is_luhn_valid(spark, doc_id: int) -> None:
    """The planting arithmetic (position-from-left fold over the
    15-digit base) must produce a Luhn-valid 16-digit number per the
    reference, and the +5-shifted twin must never validate."""
    df = spark.createDataFrame([(doc_id,)], ["doc_id"])
    row = df.select(
        F.lpad(
            ((F.col("doc_id") * 7919 + 11) % F.lit(10**15)).cast("string"),
            15,
            "0",
        ).alias("base")
    ).select(
        "base",
        F.expr(
            f"cast((10 - {_SPARK_LUHN['plant_sum']} % 10) % 10 as string)"
        ).alias("chk"),
    ).collect()[0]
    valid = row["base"] + row["chk"]
    invalid = row["base"] + str((int(row["chk"]) + 5) % 10)
    assert _luhn_ref(valid), valid
    assert not _luhn_ref(invalid), invalid


def test_spark_validator_matches_reference_in_bulk(spark) -> None:
    """200 seeded pseudo-random 16-digit candidates (deterministic:
    derived from a counter via a fixed multiplier, same construction
    the query uses for planting) — the Spark fold must agree with the
    pure-Python reference on every one, valid and invalid alike."""
    nums = [
        str(1_000_000_000_000_0000 + (i * 48271 + 7) % 9_000_000_000_000_000)[
            -16:
        ]
        for i in range(200)
    ]
    df = spark.createDataFrame([(n,) for n in nums], ["c"])
    got = {
        r["c"]: r["ok"]
        for r in df.select(
            "c",
            F.expr(
                f"exists(array(c), c -> {_SPARK_LUHN['valid_sum']} % 10 = 0)"
            ).alias("ok"),
        ).collect()
    }
    expected = {n: _luhn_ref(n) for n in nums}
    assert got == expected
    # sanity: the sample must exercise both branches
    assert any(expected.values()) and not all(expected.values())
