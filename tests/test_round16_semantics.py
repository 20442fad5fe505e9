"""Round-16 semantics: the 64-bit aHash lift, the Hamming-ball banded
near-dup (pigeonhole completeness), and the near-dup fixture's planted
twin-pair structure — each checked against an independent numpy
reimplementation, not the operator's own code."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sas_etl_spark.operators.multimodal import (
    image_phash,
    write_ppm_neardup_fixture,
)


def _ref_ahash64(gray: np.ndarray) -> int:
    """Independent 8x8 aHash reference (signed-64 folded)."""
    h, w = gray.shape
    bx = (np.arange(w) * 8) // w
    by = (np.arange(h) * 8) // h
    cell = (by[:, None] * 8 + bx[None, :]).ravel()
    cn = np.bincount(cell, minlength=64)
    cs = np.bincount(cell, weights=gray.ravel(), minlength=64).astype(
        np.int64
    )
    total, n = int(cs.sum()), w * h
    u = 0
    for b in np.nonzero(cs * n > total * cn)[0]:
        u |= 1 << int(b)
    return u - (1 << 64) if u >= 1 << 63 else u


def _nd_gray(i: int) -> np.ndarray:
    x = np.arange(32, dtype=np.int64)[None, :]
    y = np.arange(32, dtype=np.int64)[:, None]
    b, v = i // 2, i % 2
    g = (b * 53 + 2 * x * x + 3 * y * y + (b % 7 + 1) * x * y) % 256
    if v:
        g = (g + np.where((x < 4) & (y < 4), 180, 0)) % 256
    return g


def test_image_phash_matches_numpy_reference(spark, tmp_path):
    """The distributed 64-bit hash equals the independent reference on
    every near-dup fixture image — including negative (bit-63) hashes,
    which the fold must reproduce exactly."""
    out = str(tmp_path / "nd")
    write_ppm_neardup_fixture(out, n_images=64)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ppm")
        .load(out)
    )
    got = {
        r.img_id: r.phash
        for r in image_phash(
            raw.select("path", "content"), id_pattern=r"nd_(\d+)\.ppm$"
        ).collect()
    }
    want = {i: _ref_ahash64(_nd_gray(i)) for i in range(64)}
    assert got == want
    assert any(v < 0 for v in want.values()), (
        "fixture never sets bit 63 — the signed fold is untested"
    )


def test_phash_neardup_finds_exactly_the_planted_pairs(spark):
    """q_phash_neardup == brute-force d<=3 ball over the reference
    hashes: every pair is a twin (even, odd) pair, none is missed, and
    no cross-scene pair sneaks in."""
    from sas_etl_spark.queries.io_stream import q_phash_neardup

    hs = {i: _ref_ahash64(_nd_gray(i)) for i in range(64)}
    want = {
        (a, b): bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
        for a in range(64)
        for b in range(a + 1, 64)
        if bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in q_phash_neardup(spark, "unused").collect()
    }
    assert got == want
    assert len(want) >= 15  # the fixture plants a meaningful ball
    assert all(a % 2 == 0 and b == a + 1 for a, b in want)


@settings(max_examples=200, deadline=None)
@given(
    base=st.integers(min_value=0, max_value=(1 << 64) - 1),
    flips=st.sets(st.integers(min_value=0, max_value=63), max_size=3),
)
def test_pigeonhole_banding_is_complete(base, flips):
    """Any pair within Hamming distance 3 shares at least one of the
    four 16-bit bands — the no-false-negatives property the banded
    join relies on (checked on the UNSIGNED pattern; band extraction
    masks away sign fill, so signed folding cannot break it)."""
    other = base
    for f in flips:
        other ^= 1 << f
    shares = any(
        (base >> (16 * b)) & 0xFFFF == (other >> (16 * b)) & 0xFFFF
        for b in range(4)
    )
    assert shares


def test_band_extraction_identical_for_negative_hashes(spark):
    """(phash >> 16b) & 0xFFFF on Spark's signed long equals the
    unsigned band for a bit-63-set hash — the arithmetic-shift sign
    fill lands strictly above the mask."""
    from pyspark.sql import functions as F

    u = (1 << 63) | (0xBEEF << 32) | 0x1234
    signed = u - (1 << 64)
    row = (
        spark.range(1)
        .select(
            *[
                F.shiftright(F.lit(signed), 16 * b)
                .bitwiseAND(F.lit(0xFFFF))
                .alias(f"b{b}")
                for b in range(4)
            ]
        )
        .collect()[0]
    )
    assert [row.b0, row.b1, row.b2, row.b3] == [
        (u >> (16 * b)) & 0xFFFF for b in range(4)
    ]
