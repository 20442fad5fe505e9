"""Round-16 lossy-WebP (VP8) lane: system-libwebp encode/decode
round-trip bounds and the distributed error-stats kernel. Skip-gated
on hosts without libwebp (the documented gate)."""

from __future__ import annotations

import numpy as np
import pytest

from sas_etl_spark.operators import webp as W

HAS_LIBWEBP = W._load_system_libwebp() is not None

pytestmark = pytest.mark.skipif(
    not HAS_LIBWEBP, reason="system libwebp not present (documented gate)"
)


def test_lossy_roundtrip_error_bounded():
    arr = W.webp_lossy_fixture_gray(24, 14, 7)
    payload = W.encode_webp_lossy_system(arr, quality=80.0)
    assert payload[12:16] == b"VP8 "  # really lossy, not VP8L
    dec = W.decode_webp_system(payload)
    err = np.abs(dec.astype(np.int64) - arr.astype(np.int64))
    assert err.max() <= 8
    assert err.mean() <= 2.0


def test_fixture_spec_has_no_wrap():
    """The analytic source must stay < 256 at every fixture size so
    the 'smooth image' premise of the tight bounds holds."""
    for i in range(64):
        w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 4
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        assert ((i % 100) + 2 * x + 3 * y).max() < 256


def test_distributed_lossy_stats(spark, tmp_path):
    out = str(tmp_path / "lossy")
    W.write_webp_lossy_fixture(out, n_images=12)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.webp")
        .load(out)
    )
    rows = W.webp_lossy_error_stats(raw.select("path", "content")).collect()
    assert len(rows) == 12
    for r in rows:
        assert (r.width, r.height) == (8 + (r.img_id % 5) * 4, 6 + (r.img_id % 3) * 4)
        assert r.max_abs_err <= 8
        assert r.mean_abs_err_u <= 2_000_000


def test_encode_gate_without_library(monkeypatch):
    monkeypatch.setattr(W, "_load_system_libwebp", lambda: None)
    with pytest.raises(NotImplementedError, match="libwebp"):
        W.encode_webp_lossy_system(W.webp_lossy_fixture_gray(8, 6, 0))
