"""Cross-codec verification of the VP8L lane against the REFERENCE
implementation (libwebp, loaded via ctypes from the system shared
library — no Python codec package involved).

This upgrades the codec lane's evidence beyond round-trip-vs-own-
encoder: (1) libwebp must decode every stream our encoder emits,
bit-exactly, across all six fixture feature mixes — proving the
encoder writes spec-compliant VP8L, not a private dialect; (2) our
decoder must decode libwebp's own lossless output for content that
drives the reference encoder into its full feature set (noise →
literal-heavy Huffman, large images → meta groups, palettes, striped
LZ77 runs, smooth gradients → predictor transforms + short-range
plane codes); (3) the 120-entry plane-code distance map is extracted
from libwebp itself by probing crafted one-backref streams and
compared entry-by-entry — the probe that caught the wrong tail
domain in the first version of the map.

Environment-gated: skips when libwebp.so.7 is absent (the module's
decode correctness is still covered by the in-repo round-trip and
hypothesis suites in test_webp_vp8l.py)."""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from sas_etl_spark.operators import webp as W


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = lib.WebPDecodeRGB.argtypes
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        return lib
    return None


_LIB = _load_libwebp()
pytestmark = pytest.mark.skipif(
    _LIB is None, reason="libwebp shared library not present"
)


def _lib_decode_rgb(data: bytes) -> np.ndarray:
    wo, ho = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGB(data, len(data), ctypes.byref(wo), ctypes.byref(ho))
    assert p, "libwebp rejected the stream"
    out = np.ctypeslib.as_array(p, shape=(ho.value, wo.value, 3)).copy()
    _LIB.WebPFree(p)
    return out


def _lib_encode_lossless(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    buf = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeLosslessRGB(arr.tobytes(), w, h, w * 3, ctypes.byref(buf))
    assert n > 0
    data = ctypes.string_at(buf, n)
    _LIB.WebPFree(buf)
    return data


def _gradient(w: int, h: int, i: int) -> np.ndarray:
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((i * 7 + c * 13 + x + y) % 256).astype(np.uint8)


@pytest.mark.parametrize("mix", range(6))
def test_reference_decoder_accepts_our_streams(mix):
    """Direction 1: every fixture feature mix our encoder emits must
    decode bit-exactly in libwebp — spec compliance, not a dialect."""
    arr = _gradient(24, 14, mix)
    enc = W.vp8l_encode(arr, **W.webp_fixture_encode_opts(mix))
    assert (_lib_decode_rgb(enc) == arr).all(), f"mix={mix}"


@pytest.mark.parametrize("mix", range(6))
def test_reference_decoder_accepts_our_vp8x_containers(mix):
    """Round 15: the VP8X containers vp8x_wrap emits (VP8X header +
    EXIF + VP8L chunks) must decode bit-exactly in libwebp too — the
    container framing is spec-compliant, not just the VP8L payload."""
    arr = _gradient(24, 14, mix)
    enc = W.vp8x_wrap(W.vp8l_encode(arr, **W.webp_fixture_encode_opts(mix)))
    assert (_lib_decode_rgb(enc) == arr).all(), f"mix={mix}"


def _reference_cases():
    rng = np.random.default_rng(42)
    x = np.arange(320)[None, :, None]
    y = np.arange(240)[:, None, None]
    smooth = (
        (np.sin(x / 17) * 60 + np.cos(y / 13) * 60 + 128).astype(np.int64) % 256
    ).astype(np.uint8)
    smooth = np.broadcast_to(smooth, (240, 320, 3)).copy()
    smooth[:, :, 1] = (smooth[:, :, 1] * 0.7 + 30).astype(np.uint8)
    return [
        ("noise-small", rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)),
        ("noise-large", rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)),
        ("palette16", (rng.integers(0, 16, (100, 130, 1)) * np.array([[17, 11, 5]]) % 256).astype(np.uint8)),
        ("stripes", np.tile(rng.integers(0, 256, (1, 200, 3), dtype=np.uint8), (150, 1, 1))),
        # regression: smooth gradients made libwebp emit tail plane
        # codes (97+) that exposed the wrong distance-map domain
        ("smooth-gradient", smooth),
    ]


@pytest.mark.parametrize("name,arr", _reference_cases(), ids=lambda v: v if isinstance(v, str) else "")
def test_our_decoder_accepts_reference_streams(name, arr):
    """Direction 2: libwebp's own lossless encodes — whatever
    transforms, meta groups and backrefs it chooses — must decode
    bit-exactly here."""
    data = _lib_encode_lossless(arr)
    assert (W.decode_webp(data) == arr).all(), name


def _one_backref_stream(code: int, width: int, height: int, back: int) -> bytes:
    """Minimal VP8L: position-encoding literals everywhere except one
    length-1 backref with the given distance plane code."""
    bw = W._BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    npix = width * height
    gf = [0] * 280
    rf = [0] * 256
    bf = [0] * 256
    af = [0] * 256
    df = [0] * 40
    for p in range(npix):
        if p == back:
            continue
        gf[(p >> 8) & 0xFF] += 1
        rf[p & 0xFF] += 1
        bf[7] += 1
        af[255] += 1
    lp, lb, lv = W._lz77_prefix(1)
    dp, db, dv = W._lz77_prefix(code)
    gf[256 + lp] += 1
    df[dp] += 1
    lens = [W._flat_lengths(f) for f in (gf, rf, bf, af, df)]
    for ln in lens:
        W._write_huffman_code(bw, ln)
    tabs = [
        (W._canonical_code_table(ln), sum(1 for v in ln if v) == 1)
        for ln in lens
    ]

    def put(t, s):
        codes, single = t
        if not single:
            c, n = codes[s]
            bw.write_code(c, n)

    gt, rt, bt, at_, dt = tabs
    for p in range(npix):
        if p == back:
            put(gt, 256 + lp)
            if lb:
                bw.write(lv, lb)
            put(dt, dp)
            if db:
                bw.write(dv, db)
        else:
            put(gt, (p >> 8) & 0xFF)
            put(rt, p & 0xFF)
            put(bt, 7)
            put(at_, 255)
    data = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_distance_map_matches_reference_decoder():
    """Extract libwebp's plane-code -> offset mapping empirically (one
    crafted backref per code, source position read back from the
    copied pixel value) and require our table to match all 120
    entries."""
    width, height, back = 20, 10, 180  # max plane distance 8+8*20 <= back
    for code in range(1, 121):
        data = _one_backref_stream(code, width, height, back)
        wo, ho = ctypes.c_int(), ctypes.c_int()
        p = _LIB.WebPDecodeRGBA(
            data, len(data), ctypes.byref(wo), ctypes.byref(ho)
        )
        assert p, f"libwebp rejected probe stream for code {code}"
        out = np.ctypeslib.as_array(
            p, shape=(ho.value * wo.value * 4,)
        ).copy()
        _LIB.WebPFree(p)
        px = out.reshape(width * height, 4)[back]
        src = (int(px[1]) << 8) | int(px[0])
        ref_distance = back - src
        ours = W._plane_code_to_distance(code, width)
        assert ours == ref_distance, (
            f"code {code}: ours {ours}, libwebp {ref_distance}"
        )


def test_lossy_webp_decodes_through_system_codec():
    """The lossy lane: a VP8 (arithmetic-coded) file produced by
    libwebp's lossy encoder decodes through decode_webp's system
    route — dims exact, pixels near the original within lossy
    tolerance at quality 90."""
    _LIB.WebPEncodeRGB.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    rng = np.random.default_rng(7)
    x = np.arange(64)[None, :, None]
    y = np.arange(48)[:, None, None]
    arr = ((x * 2 + y * 3 + rng.integers(0, 4, (48, 64, 3))) % 256).astype(
        np.uint8
    )
    buf = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGB(arr.tobytes(), 64, 48, 64 * 3, 90.0, ctypes.byref(buf))
    assert n > 0
    data = ctypes.string_at(buf, n)
    _LIB.WebPFree(buf)
    assert data[12:16] in (b"VP8 ", b"VP8X"), data[12:16]
    out = W.decode_webp(data)
    assert out.shape == (48, 64, 3)
    err = np.abs(out.astype(np.int64) - arr.astype(np.int64)).mean()
    assert err < 8.0, f"lossy reconstruction error too high: {err}"
