"""Lossless-WebP (VP8L) codec lane: decoder vs the paired
feature-configurable encoder (operators/webp.py).

Every decoder path is driven: both Huffman shapes (incl. handcrafted
16-repeat and max_symbol-cap streams the encoder never emits), color
cache, LZ77 plane codes, meta groups, all four transforms, palette
bundling at every width, and the error paths. The distance map's
leading entries are pinned verbatim against the spec document's
published table."""

from __future__ import annotations

import numpy as np
import pytest

from sas_etl_spark.operators.webp import (
    _BitReader,
    _BitWriter,
    _DIST_MAP,
    _lz77_prefix,
    _lz77_read_value,
    _plane_code_to_distance,
    _read_huffman_code,
    decode_webp,
    vp8l_encode,
    webp_bytes,
    webp_fixture_encode_opts,
    write_webp_fixture,
)


def _gradient(w: int, h: int, i: int) -> np.ndarray:
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((i * 7 + c * 13 + x + y) % 256).astype(np.uint8)


def test_distance_map_pinned_against_spec():
    """First 22 plane-code offsets exactly as the spec's table lists
    them; 120 entries total; worked distances match."""
    assert len(_DIST_MAP) == 120
    assert _DIST_MAP[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    # code 1 = one row up; code 2 = previous pixel; raw codes offset 120
    assert _plane_code_to_distance(1, 50) == 50
    assert _plane_code_to_distance(2, 50) == 1
    assert _plane_code_to_distance(121, 50) == 1
    assert _plane_code_to_distance(320, 50) == 200
    # negative-dx entries clamp to >= 1 on narrow images
    assert _plane_code_to_distance(4, 1) == 1  # (-1, 1) on width 1


def test_lz77_prefix_roundtrip():
    for v in list(range(1, 70)) + [127, 128, 1000, 4096]:
        prefix, ebits, extra = _lz77_prefix(v)
        bw = _BitWriter()
        bw.write(extra, ebits)
        assert _lz77_read_value(_BitReader(bw.bytes() or b"\x00"), prefix) == v


@pytest.mark.parametrize("mix", range(6))
def test_roundtrip_every_feature_mix(mix):
    for w, h in [(1, 1), (7, 3), (8, 6), (24, 14), (13, 10)]:
        arr = _gradient(w, h, mix)
        out = decode_webp(vp8l_encode(arr, **webp_fixture_encode_opts(mix)))
        assert out.shape == (h, w, 3)
        assert (out == arr).all(), f"mix={mix} {w}x{h}"


def test_palette_bundling_every_width():
    """2 colors -> 8 px/byte, 4 -> 4, 16 -> 2, >16 -> unbundled; odd
    widths exercise the partial final byte."""
    for ncolors in (2, 4, 16, 40):
        w, h = 13, 5  # 13 % 8 != 0: partial bundles at every width
        arr = np.zeros((h, w, 3), np.uint8)
        for yy in range(h):
            for xx in range(w):
                v = (yy * w + xx) % ncolors
                arr[yy, xx] = (v * 3 % 256, v * 5 % 256, v * 7 % 256)
        assert len(np.unique(arr.reshape(-1, 3), axis=0)) == ncolors
        out = decode_webp(vp8l_encode(arr, palette=True))
        assert (out == arr).all(), f"ncolors={ncolors}"


def test_simple_code_paths():
    # constant image: every huffman code degenerates to <= 2 symbols
    arr = np.full((6, 9, 3), 77, np.uint8)
    assert (decode_webp(vp8l_encode(arr)) == arr).all()
    # two-value image: 2-symbol simple codes
    arr2 = np.broadcast_to(
        np.where(
            (np.arange(54).reshape(6, 9) % 2 == 0)[:, :, None], 10, 200
        ),
        (6, 9, 3),
    ).astype(np.uint8)
    assert (decode_webp(vp8l_encode(arr2)) == arr2).all()
    # constant + lz77: run-length path over a single literal
    assert (decode_webp(vp8l_encode(arr, lz77=True)) == arr).all()


def test_handcrafted_repeat16_code():
    """Decoder path the fixture encoder never emits: code-length code
    using symbol 16 (repeat previous length)."""
    bw = _BitWriter()
    bw.write(0, 1)  # not simple
    # cl lengths: symbol 3 -> len 1 (order pos 5), symbol 16 -> len 1
    # (order pos 8); num_code_lengths = 9
    bw.write(9 - 4, 4)
    for pos in range(9):
        bw.write(1 if pos in (5, 8) else 0, 3)
    bw.write(0, 1)  # no max_symbol cap
    # canonical over {3: len1, 16: len1}: 3 -> code 0, 16 -> code 1
    bw.write_code(0, 1)  # cl symbol 3: lengths[0] = 3
    bw.write_code(1, 1)  # cl symbol 16: repeat prev len
    bw.write(0, 2)  # 3 + 0 = 3 repeats -> symbols 1..3 get len 3
    bw.write_code(1, 1)  # another 16
    bw.write(1, 2)  # 3 + 1 = 4 repeats -> symbols 4..7 get len 3
    dec = _read_huffman_code(_BitReader(bw.bytes()), 8)
    # all 8 symbols now length 3 (complete); decode symbol 5
    bw2 = _BitWriter()
    bw2.write_code(5, 3)
    assert dec.read(_BitReader(bw2.bytes())) == 5


def test_handcrafted_max_symbol_cap():
    """The optional cap: only the first N code-length ops are coded,
    the rest of the alphabet is implicitly zero."""
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(9 - 4, 4)
    for pos in range(9):
        # cl symbols 2 (order pos 4) and 16 (order pos 8)
        bw.write(1 if pos in (4, 8) else 0, 3)
    bw.write(1, 1)  # use max_symbol
    bw.write(0, 3)  # length_nbits = 2
    bw.write(0, 2)  # max_symbol = 2 + 0 = 2 ops
    bw.write_code(0, 1)  # cl symbol 2: lengths[0] = 2
    bw.write_code(1, 1)  # cl 16: repeat len 2
    bw.write(0, 2)  # 3 repeats -> symbols 1..3 len 2; cap stops here
    dec = _read_huffman_code(_BitReader(bw.bytes()), 8)
    bw2 = _BitWriter()
    bw2.write_code(2, 2)
    assert dec.read(_BitReader(bw2.bytes())) == 2


def test_decode_error_paths():
    from sas_etl_spark.operators.webp import _load_system_libwebp

    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"JUNKJUNKJUNKJUNKJUNK")
    # a (garbage) lossy chunk: routed to the system codec when the OS
    # ships libwebp (which rejects the malformed body), otherwise the
    # documented NotImplementedError gate
    lossy = b"RIFF\x10\x00\x00\x00WEBPVP8 \x00\x00\x00\x00"
    if _load_system_libwebp() is None:
        with pytest.raises(NotImplementedError, match="libwebp"):
            decode_webp(lossy)
    else:
        with pytest.raises(ValueError, match="rejected"):
            decode_webp(lossy)
    good = webp_bytes(8, 6, 0)
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(good[:-6])


def test_fixture_matches_pixel_formula():
    """decode(webp_bytes) reproduces the shared ppm/png pixel spec —
    the property the SQL oracle recomputes."""
    for i in [0, 1, 2, 3, 4, 5, 17, 40, 63]:
        w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 4
        assert (decode_webp(webp_bytes(w, h, i)) == _gradient(w, h, i)).all()


def test_webp_stats_distributed_decode(spark, tmp_path):
    """binaryFile -> Arrow-batched mapInPandas decode, mirroring the
    attested PPM/PNG lanes."""
    from sas_etl_spark.operators.webp import webp_stats

    out = str(tmp_path / "webp")
    write_webp_fixture(out, n_images=12)
    raw = spark.read.format("binaryFile").load(out)
    got = {
        r.img_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b)
        for r in webp_stats(raw.select("path", "content")).collect()
    }
    assert len(got) == 12
    for i in range(12):
        w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 4
        arr = _gradient(w, h, i).astype(np.float64)
        means = arr.mean(axis=(0, 1))
        assert got[i][0] == w and got[i][1] == h
        assert got[i][2:] == (means[0], means[1], means[2])


# -- property: round-trip must hold for ANY image under ANY legal
# feature combination, not just the six fixture mixes ----------------

from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _image_and_opts(draw):
    w = draw(st.integers(min_value=1, max_value=20))
    h = draw(st.integers(min_value=1, max_value=12))
    # low-cardinality palette sometimes; full-range noise otherwise
    small_palette = draw(st.booleans())
    vals = st.integers(min_value=0, max_value=3 if small_palette else 255)
    arr = np.array(
        draw(
            st.lists(
                st.tuples(vals, vals, vals), min_size=w * h, max_size=w * h
            )
        ),
        dtype=np.uint8,
    ).reshape(h, w, 3)
    opts = {
        "subtract_green": draw(st.booleans()),
        "cache_bits": draw(st.sampled_from([0, 1, 4, 8])),
        "lz77": draw(st.booleans()),
    }
    shape = draw(st.sampled_from(["none", "predictor", "color", "palette"]))
    if shape == "predictor":
        opts["predictor_bits"] = draw(st.sampled_from([2, 3, 4]))
    elif shape == "color":
        opts["color_bits"] = draw(st.sampled_from([2, 3]))
    elif shape == "palette" and len(
        np.unique(
            (arr[:, :, 0].astype(np.uint32) << 16)
            | (arr[:, :, 1].astype(np.uint32) << 8)
            | arr[:, :, 2]
        )
    ) <= 256:
        opts["palette"] = True
    if draw(st.booleans()):
        opts["meta_bits"] = draw(st.sampled_from([2, 3]))
    return arr, opts


@given(_image_and_opts())
@settings(max_examples=60, deadline=None)
def test_roundtrip_property_any_image_any_features(case):
    """Lossless means LOSSLESS: encode(decode) == identity for random
    pixel content under randomly drawn feature combinations —
    including combos the fixture corpus never emits (e.g. predictor +
    cache + meta groups, 1-bit cache, bundled palette + LZ77)."""
    arr, opts = case
    assert (decode_webp(vp8l_encode(arr, **opts)) == arr).all(), opts
