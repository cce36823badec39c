"""Tests for the stdlib pixel decoders (sources/pixels.py).

Encoder and decoder are separate code paths (filter vs un-filter,
pad vs un-pad), so round-trips are a real differential; the formula
pixels add an independent analytic anchor (the same closed form the
q76 SQL oracle uses)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fineweb_domain_analyzer_spark.sources.media import _decode_image
from fineweb_domain_analyzer_spark.sources.pixels import (
    N_DECODABLE_ASSETS,
    _asset_pixels,
    _asset_spec,
    decode_bmp,
    decode_pixels,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    pixel_stats,
    synth_decodable_assets,
)


def _grid(i: int = 3, w: int = 12, h: int = 7) -> np.ndarray:
    return _asset_pixels(i, w, h)


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------

def test_png_round_trip_all_filter_types():
    # h >= 5 guarantees scanline filters 0..4 all occur (encoder uses y%5)
    px = _grid(h=9)
    assert np.array_equal(decode_png(encode_png(px)), px)


def test_png_rgba_alpha_dropped():
    px = _grid()
    alpha = ((np.arange(7).reshape(7, 1) + np.arange(12)) % 256).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(px, alpha)), px)


def test_bmp_round_trip_row_padding():
    # w=13 -> 39-byte rows padded to 40: exercises the un-pad path
    px = _grid(w=13)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    # w=12 -> 36-byte rows, no padding
    px2 = _grid(w=12)
    assert np.array_equal(decode_bmp(encode_bmp(px2)), px2)


def test_bmp_top_down_negative_height():
    px = _grid()
    payload = bytearray(encode_bmp(px))
    h = px.shape[0]
    # flip to top-down: negate the height, reverse the stored row order
    struct.pack_into("<i", payload, 22, -h)
    row = (px.shape[1] * 3 + 3) & ~3
    off = 54
    body = payload[off:]
    flipped = b"".join(
        bytes(body[(h - 1 - y) * row : (h - y) * row]) for y in range(h)
    )
    assert np.array_equal(decode_bmp(bytes(payload[:off]) + flipped), px)


def test_ppm_round_trip_and_comment_header():
    px = _grid()
    payload = encode_ppm(px)
    assert b"#" in payload[:30]  # encoder embeds a comment line
    assert np.array_equal(decode_ppm(payload), px)


def test_all_synth_assets_round_trip():
    for i in range(N_DECODABLE_ASSETS):
        fmt, w, h = _asset_spec(i)
        px = _asset_pixels(i, w, h)
        if fmt == "png":
            payload = encode_png(px)
        elif fmt == "bmp":
            payload = encode_bmp(px)
        else:
            payload = encode_ppm(px)
        got_fmt, got = decode_pixels(payload)
        assert got_fmt == fmt
        assert np.array_equal(got, px), f"asset {i} ({fmt})"


def test_channel_sums_match_closed_form():
    # the q76 oracle's analytic identity, checked here without Spark/SQL
    i, w, h = 7, 16, 15
    px = _asset_pixels(i, w, h)
    for c in range(3):
        expect = sum(
            (7 * x + 11 * y + 13 * c + 17 * i) % 256
            for x in range(w)
            for y in range(h)
        )
        assert int(px[:, :, c].sum()) == expect


# ---------------------------------------------------------------------------
# adversarial payloads
# ---------------------------------------------------------------------------

def test_png_rejects_truncated_and_corrupt():
    payload = encode_png(_grid())
    with pytest.raises(ValueError):
        decode_png(payload[: len(payload) // 2])
    # corrupt the deflate stream inside IDAT
    bad = bytearray(payload)
    idat_at = payload.index(b"IDAT") + 8
    bad[idat_at] ^= 0xFF
    with pytest.raises(zlib.error):
        decode_png(bytes(bad))


def test_png_rejects_unsupported_bitdepth():
    payload = bytearray(encode_png(_grid()))
    ihdr_data = payload.index(b"IHDR") + 4
    payload[ihdr_data + 8] = 16  # bitdepth byte
    with pytest.raises(ValueError, match="bitdepth"):
        decode_png(bytes(payload))


def test_bmp_rejects_compressed_and_truncated():
    payload = bytearray(encode_bmp(_grid()))
    struct.pack_into("<I", payload, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(payload))
    good = encode_bmp(_grid())
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(good[:-10])


def test_ppm_rejects_bad_maxval_and_truncation():
    px = _grid()
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n12 7\n65535\n" + px.tobytes())
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(px)[:-5])


def test_decode_pixels_unknown_format():
    with pytest.raises(ValueError, match="no stdlib decoder"):
        decode_pixels(b"GIF89a" + b"\x00" * 64)


# ---------------------------------------------------------------------------
# media.py integration: stdlib-first, PIL fallback
# ---------------------------------------------------------------------------

def test_decode_image_uses_stdlib_for_png():
    # works with no PIL installed: the stdlib decoder handles it
    assert _decode_image(encode_png(_grid())) == (12, 7)
    assert _decode_image(encode_bmp(_grid(w=13))) == (13, 7)


def test_decode_image_gif_falls_through():
    gif = b"GIF89a" + struct.pack("<HH", 4, 3) + b"\x00" * 32
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed: fallback path decodes for real")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        _decode_image(gif)


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def test_pixel_stats_operator(spark):
    out = {
        r["asset_id"]: r.asDict()
        for r in pixel_stats(synth_decodable_assets(spark, n=9)).collect()
    }
    assert len(out) == 9
    for i in range(9):
        fmt, w, h = _asset_spec(i)
        px = _asset_pixels(i, w, h)
        sums = px.sum(axis=(0, 1), dtype=np.int64)
        r = out[i]
        assert (r["fmt"], r["width"], r["height"]) == (fmt, w, h)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(s) for s in sums)
