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
    _gif_index_grid,
    _lzw_decode,
    _lzw_encode,
    decode_bmp,
    decode_gif,
    decode_pixels,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_ppm,
    gif_palette,
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


def test_png_gray_and_gray_alpha():
    from fineweb_domain_analyzer_spark.sources.pixels import encode_png_gray

    g = _grid(h=9)[:, :, 0]
    alpha = ((np.arange(9).reshape(9, 1) + np.arange(12)) % 256).astype(np.uint8)
    for payload in (encode_png_gray(g), encode_png_gray(g, alpha)):
        assert np.array_equal(decode_png(payload), np.dstack([g, g, g]))


def test_png_palette():
    from fineweb_domain_analyzer_spark.sources.pixels import encode_png_palette

    idx = _gif_index_grid(4, 14, 11)
    pal = gif_palette()
    assert np.array_equal(decode_png(encode_png_palette(idx, pal)), pal[idx])
    # out-of-range palette index is rejected, not wrapped
    with pytest.raises(ValueError, match="palette index"):
        decode_png(encode_png_palette(idx, pal[:10]))
    # palette PNG with the PLTE chunk stripped is rejected
    payload = encode_png_palette(idx, pal)
    at = payload.index(b"PLTE") - 4
    ln = struct.unpack(">I", payload[at : at + 4])[0]
    with pytest.raises(ValueError, match="missing PLTE"):
        decode_png(payload[:at] + payload[at + 12 + ln :])


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
    from fineweb_domain_analyzer_spark.sources.jpeg_codec import encode_jpeg
    from fineweb_domain_analyzer_spark.sources.pixels import _jpeg_block_grid

    for i in range(N_DECODABLE_ASSETS):
        fmt, w, h = _asset_spec(i)
        if fmt == "gif":
            px = gif_palette()[_gif_index_grid(i, w, h)]
            payload = encode_gif(
                _gif_index_grid(i, w, h), gif_palette(), interlaced=bool(i % 8)
            )
        elif fmt == "jpeg":
            g = _jpeg_block_grid(i, w, h)
            px = np.dstack([g, g, g])
            payload = encode_jpeg(g, quant=np.ones((8, 8)))
        else:
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


# ---------------------------------------------------------------------------
# GIF / LZW
# ---------------------------------------------------------------------------

def test_gif_round_trip_plain_and_interlaced():
    idx = _gif_index_grid(5, 21, 13)
    pal = gif_palette()
    for interlaced in (False, True):
        payload = encode_gif(idx, pal, interlaced=interlaced)
        assert np.array_equal(decode_gif(payload), pal[idx]), interlaced


def test_gif_small_palette_and_clear_reset():
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 5, size=(17, 23)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(5, 3)).astype(np.uint8)
    # clear_every forces mid-stream table resets (the Clear-code path)
    payload = encode_gif(idx, pal, clear_every=13)
    assert np.array_equal(decode_gif(payload), pal[idx])


def test_lzw_kwkwk_and_width_growth():
    # "abab…" immediately hits the KwKwK case (code == next slot)
    raw = bytes([0, 1] * 100)
    assert bytes(_lzw_decode(_lzw_encode(raw, 2), 2, len(raw))) == raw
    # incompressible long stream: code width must grow to 12 bits and
    # the table must reset at 4095 without desync
    rng = np.random.RandomState(3)
    raw = bytes(rng.randint(0, 4, size=60000, dtype=np.uint8))
    assert bytes(_lzw_decode(_lzw_encode(raw, 2), 2, len(raw))) == raw


def test_gif_rejects_truncated_and_garbage():
    payload = encode_gif(_gif_index_grid(1, 9, 7), gif_palette())
    with pytest.raises(ValueError):
        decode_gif(payload[:40])
    with pytest.raises(ValueError, match="bad GIF block marker"):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 4, 3, 0, 0, 0) + b"\x07")


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
        decode_pixels(b"RIFF" + b"\x00" * 64)  # wav/webp container


def test_parse_image_dims_bmp_and_ppm_headers():
    from fineweb_domain_analyzer_spark.sources.media import parse_image_dims

    px = _grid(w=13, h=9)
    assert parse_image_dims(encode_bmp(px)) == (13, 9)
    assert parse_image_dims(encode_ppm(px)) == (13, 9)
    # top-down BMP stores a negative height; dims are |height|
    b = bytearray(encode_bmp(px))
    struct.pack_into("<i", b, 22, -9)
    assert parse_image_dims(bytes(b)) == (13, 9)
    assert parse_image_dims(b"P6\nabc") == (None, None)
    assert parse_image_dims(b"P6\n# only a comment\n") == (None, None)


# ---------------------------------------------------------------------------
# media.py integration: stdlib-first, PIL fallback
# ---------------------------------------------------------------------------

def test_decode_image_uses_stdlib_decoders():
    # works with no PIL installed: the stdlib decoders handle these
    assert _decode_image(encode_png(_grid())) == (12, 7)
    assert _decode_image(encode_bmp(_grid(w=13))) == (13, 7)
    gif = encode_gif(_gif_index_grid(2, 10, 4), gif_palette())
    assert _decode_image(gif) == (10, 4)


def test_decode_image_exotic_falls_through():
    # a corrupt/unsupported payload the stdlib decoders reject
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed: fallback path decodes for real")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="Pillow"):
        _decode_image(jpeg)


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
        if fmt == "gif":
            px = gif_palette()[_gif_index_grid(i, w, h)]
        elif fmt == "jpeg":
            from fineweb_domain_analyzer_spark.sources.pixels import (
                _jpeg_block_grid,
            )

            g = _jpeg_block_grid(i, w, h)
            px = np.dstack([g, g, g])
        else:
            px = _asset_pixels(i, w, h)
        sums = px.sum(axis=(0, 1), dtype=np.int64)
        r = out[i]
        assert (r["fmt"], r["width"], r["height"]) == (fmt, w, h)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(s) for s in sums)
