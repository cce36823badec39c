"""Tests for the baseline JPEG codec (sources/jpeg_codec.py).

JPEG is lossy, so the anchors are its exactness windows (DC-only
blocks with unit quantization) plus tolerance-bounded round-trips
whose error budget is fully explained by color-conversion and DCT
rounding."""

from __future__ import annotations

import numpy as np
import pytest

from fineweb_domain_analyzer_spark.sources.jpeg_codec import (
    _BitReader,
    _BitWriter,
    _build_decode_table,
    _category,
    _extend,
    decode_jpeg,
    encode_jpeg,
)
from fineweb_domain_analyzer_spark.sources.pixels import (
    _jpeg_block_grid,
    decode_pixels,
)

ONES = np.ones((8, 8))


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def test_bit_io_round_trip_with_stuffing():
    wtr = _BitWriter()
    values = [(0b1011, 4), (0xFF, 8), (0, 1), (0b111111111111, 12), (1, 1)]
    for v, n in values:
        wtr.write(v, n)
    data = wtr.flush()
    # 0xFF bytes in the stream must be followed by a stuffed 0x00
    for i, b in enumerate(data[:-1]):
        if b == 0xFF:
            assert data[i + 1] == 0x00
    rdr = _BitReader(data)
    for v, n in values:
        assert rdr.read_bits(n) == v


def test_extend_matches_t81_table():
    # T.81 Table F.1: category 3 covers -7..-4 and 4..7
    assert _extend(0b100, 3) == 4
    assert _extend(0b111, 3) == 7
    assert _extend(0b000, 3) == -7
    assert _extend(0b011, 3) == -4
    assert _extend(0, 0) == 0
    for v in (-255, -16, -1, 0, 1, 16, 255):
        s = _category(v)
        coded = v if v >= 0 else v + (1 << s) - 1
        assert _extend(coded, s) == v, v


def test_canonical_huffman_decode_table():
    # BITS: one 2-bit code, two 3-bit codes -> canonical codes 00, 010, 011
    table = _build_decode_table([0, 1, 2] + [0] * 13, bytes([7, 8, 9]))
    assert table == {(2, 0b00): 7, (3, 0b010): 8, (3, 0b011): 9}


# ---------------------------------------------------------------------------
# exactness windows
# ---------------------------------------------------------------------------

def test_blockwise_constant_gray_bit_exact():
    g = _jpeg_block_grid(4, 27, 20)  # non-multiple-of-8 dims: crop path
    got = decode_jpeg(encode_jpeg(g, quant=ONES))
    assert np.array_equal(got, np.dstack([g, g, g]))


def test_flat_image_exact_any_quant():
    # constant image -> DC-only; DC quant 8 divides 8*(v-128) exactly
    # only when the shifted value is a multiple of the table entry, so
    # use the default table's DC=8 with v-128 an integer: exact.
    px = np.full((16, 24), 200, dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(px))
    assert np.array_equal(got[:, :, 0], px)


def test_gradient_gray_unit_quant_tight():
    x, y = np.arange(40), np.arange(17)
    px = ((x[None, :] * 3 + y[:, None] * 5) % 251).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(px, quant=ONES))
    assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 1


def test_random_color_unit_quant_bounded():
    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(24, 24, 3)).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(px, quant=ONES))
    # error budget: YCbCr round (±1 per plane) through the inverse
    # matrix -> a few counts; DCT rounding adds ≤1
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 4


def test_lossy_quant_stays_close_on_smooth_input():
    x, y = np.arange(32), np.arange(32)
    px = (100 + 40 * np.sin(x[None, :] / 8) + 40 * np.cos(y[:, None] / 8)).astype(
        np.uint8
    )
    got = decode_jpeg(encode_jpeg(px))  # default lossy table
    assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 12


# ---------------------------------------------------------------------------
# adversarial / unsupported
# ---------------------------------------------------------------------------

def test_rejects_progressive_and_truncated():
    payload = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    sof_at = bytes(payload).index(b"\xff\xc0")
    payload[sof_at + 1] = 0xC2  # SOF2 progressive
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(payload))
    good = encode_jpeg(np.zeros((24, 24), dtype=np.uint8), quant=ONES)
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + b"\x00" * 32)


def test_decode_pixels_dispatches_jpeg():
    g = _jpeg_block_grid(2, 16, 8)
    fmt, got = decode_pixels(encode_jpeg(g, quant=ONES))
    assert fmt == "jpeg"
    assert np.array_equal(got, np.dstack([g, g, g]))
