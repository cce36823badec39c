"""Real pixel-level image decode — pure stdlib, no codec wheels.

The media path (sources/media.py) parses container headers codec-free
and gates full decode behind PIL. This module closes the gap for the
three formats whose pixel layer IS decodable with the standard library:

* **PNG** (RFC 2083 / W3C spec): chunk walk, IDAT concat +
  ``zlib.decompress``, then scanline UN-filtering for all five filter
  types (None/Sub/Up/Average/Paeth) — 8-bit truecolor (type 2) and
  truecolor+alpha (type 6), non-interlaced.
* **BMP** (BITMAPINFOHEADER): uncompressed 24-bit, 4-byte row padding,
  bottom-up row order, BGR channel order.
* **PPM** (netpbm P6): whitespace/comment-tolerant header, maxval 255.

Encoders for the same three formats live here too — they are the test
harness's ground truth (encode a formula-generated pixel grid, decode
the bytes, compare sums), and the PNG encoder deliberately cycles the
filter type per scanline (``y % 5``) so every un-filter branch is
exercised by round-trip tests and by the q76 analytic oracle.

Scale shape: decode runs inside ``mapInPandas`` (Arrow moves the binary
column zero-copy into the worker); per-asset output is a fixed handful
of integers, so the operator is map-only — no shuffle, no driver state.
Channel sums are exact uint64s, not float means, so the oracle compare
is bit-exact regardless of partitioning.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# decoders (payload bytes -> (h, w, 3) uint8 RGB array)
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit truecolor(+alpha) PNG; returns RGB
    (alpha, when present, is decoded then dropped)."""
    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = len(PNG_SIG)
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bitdepth != 8 or colortype not in (2, 6):
                raise ValueError(
                    f"unsupported PNG (bitdepth={bitdepth}, type={colortype}); "
                    "only 8-bit truecolor(+alpha)"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/filter/interlace")
            channels = 3 if colortype == 2 else 4
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    bpp = channels
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        ftype = raw[y * (stride + 1)]
        if ftype == 0:
            recon = line
        elif ftype == 2:  # Up — vectorizable
            recon = (line + prior) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
            recon = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                up = prior[i]
                ul = prior[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) >> 1
                else:
                    pred = _paeth(int(left), int(up), int(ul))
                recon[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    px = out.reshape(height, width, channels)
    return np.ascontiguousarray(px[:, :, :3])


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BITMAPINFOHEADER BMP to RGB."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP: bad signature/size")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (dib_size,) = struct.unpack("<I", payload[14:18])
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    width, height = struct.unpack("<ii", payload[18:26])
    bpp, compression = (
        struct.unpack("<H", payload[28:30])[0],
        struct.unpack("<I", payload[30:34])[0],
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    height = abs(height)
    row = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    need = data_off + row * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    buf = np.frombuffer(payload, dtype=np.uint8, count=row * height, offset=data_off)
    rows = buf.reshape(height, row)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary netpbm P6 (maxval 255) to RGB."""
    if payload[:2] != b"P6":
        raise ValueError("not a PPM: bad magic")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            vals.append(int(payload[start:pos]))
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    width, height, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # single whitespace after maxval
    need = width * height * 3
    if len(payload) - pos < need:
        raise ValueError("truncated PPM pixel data")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
        .reshape(height, width, 3)
        .copy()
    )


_DECODERS = {
    "png": decode_png,
    "bmp": decode_bmp,
    "ppm": decode_ppm,
}


def decode_pixels(payload: bytes) -> tuple[str, np.ndarray]:
    """(format, (h, w, 3) uint8 RGB) for any stdlib-decodable format."""
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return "png", decode_png(payload)
    if payload[:2] == b"BM":
        return "bmp", decode_bmp(payload)
    if payload[:2] == b"P6":
        return "ppm", decode_ppm(payload)
    raise ValueError("no stdlib decoder for this payload (try PIL path)")


# ---------------------------------------------------------------------------
# encoders — the test/oracle harness's ground truth
# ---------------------------------------------------------------------------

def encode_png(px: np.ndarray, alpha: np.ndarray | None = None) -> bytes:
    """Encode RGB(+optional alpha plane) as PNG, cycling the scanline
    filter type ``y % 5`` so decode exercises every un-filter branch."""
    h, w, _ = px.shape
    channels = 3 if alpha is None else 4
    if alpha is not None:
        px = np.dstack([px, alpha])
    stride = w * channels
    bpp = channels
    raw = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = px[y].reshape(stride).astype(np.int32)
        ftype = y % 5
        raw.append(ftype)
        for i in range(stride):
            left = int(line[i - bpp]) if i >= bpp else 0
            up = int(prior[i])
            ul = int(prior[i - bpp]) if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pred = _paeth(left, up, ul)
            raw.append((int(line[i]) - pred) & 0xFF)
        prior = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if channels == 3 else 6, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode RGB as an uncompressed 24-bit bottom-up BMP."""
    h, w, _ = px.shape
    row = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        line = px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (row - len(line))
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


def encode_ppm(px: np.ndarray) -> bytes:
    """Encode RGB as binary P6, with a comment line in the header (so
    decode's comment skipping is exercised)."""
    h, w, _ = px.shape
    return (
        f"P6\n# synth {w}x{h}\n{w} {h}\n255\n".encode("ascii") + px.tobytes()
    )


# ---------------------------------------------------------------------------
# deterministic decodable assets + the q76 pixel-stats operator
# ---------------------------------------------------------------------------

N_DECODABLE_ASSETS = 30


def _asset_spec(i: int) -> tuple[str, int, int]:
    """(fmt, w, h) for asset i — mirrored analytically by the q76 oracle."""
    fmt = ("png", "bmp", "ppm")[i % 3]
    return fmt, 8 + (i % 5) * 4, 6 + (i % 4) * 3


def _asset_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Pixel (x, y, c) = (7x + 11y + 13c + 17i) mod 256 — closed-form,
    so the oracle recomputes channel sums in SQL without any decoder."""
    x = np.arange(w).reshape(1, w, 1)
    y = np.arange(h).reshape(h, 1, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((7 * x + 11 * y + 13 * c + 17 * i) % 256).astype(np.uint8)


def synth_decodable_assets(
    spark: SparkSession, n: int = N_DECODABLE_ASSETS
) -> DataFrame:
    """n fully-decodable images (PNG round-robin with BMP and PPM; every
    other PNG is RGBA so the alpha-drop path runs) whose pixels follow
    the closed-form _asset_pixels formula."""
    rows = []
    for i in range(n):
        fmt, w, h = _asset_spec(i)
        px = _asset_pixels(i, w, h)
        if fmt == "png":
            alpha = (
                ((np.arange(h).reshape(h, 1) + np.arange(w) + i) % 256).astype(
                    np.uint8
                )
                if (i // 3) % 2
                else None
            )
            payload = encode_png(px, alpha)
        elif fmt == "bmp":
            payload = encode_bmp(px)
        else:
            payload = encode_ppm(px)
        rows.append((i, payload))
    return spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("asset_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )


PIXEL_STATS = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("fmt", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def pixel_stats(assets: DataFrame) -> DataFrame:
    """assets(asset_id, payload) → per-asset decoded dimensions + exact
    per-channel pixel sums, via mapInPandas (map-only, no shuffle)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in PIXEL_STATS.fields}
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                fmt, px = decode_pixels(bytes(p))
                sums = px.sum(axis=(0, 1), dtype=np.int64)
                out["asset_id"].append(aid)
                out["fmt"].append(fmt)
                out["width"].append(px.shape[1])
                out["height"].append(px.shape[0])
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return assets.mapInPandas(_stats, PIXEL_STATS)
