"""Real audio decode: RIFF/WAVE PCM — pure stdlib, no codec wheels.

Companion to sources/pixels.py (images): WAV is the audio format whose
sample layer is decodable with the standard library alone. The parser
walks RIFF chunks (tolerating extra chunks like LIST before/after fmt),
validates the PCM fmt block, and de-interleaves 8/16-bit frames into a
per-channel int32 matrix. An encoder lives alongside as the test
harness's independent inverse.

Per-asset features are exact integers (frame count, per-channel sum of
samples, sum of |samples|) rather than float RMS, so the q77 oracle —
which recomputes them from the closed-form sample formula in pure SQL —
compares bit-exactly regardless of partitioning.

Scale shape: decode runs inside ``mapInPandas`` over the binary column
(Arrow zero-copy into the worker); output is a fixed handful of int64s
per asset — map-only, no shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, samples[n_frames, n_channels] int32) for PCM WAV
    (8-bit unsigned -> centered at -128..127; 16/24-bit signed LE) and
    32-bit IEEE-float WAV (format code 3; samples returned as
    round(f * 32768), the exact inverse of encode_wav's scaling)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"truncated WAV chunk {cid!r}")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
            if fmt is not None:
                break  # fmt must precede data per spec; we have both
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format == 1:
        if bits not in (8, 16, 24):
            raise ValueError(f"unsupported PCM WAV bit depth {bits}")
    elif audio_format == 3:
        if bits != 32:
            raise ValueError(f"unsupported float WAV bit depth {bits}")
    else:
        raise ValueError(
            f"unsupported WAV format code {audio_format} (PCM or IEEE float)"
        )
    if n_channels < 1 or block_align != n_channels * (bits // 8):
        raise ValueError("inconsistent WAV channel/block layout")
    n_frames = len(data) // block_align
    n = n_frames * n_channels
    if audio_format == 3:
        samples = np.round(
            np.frombuffer(data, "<f4", n).astype(np.float64) * 32768.0
        ).astype(np.int32)
    elif bits == 8:
        samples = np.frombuffer(data, np.uint8, n).astype(np.int32) - 128
    elif bits == 16:
        samples = np.frombuffer(data, "<i2", n).astype(np.int32)
    else:  # 24-bit: 3-byte little-endian two's complement
        b = np.frombuffer(data, np.uint8, n * 3).reshape(n, 3).astype(np.int32)
        samples = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = np.where(samples >= 1 << 23, samples - (1 << 24), samples)
    return sample_rate, samples.reshape(n_frames, n_channels)


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16, *, float32: bool = False
) -> bytes:
    """Inverse of decode_wav: interleave (n_frames, n_channels) int32
    into a PCM (8/16/24-bit) or IEEE-float (samples/32768 as float32)
    WAV, with a junk LIST chunk before fmt so the decoder's chunk
    walking is exercised. int/32768 is exact in float32 for 16-bit
    magnitudes, so the float path round-trips bit-exactly too."""
    n_frames, n_channels = samples.shape
    if float32:
        bits = 32
        body = (samples.astype(np.float64) / 32768.0).astype("<f4").tobytes()
    elif bits == 8:
        body = (samples + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        body = samples.astype("<i2").tobytes()
    elif bits == 24:
        flat = samples.reshape(-1).astype(np.int32) & 0xFFFFFF
        b = np.empty((flat.size, 3), dtype=np.uint8)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        body = b.tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block_align = n_channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 3 if float32 else 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len + pad
    chunks = (
        junk
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# ---------------------------------------------------------------------------
# deterministic assets + the q77 audio-stats operator
# ---------------------------------------------------------------------------

N_AUDIO_ASSETS = 24


def _audio_spec(i: int) -> tuple[int, int, int, int]:
    """(n_frames, n_channels, sample_rate, bits) — mirrored by the
    q77 oracle."""
    return (
        100 + (i % 6) * 50,
        1 + (i % 2),
        8000 + (i % 3) * 4000,
        8 if i % 4 == 0 else 16,
    )


def _audio_samples(i: int, n_frames: int, n_channels: int, bits: int) -> np.ndarray:
    """sample(t, ch) = ((13t + 29ch + 31i) mod M) - M/2 where M is the
    sample range (256 or 65536) — closed-form, SQL-recomputable."""
    m = 256 if bits == 8 else 65536
    t = np.arange(n_frames).reshape(n_frames, 1)
    ch = np.arange(n_channels).reshape(1, n_channels)
    return ((13 * t + 29 * ch + 31 * i) % m - m // 2).astype(np.int32)


def synth_audio_assets(spark: SparkSession, n: int = N_AUDIO_ASSETS) -> DataFrame:
    rows = []
    for i in range(n):
        n_frames, n_channels, rate, bits = _audio_spec(i)
        payload = encode_wav(
            _audio_samples(i, n_frames, n_channels, bits), rate, bits
        )
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


AUDIO_STATS = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sum_samples", LongType()),
        StructField("sum_abs", LongType()),
    ]
)


def audio_stats(assets: DataFrame) -> DataFrame:
    """assets(asset_id, payload) → per-asset decoded layout + exact
    integer sample sums, via mapInPandas (map-only, no shuffle)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AUDIO_STATS.fields}
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                rate, samples = decode_wav(bytes(p))
                out["asset_id"].append(aid)
                out["sample_rate"].append(rate)
                out["n_frames"].append(samples.shape[0])
                out["n_channels"].append(samples.shape[1])
                out["sum_samples"].append(int(samples.sum(dtype=np.int64)))
                out["sum_abs"].append(int(np.abs(samples).sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    return assets.mapInPandas(_stats, AUDIO_STATS)
