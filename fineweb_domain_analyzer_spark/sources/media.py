"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partitioning,
UDF signatures — is real and tested; the actual codec work (image
decode, audio resample, video frame-sample) is stubbed behind
``NotImplementedError`` / deterministic fakes because the media
libraries aren't available in this environment. On a cluster, swap the
``_fake_*`` bodies for PIL/torchaudio/ffmpeg calls; nothing else
changes.

Scale notes: payloads stay in BinaryType columns end-to-end (Arrow
moves them zero-copy into the Python workers); feature extraction is
``mapInPandas`` so one task streams many batches without materializing
the whole partition; `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds per-batch memory (media rows are large — set it low, e.g. 256,
for video).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fineweb_domain_analyzer_spark.schema import MEDIA_ASSET

MEDIA_FEATURES = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("sniffed_format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature_vec", ArrayType(FloatType())),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/webp
    b"ID3": "mp3",
    b"\x00\x00\x00": "mp4-ish",
}


def sniff_format(payload: bytes | None) -> str | None:
    if payload is None:
        return None
    for magic, name in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return name
    return "unknown"


def _decode_image(payload: bytes) -> tuple[int, int]:
    """STUB: real impl returns (width, height) via PIL.Image.open.
    Raises until a codec library is wired in."""
    raise NotImplementedError("image decode requires PIL; not available here")


def _fake_feature_vec(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: md5-seeded floats.
    Keeps the full pipeline (schema, batching, downstream ANN) testable."""
    h = hashlib.md5(payload).digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def extract_media_features(assets: DataFrame, feature_dim: int = 8) -> DataFrame:
    """assets(MEDIA_ASSET) → MEDIA_FEATURES via mapInPandas.

    Decode steps that need codec libs yield nulls (width/height/
    n_frames) in this environment; byte-level features (length, magic
    sniff, fake embedding) are real.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "byte_len": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                "sniffed_format": pdf["payload"].map(
                    lambda p: sniff_format(None if p is None else bytes(p))
                ),
                "width": pd.Series([None] * len(pdf), dtype="object"),
                "height": pd.Series([None] * len(pdf), dtype="object"),
                "n_frames": pd.Series([None] * len(pdf), dtype="object"),
                "feature_vec": pdf["payload"].map(
                    lambda p: None if p is None else _fake_feature_vec(bytes(p), feature_dim)
                ),
            }
            yield pd.DataFrame(out)

    return assets.mapInPandas(_extract, MEDIA_FEATURES)


def synth_media_assets(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake assets (payload = seeded bytes with real magic
    prefixes) for tests/benchmarks."""
    rows = []
    magics = [b"\xff\xd8\xff", b"\x89PNG", b"GIF8", b"RIFF", b"ID3"]
    types = ["image", "image", "image", "audio", "audio"]
    for i in range(n):
        m = i % len(magics)
        payload = magics[m] + hashlib.md5(f"{seed}:{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                f"https://media.example.com/a/{i}",
                types[m],
                payload,
                len(payload),
                hashlib.md5(payload).hexdigest(),
            )
        )
    return spark.createDataFrame(rows, MEDIA_ASSET)
