"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partitioning,
UDF signatures — is real and tested, and so are the codec-free
byte-level operators: container-header dimension parsing
(``parse_image_dims``, PNG/GIF/JPEG specs), format sniffing, and the
fixed-stride frame slicer (``sample_video_frames``). Pixel-level
decode is REAL for PNG/BMP/PPM/GIF/baseline-JPEG via the stdlib
decoders in ``sources/pixels.py`` + ``sources/jpeg_codec.py``
(``_decode_image`` tries them first; PIL is only a fallback for
exotic variants, e.g. progressive JPEG) and the embedding
vector is a declared deterministic stand-in (``_fake_feature_vec`` —
swap for a real model UDF; nothing else changes).

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
    BinaryType,
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
    """Pixel-level decode. Stdlib-decodable formats (8-bit truecolor
    PNG via zlib + scanline un-filtering, uncompressed 24-bit BMP,
    netpbm P6, GIF via full LZW, baseline JPEG via Huffman+IDCT —
    sources/pixels.py + jpeg_codec.py) decode for real with no codec
    wheel:
    the full pixel grid is materialized, so corrupt payloads fail here,
    not downstream. Everything else (progressive JPEG/palette PNG/…) falls back
    to PIL when installed, and raises NotImplementedError otherwise.
    The codec-free default path for dimension-only needs stays
    ``parse_image_dims`` (header parsing, no pixel materialization)."""
    from fineweb_domain_analyzer_spark.sources import pixels as _px

    try:
        _, arr = _px.decode_pixels(payload)
        return (arr.shape[1], arr.shape[0])
    except ValueError:
        pass  # not a stdlib-decodable payload — try the PIL path
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "pixel-level decode of this format requires the 'Pillow' "
            "wheel (stdlib decoders cover PNG/BMP/PPM/GIF/baseline-JPEG: sources/pixels.py + jpeg_codec.py;"
            " header-level dims need no codec: parse_image_dims)"
        ) from e
    with Image.open(io.BytesIO(payload)) as im:
        im.load()
        return (im.width, im.height)


def parse_image_dims(payload: bytes | None) -> tuple[int | None, int | None]:
    """(width, height) from the container HEADER — pure byte-format
    parsing per the public PNG/GIF/JPEG specs, no codec library:

    * PNG: IHDR chunk — width/height big-endian u32 at offsets 16/20
    * GIF: logical screen descriptor — little-endian u16 at 6/8
    * JPEG: scan markers for SOF0-SOF15 (skipping non-frame markers);
      height/width big-endian u16 at +5/+7 inside the SOF segment
    * BMP: BITMAPINFOHEADER — width/|height| little-endian i32 at 18/22
    * PPM (P6): whitespace/comment-tolerant ASCII header

    Header dims are all a curation pipeline needs for resize/aspect/
    size filters; full pixel decode is _decode_image.
    """
    import struct

    def _valid(w: int, h: int) -> tuple[int | None, int | None]:
        # PNG caps dims at 2^31-1; anything larger is corrupt/adversarial
        # and would also overflow the IntegerType feature columns
        if 0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF:
            return (w, h)
        return (None, None)

    if payload is None or len(payload) < 10:
        return (None, None)
    if payload[:4] == b"\x89PNG" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return _valid(w, h)
    if payload[:4] in (b"GIF8",) and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return _valid(w, h)
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return _valid(w, abs(h))  # negative height = top-down row order
    if payload[:2] == b"P6":
        vals: list[int] = []
        p = 2
        limit = min(len(payload), 128)  # header is ASCII and short
        while len(vals) < 2 and p < limit:
            c = payload[p : p + 1]
            if c == b"#":
                while p < limit and payload[p : p + 1] != b"\n":
                    p += 1
            elif c.isspace():
                p += 1
            elif c.isdigit():
                start = p
                while p < limit and payload[p : p + 1].isdigit():
                    p += 1
                vals.append(int(payload[start:p]))
            else:
                return (None, None)
        if len(vals) == 2:
            return _valid(vals[0], vals[1])
        return (None, None)
    if payload[:3] == b"\xff\xd8\xff":
        i = 2
        n = len(payload)
        while i + 9 <= n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte — any number may pad a marker
                i += 1
                continue
            # SOF0..SOF15 except DHT(C4)/DAC(CC)/RST
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return _valid(w, h)
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in (0xDA, 0xD9):
                # SOS: everything after is entropy-coded data, where a
                # read 'segment length' is garbage and a spurious
                # 0xFFC0-0xFFCF byte pair could yield bogus dims.
                # EOI: end of image. Either way, no SOF was found.
                return (None, None)
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return (None, None)
    return (None, None)


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
            dims = pdf["payload"].map(
                lambda p: parse_image_dims(None if p is None else bytes(p))
            )
            out = {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "byte_len": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                "sniffed_format": pdf["payload"].map(
                    lambda p: sniff_format(None if p is None else bytes(p))
                ),
                # header-level dims (real, codec-free, no pixel materialization)
                "width": dims.map(lambda d: d[0]),
                "height": dims.map(lambda d: d[1]),
                "n_frames": pd.Series([None] * len(pdf), dtype="object"),
                "feature_vec": pdf["payload"].map(
                    lambda p: None if p is None else _fake_feature_vec(bytes(p), feature_dim)
                ),
            }
            yield pd.DataFrame(out)

    return assets.mapInPandas(_extract, MEDIA_FEATURES)


def sample_video_frames(
    assets: DataFrame, frame_bytes: int = 16, max_frames: int = 8
) -> DataFrame:
    """Frame sampling — one output row per sampled frame
    (asset_id, frame_idx, frame_payload), via a FIXED-STRIDE BYTE
    SLICER: frame j is bytes [j*frame_bytes, (j+1)*frame_bytes), at
    most ``max_frames`` per asset. That is the shipped, tested
    semantics (deterministic, codec-free — the right primitive for
    raw/planar formats where a frame IS a fixed-size byte window).
    The one-to-many mapInPandas shape (explode inside the Python
    worker, output bounded by max_frames) is the plumbing a
    container-aware deployment reuses unchanged, swapping only the
    slicer body for ffmpeg/pyav keyframe extraction."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_payload", BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None:
                    continue
                b = bytes(p)
                n_frames = min(max(len(b) // frame_bytes, 1), max_frames)
                for j in range(n_frames):
                    ids.append(aid)
                    idxs.append(j)
                    frames.append(b[j * frame_bytes : (j + 1) * frame_bytes])
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return assets.mapInPandas(_sample, schema)


def synth_media_assets(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake assets for tests/benchmarks. Image payloads
    carry REAL container headers (PNG IHDR / GIF screen descriptor /
    JPEG SOF0) with known dimensions so the header-dim parser is
    exercised end-to-end; bodies are seeded random bytes."""
    import struct

    rows = []
    for i in range(n):
        m = i % 5
        w, h = 16 + (i % 7) * 10, 9 + (i % 5) * 12
        body = hashlib.md5(f"{seed}:{i}".encode()).digest() * 4
        if m == 0:  # jpeg: SOI + APP0 + SOF0(h, w)
            payload = (
                b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
                + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
                + body
            )
            mtype = "image"
        elif m == 1:  # png: signature + IHDR len/type + w/h
            payload = (
                b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + body
            )
            mtype = "image"
        elif m == 2:  # gif: header + logical screen w/h (LE)
            payload = b"GIF89a" + struct.pack("<HH", w, h) + body
            mtype = "image"
        elif m == 3:
            payload = b"RIFF" + body
            mtype = "audio"
        else:
            payload = b"ID3" + body
            mtype = "video" if i % 10 == 9 else "audio"
        rows.append(
            (
                i,
                f"https://media.example.com/a/{i}",
                mtype,
                payload,
                len(payload),
                hashlib.md5(payload).hexdigest(),
            )
        )
    return spark.createDataFrame(rows, MEDIA_ASSET)
