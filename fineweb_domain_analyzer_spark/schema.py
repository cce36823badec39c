"""Declared StructTypes for every dataset shape the engine touches.

The reference is schema-on-read JSONL (fineweb_analyzer.py:169,451 uses
``json.loads`` + ``.get`` defaults); the engine is schema-on-write.
Shapes mirror SURVEY.md §1:

* PAGES           — canonical input (BASELINE.json input_hint)
* DOMAIN_POLICY   — robots-check dimension (fineweb_analyzer.py:282-290)
* DOMAIN_STATS    — per-domain aggregate (fineweb_analyzer.py:120-126)
* FILTER_METRICS  — run metrics (fineweb_analyzer.py:480-485), extended
                    with per-partition lineage + drop-reason histogram
* JSONL_RECORD    — reference fixture record (examples/test_data.jsonl)
* WARC_RECORD     — WARC-converter output (fineweb_analyzer.py:89-96)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Canonical engine input: Iceberg/parquet table of Common-Crawl-style pages.
PAGES = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

# Robots dimension — one row per domain, broadcast-joined to pages.
# Mirrors the reference result dict at fineweb_analyzer.py:282-290.
DOMAIN_POLICY = StructType(
    [
        StructField("domain", StringType(), nullable=False),
        StructField("robots_exists", BooleanType()),
        StructField("crawl_allowed", BooleanType()),
        StructField("crawl_delay", DoubleType()),
        StructField("disallowed_paths", ArrayType(StringType())),
        StructField("error", StringType()),
        StructField("last_checked", TimestampType()),
        StructField("robots_content", StringType()),
    ]
)

# Per-domain aggregate (fineweb_analyzer.py:120-126). `urls` capped at 5.
DOMAIN_STATS = StructType(
    [
        StructField("domain", StringType(), nullable=False),
        StructField("count", LongType()),
        StructField("urls", ArrayType(StringType())),
        StructField("tld", StringType()),
        StructField("first_seen", StringType()),
        StructField("last_seen", StringType()),
    ]
)

# Run metrics (fineweb_analyzer.py:480-485) generalized with lineage.
FILTER_METRICS = StructType(
    [
        StructField("partition_id", IntegerType()),
        StructField("total_processed", LongType()),
        StructField("filtered_kept", LongType()),
        StructField("excluded_count", LongType()),
        StructField("keep_ratio", DoubleType()),
    ]
)

# language_info nested struct from the reference fixtures (SURVEY §1.1b).
LANGUAGE_INFO = StructType(
    [
        StructField("chinese_chars", IntegerType()),
        StructField("japanese_chars", IntegerType()),
        StructField("korean_chars", IntegerType()),
        StructField("total_chars", IntegerType()),
        StructField("chinese_ratio", DoubleType()),
        StructField("has_chinese", BooleanType()),
    ]
)

# Reference example/fixture record (examples/test_data.jsonl).
JSONL_RECORD = StructType(
    [
        StructField("id", StringType()),
        StructField("url", StringType()),
        # WARC-converter output carries a per-record timestamp
        # (fineweb_analyzer.py:91) consumed by first_seen/last_seen
        # (:184-187); the committed fixtures simply lack the field
        # (parses to null, run-ts fallback applies).
        StructField("timestamp", StringType()),
        StructField("text", StringType()),
        StructField("text_length", IntegerType()),
        StructField("language_info", LANGUAGE_INFO),
        StructField("source_file", StringType()),
        StructField("record_type", StringType()),
        StructField("content_type", StringType()),
    ]
)

# WARC-converter output record (fineweb_analyzer.py:89-96). All header
# fields stay strings, exactly as the reference emits them.
WARC_RECORD = StructType(
    [
        StructField("url", StringType()),
        StructField("timestamp", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", StringType()),
        StructField("status_code", StringType()),
        StructField("content", StringType()),
    ]
)

# Multimodal asset row: opaque binary payload + typed metadata
# (sources/media.py). Decode is stubbed; plumbing is real.
MEDIA_ASSET = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("url", StringType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("content_hash", StringType()),
    ]
)
