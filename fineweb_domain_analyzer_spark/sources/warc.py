"""WARC source — S1/S2 of SURVEY.md §2.1, distributed.

The reference converts WARC → JSONL single-threaded with warcio
(/root/reference/fineweb_analyzer.py:64-113): keep only
``rec_type == 'response'`` records, project six fields, decode the body
utf-8 with errors='ignore'.

Spark shape: ``spark.read.format('binaryFile')`` LISTS the WARC files
(only the ``path`` column is selected, so the source never materializes
file contents in the JVM), then a ``mapInPandas`` over the path list
opens each file directly in the Python worker and STREAMS records out
in bounded Arrow batches. One file per task — WARC.gz is not
block-splittable, and CC shards are ~1 GB each, so file-granular
parallelism is the right unit at scale; a 100 TB crawl is ~100k files
= ~100k tasks.

Why paths, not bytes: shipping whole files as binary rows would buffer
each ~1 GB shard once in the JVM, again through Arrow, and a third
time in the Python worker — a per-task memory spike that also hits
binaryFile's 2 GB single-cell limit. Streaming worker-side keeps peak
memory at one WARC record + one output batch regardless of shard size.
Non-local schemes (s3://, hdfs://...) open through fsspec when
importable — the standard Python filesystem layer the workers would
use on a real cluster.

The parser implements the public ISO 28500 WARC format directly
(header block terminated by CRLFCRLF, Content-Length-delimited body,
two trailing CRLFs between records; gzip members per record for .gz).
warcio is used instead when importable — same semantics; the built-in
parser keeps the engine dependency-free.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from typing import BinaryIO

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from fineweb_domain_analyzer_spark.schema import WARC_RECORD

try:  # optional, preferred when present
    from warcio.archiveiterator import ArchiveIterator  # type: ignore

    HAS_WARCIO = True
except Exception:  # pragma: no cover
    HAS_WARCIO = False


def _read_headers(stream: BinaryIO) -> dict[str, str] | None:
    """Read a CRLF-terminated header block into a case-insensitive dict.
    Returns None at EOF."""
    lines = []
    while True:
        line = stream.readline()
        if not line:
            return None if not lines else {"_": ""}
        if line in (b"\r\n", b"\n"):
            break
        lines.append(line)
    headers: dict[str, str] = {}
    for ln in lines:
        txt = ln.decode("utf-8", "ignore").rstrip("\r\n")
        if ":" in txt:
            k, v = txt.split(":", 1)
            headers[k.strip().lower()] = v.strip()
        else:
            headers.setdefault("_status", txt)
    return headers


RESPONSE_TYPES = ("response",)
# WET shards (Common Crawl's pre-extracted plain text) carry the text as
# `conversion` records: the block IS the document — no HTTP envelope —
# and Content-Type lives in the WARC header itself (text/plain).
CONVERSION_TYPES = ("conversion",)


def iter_warc_records_builtin(
    stream: BinaryIO, record_types: tuple[str, ...] = RESPONSE_TYPES
) -> Iterator[dict]:
    """Minimal WARC/1.x reader: yields dicts shaped like the reference's
    JSON records. Default keeps only response records (reference
    behavior); pass CONVERSION_TYPES for WET shards."""
    while True:
        # skip record separators
        pos_line = stream.readline()
        while pos_line in (b"\r\n", b"\n"):
            pos_line = stream.readline()
        if not pos_line:
            return
        if not pos_line.startswith(b"WARC/"):
            return  # malformed tail — stop (reference would error out)
        headers = _read_headers(stream)
        if headers is None:
            return
        length = int(headers.get("content-length", "0"))
        block = stream.read(length)
        rec_type = headers.get("warc-type", "")
        if rec_type not in record_types:
            continue
        if rec_type != "response":
            # conversion (WET) and other non-HTTP records: the block is
            # the payload; content-type comes from the WARC header
            yield {
                "url": headers.get("warc-target-uri"),
                "timestamp": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": headers.get("content-length"),
                "status_code": None,
                "content": block.decode("utf-8", "ignore"),
            }
            continue
        # block = HTTP response: status line + headers + CRLF + body
        http_headers: dict[str, str] = {}
        status_code: str | None = None
        body = block
        sep = block.find(b"\r\n\r\n")
        if sep == -1:
            sep = block.find(b"\n\n")
            hdr_blob, body = (block[:sep], block[sep + 2 :]) if sep >= 0 else (b"", block)
        else:
            hdr_blob, body = block[:sep], block[sep + 4 :]
        if hdr_blob[:5] in (b"HTTP/",):
            lines = hdr_blob.split(b"\r\n")
            status_parts = lines[0].decode("utf-8", "ignore").split()
            if len(status_parts) >= 2:
                status_code = status_parts[1]
            for ln in lines[1:]:
                t = ln.decode("utf-8", "ignore")
                if ":" in t:
                    k, v = t.split(":", 1)
                    http_headers[k.strip().lower()] = v.strip()
        else:
            body = block  # not an HTTP payload; treat whole block as body
        yield {
            "url": headers.get("warc-target-uri"),
            "timestamp": headers.get("warc-date"),
            "content_type": http_headers.get("content-type"),
            "content_length": headers.get("content-length"),
            "status_code": status_code,
            # decode-with-ignore: the invariant-critical step
            # (fineweb_analyzer.py:95)
            "content": body.decode("utf-8", "ignore"),
        }


def iter_warc_records_warcio(
    stream: BinaryIO, record_types: tuple[str, ...] = RESPONSE_TYPES
) -> Iterator[dict]:
    for record in ArchiveIterator(stream):
        if record.rec_type not in record_types:
            continue
        http = record.http_headers if record.rec_type == "response" else None
        yield {
            "url": record.rec_headers.get_header("WARC-Target-URI"),
            "timestamp": record.rec_headers.get_header("WARC-Date"),
            "content_type": http.get_header("Content-Type")
            if http
            else record.rec_headers.get_header("Content-Type"),
            "content_length": record.rec_headers.get_header("Content-Length"),
            "status_code": http.get_statuscode() if http else None,
            "content": record.content_stream().read().decode("utf-8", "ignore"),
        }


def parse_warc_bytes(
    raw: bytes,
    is_gzip: bool,
    max_records: int | None = None,
    record_types: tuple[str, ...] = RESPONSE_TYPES,
) -> Iterator[dict]:
    stream: BinaryIO = io.BytesIO(raw)
    if is_gzip:
        stream = gzip.GzipFile(fileobj=stream)  # type: ignore[assignment]
    it = (
        iter_warc_records_warcio(stream, record_types)
        if HAS_WARCIO
        else iter_warc_records_builtin(stream, record_types)
    )
    for i, rec in enumerate(it):
        if max_records is not None and i >= max_records:
            return
        yield rec


def _open_stream(path: str) -> BinaryIO:
    """Open a (possibly URI-style) path for streaming inside a Python
    worker. ``file:`` URIs and bare paths use plain ``open``; any other
    scheme goes through fsspec (s3://, hdfs://, gs://...) when it is
    importable."""
    from urllib.parse import unquote, urlparse

    if path.startswith("file:"):
        return open(unquote(urlparse(path).path), "rb")
    if "://" not in path:
        return open(path, "rb")
    try:
        import fsspec  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            f"non-local WARC path {path!r} needs fsspec (+ the scheme's "
            "filesystem package, e.g. s3fs) on the executors"
        ) from e
    return fsspec.open(path, "rb").open()


def stream_warc_file_batches(
    path: str,
    names: list[str],
    batch_rows: int = 2048,
    max_records: int | None = None,
    batch_bytes: int = 32 * 1024 * 1024,
    record_types: tuple[str, ...] = RESPONSE_TYPES,
) -> Iterator[pd.DataFrame]:
    """Stream ONE warc(.gz) file as bounded pandas DataFrames.
    This is the exact per-file loop the read_warc workers run. A batch
    flushes at ``batch_rows`` rows OR ``batch_bytes`` of accumulated
    content — the byte cap matters because record size is
    corpus-controlled: 2048 rows of 48 KB pages is a 100 MB Arrow
    batch, so a row-only cap would make worker memory scale with
    document fatness. With both caps, peak RSS is one record + one
    bounded batch, independent of file size AND record size — see
    tests/test_warc_media.py::test_warc_streaming_memory_bounded and
    BENCH/warc_memory.json."""
    with _open_stream(path) as fh:
        stream: BinaryIO = (
            gzip.GzipFile(fileobj=fh)  # type: ignore[assignment]
            if path.endswith(".gz")
            else fh
        )
        it = (
            iter_warc_records_warcio(stream, record_types)
            if HAS_WARCIO
            else iter_warc_records_builtin(stream, record_types)
        )
        out: list[dict] = []
        out_bytes = 0
        for i, rec in enumerate(it):
            if max_records is not None and i >= max_records:
                break
            out.append(rec)
            out_bytes += len(rec.get("content") or "")
            if len(out) >= batch_rows or out_bytes >= batch_bytes:
                yield pd.DataFrame(out, columns=names)
                out, out_bytes = [], 0
        if out:
            yield pd.DataFrame(out, columns=names)


def read_warc(
    spark: SparkSession,
    path: str,
    max_records_per_file: int | None = None,
    batch_rows: int = 2048,
    batch_bytes: int = 32 * 1024 * 1024,
    record_types: tuple[str, ...] = RESPONSE_TYPES,
) -> DataFrame:
    """Distributed WARC scan: one task per file; each worker opens its
    file directly and streams records out in Arrow batches bounded by
    both row count and content bytes, so peak memory is one record +
    one bounded batch, never the whole shard. Schema = WARC_RECORD
    (all strings, matching the reference's JSONL output shape)."""
    # binaryFile prunes the content column away when only `path` is
    # selected — this scan is a listing, not a read
    files = spark.read.format("binaryFile").load(path).select("path")
    n_files = files.count()  # one cheap listing-only job
    # range-partition on path so every file deterministically gets its
    # own task. Plain repartition(n) round-robins from a RANDOM start
    # per input partition, and with the one-row-per-partition listing
    # that large (non-splittable) shards produce, balls-into-bins
    # leaves ~1/e of tasks empty and others with 2-3 shards — straggler
    # wall-clock at the 100k-shard scale this source targets.
    files = files.repartitionByRange(max(n_files, 1), "path")
    names = [f.name for f in WARC_RECORD.fields]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                yield from stream_warc_file_batches(
                    str(p),
                    names,
                    batch_rows,
                    max_records_per_file,
                    batch_bytes,
                    record_types,
                )

    return files.mapInPandas(_parse, WARC_RECORD)


def read_wet(
    spark: SparkSession,
    path: str,
    max_records_per_file: int | None = None,
    batch_rows: int = 2048,
    batch_bytes: int = 32 * 1024 * 1024,
) -> DataFrame:
    """Distributed WET scan (Common Crawl's pre-extracted plain text:
    same ISO 28500 container, but the documents are `conversion`
    records whose block is the text itself, no HTTP envelope). Same
    one-task-per-file streaming plan as read_warc; `status_code` is
    null (WET carries none) and `content_type` comes from the WARC
    header (text/plain). The reference has no WET path — EXTENSION:
    FineWeb-style pipelines start from WET shards, so an engine
    claiming drop-in coverage needs this source."""
    return read_warc(
        spark,
        path,
        max_records_per_file=max_records_per_file,
        batch_rows=batch_rows,
        batch_bytes=batch_bytes,
        record_types=CONVERSION_TYPES,
    )


def write_warc_file(records: list[dict], path: str, gzip_out: bool = False) -> None:
    """Synthesize a tiny WARC file for tests (response + request +
    metadata records). Public WARC/1.0 layout."""
    buf = io.BytesIO()
    for rec in records:
        rec_type = rec.get("rec_type", "response")
        if rec_type == "response":
            http = (
                b"HTTP/1.1 " + rec.get("status", "200 OK").encode() + b"\r\n"
                b"Content-Type: " + rec.get("http_content_type", "text/html").encode() + b"\r\n"
                b"\r\n" + rec["body"]
            )
        else:
            http = rec.get("body", b"")
        warc_ct = rec.get("warc_content_type")  # WET: text/plain at WARC level
        headers = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + rec_type.encode() + b"\r\n"
            b"WARC-Target-URI: " + rec.get("url", "").encode() + b"\r\n"
            b"WARC-Date: " + rec.get("date", "2024-06-12T00:00:00Z").encode() + b"\r\n"
            + (b"Content-Type: " + warc_ct.encode() + b"\r\n" if warc_ct else b"")
            + b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"\r\n"
        )
        buf.write(headers + http + b"\r\n\r\n")
    data = buf.getvalue()
    if gzip_out:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
