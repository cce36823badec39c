"""WARC streaming memory-bound evidence (VERDICT r2 item 7).

sources/warc.py claims peak worker memory for a WARC scan is one
record + one Arrow batch, independent of shard size. This script
proves it: synthesize .warc.gz shards at two sizes (default 64 MB and
512 MB uncompressed), stream each through the EXACT production
per-file loop (``stream_warc_file_batches``) in a FRESH python
subprocess, and record the child's peak RSS (``ru_maxrss``). A
streaming reader shows ~flat peak RSS across an 8x file-size spread;
a buffering reader would scale linearly.

Writes BENCH/warc_memory.json. The unit test
(tests/test_warc_media.py::test_warc_streaming_memory_bounded) reuses
``generate_shard`` / ``measure_child`` at smaller sizes so the
assertion exercises the same code path the bench records.
"""

from __future__ import annotations

import gzip
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _body(n: int, kb: int = 48) -> bytes:
    """~kb KB of deterministic pseudorandom hex (sha256 chain seeded by
    the record index). Hex has ~4 bits/char entropy, so gzip only
    halves it — the .gz shard stays a real multi-hundred-MB file
    instead of compressing into nothing, and the decompress+decode work
    per record matches a genuine crawl shard."""
    import hashlib

    h = hashlib.sha256(str(n).encode()).hexdigest()
    parts = []
    for _ in range(kb * 1024 // 64):
        h = hashlib.sha256(h.encode()).hexdigest()
        parts.append(h)
    return f"<!-- doc {n} -->\n".encode() + "".join(parts).encode()


def generate_shard(path: str, target_mb: int) -> int:
    """Incrementally write a gzipped WARC shard of ~target_mb
    UNCOMPRESSED size (constant writer memory). Returns record count."""
    target = target_mb * 1024 * 1024
    written = 0
    n = 0
    with gzip.open(path, "wb", compresslevel=1) as out:
        while written < target:
            body = _body(n)
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
            )
            rec = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Target-URI: https://example.com/doc/{n}\r\n".encode()
                + b"WARC-Date: 2024-06-12T00:00:00Z\r\n"
                + f"Content-Length: {len(http)}\r\n".encode()
                + b"\r\n" + http + b"\r\n\r\n"
            )
            out.write(rec)
            written += len(rec)
            n += 1
    return n


_CHILD_CODE = r"""
import json, resource, sys
sys.path.insert(0, "@@REPO@@")
from fineweb_domain_analyzer_spark.schema import WARC_RECORD
from fineweb_domain_analyzer_spark.sources.warc import stream_warc_file_batches

path = sys.argv[1]
names = [f.name for f in WARC_RECORD.fields]
base_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
rows = batches = 0
if path != "BASELINE":
    for pdf in stream_warc_file_batches(path, names, batch_rows=2048):
        rows += len(pdf)
        batches += 1
peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(json.dumps({"rows": rows, "batches": batches,
                  "baseline_rss_mb": base_kb / 1024,
                  "peak_rss_mb": peak_kb / 1024}))
"""


def measure_child(path: str) -> dict:
    """Stream `path` (or 'BASELINE' = import-only) in a fresh python
    subprocess; return its self-reported rows/batches/peak-RSS."""
    out = subprocess.run(
        [sys.executable, "-c", _CHILD_CODE.replace("@@REPO@@", REPO), path],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sizes_mb = [int(s) for s in (sys.argv[1:] or ["64", "512"])]
    import tempfile

    baseline = measure_child("BASELINE")
    runs = []
    with tempfile.TemporaryDirectory() as td:
        for mb in sizes_mb:
            shard = os.path.join(td, f"shard_{mb}mb.warc.gz")
            n = generate_shard(shard, mb)
            t0 = time.monotonic()
            r = measure_child(shard)
            dt = time.monotonic() - t0
            assert r["rows"] == n, (r, n)
            runs.append({
                "uncompressed_mb": mb,
                "gz_mb": round(os.path.getsize(shard) / 2**20, 1),
                "records": n,
                "batches": r["batches"],
                "peak_rss_mb": round(r["peak_rss_mb"], 1),
                "stream_sec": round(dt, 2),
                "docs_per_sec": round(n / dt, 0),
            })
            print(runs[-1], flush=True)
    small, large = runs[0], runs[-1]
    result = {
        "metric": "warc_stream_peak_rss",
        "baseline_import_only_rss_mb": round(baseline["peak_rss_mb"], 1),
        "runs": runs,
        "rss_growth_mb_across_sizes": round(
            large["peak_rss_mb"] - small["peak_rss_mb"], 1
        ),
        "file_growth_mb": large["uncompressed_mb"] - small["uncompressed_mb"],
        "verdict": (
            "peak RSS is O(batch): grows by "
            f"{large['peak_rss_mb'] - small['peak_rss_mb']:.0f} MB while the "
            f"file grows by {large['uncompressed_mb'] - small['uncompressed_mb']} MB"
        ),
    }
    out_path = os.path.join(REPO, "BENCH", "warc_memory.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
