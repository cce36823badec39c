#!/usr/bin/env python
"""Multimodal-decode scaling evidence: pixel_stats + audio_stats over a
distributed corpus of real encoded payloads at local[8] vs local[32].

The decode operators are map-only mapInPandas with no shuffle, so their
scaling ceiling is the Python-worker pool; this bench verifies that the
multimodal path (not just the text pipeline) holds the north rule's
efficiency target. Payloads are generated ONCE, distributed (encode
runs inside mapInPandas too), and cached to parquet; both parallelism
levels then time decode-only jobs over the identical bytes, fresh JVM
per level, interleaved A/B/A/B visits with best-per-level (host drift
cancels instead of loading onto the cores axis).

Usage: python scripts/media_bench.py   # writes BENCH/media_bench.json
Env: FW_MEDIA_ASSETS (default 24000), FW_MEDIA_AUDIO (default 8000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["FW_REPO"])
import numpy as np
import pandas as pd
from fineweb_domain_analyzer_spark.session import get_spark

cores = int(os.environ["FW_CORES"])
n_img = int(os.environ["FW_N_IMG"])
n_wav = int(os.environ["FW_N_WAV"])
img_cache = os.environ["FW_IMG_CACHE"]
wav_cache = os.environ["FW_WAV_CACHE"]
spark = get_spark(
    app_name=f"fw-media-{cores}",
    master=f"local[{cores}]",
    extra_confs={
        "spark.sql.shuffle.partitions": str(cores * 2),
        # the synthetic assets are a few KB each (formula pixels
        # compress hard): default 128MB splits would give ~5 scan tasks
        # and starve both levels, and even ~40 tasks caps the 32-core
        # level at 2 waves (one near-empty) — wave quantization, not
        # decode throughput. ~160+ tasks gives both levels full waves;
        # a real media table has MB-scale payloads and does not need this
        "spark.sql.files.maxPartitionBytes": str(128 * 1024),
        "spark.sql.files.openCostInBytes": str(4 * 1024),
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    },
)

def gen_images(batches):
    # distributed encode: one realistic 64x48 image per id, format mix
    from fineweb_domain_analyzer_spark.sources import pixels as px
    from fineweb_domain_analyzer_spark.sources.jpeg_codec import encode_jpeg
    for pdf in batches:
        out_ids, out_payloads = [], []
        for i in pdf["asset_id"]:
            i = int(i)
            w, h = 64, 48
            grid = px._asset_pixels(i, w, h)
            m = i % 5
            if m == 0:
                p = px.encode_png(grid)
            elif m == 1:
                p = px.encode_bmp(grid)
            elif m == 2:
                p = px.encode_ppm(grid)
            elif m == 3:
                p = px.encode_gif(px._gif_index_grid(i, w, h), px.gif_palette())
            else:
                p = encode_jpeg(px._jpeg_block_grid(i, w, h), quant=np.ones((8, 8)))
            out_ids.append(i)
            out_payloads.append(p)
        yield pd.DataFrame({"asset_id": out_ids, "payload": out_payloads})

def gen_wavs(batches):
    from fineweb_domain_analyzer_spark.sources import audio as au
    for pdf in batches:
        out_ids, out_payloads = [], []
        for i in pdf["asset_id"]:
            i = int(i)
            s = au._audio_samples(i, 2000, 2, 16)  # 2k stereo frames
            out_ids.append(i)
            out_payloads.append(au.encode_wav(s, 16000, 16))
        yield pd.DataFrame({"asset_id": out_ids, "payload": out_payloads})

schema = "asset_id long, payload binary"
for cache, n, gen in ((img_cache, n_img, gen_images), (wav_cache, n_wav, gen_wavs)):
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        ids = spark.range(n).toDF("asset_id").repartition(128)
        ids.mapInPandas(gen, schema).write.mode("overwrite").parquet(cache)

from fineweb_domain_analyzer_spark.sources.pixels import pixel_stats
from fineweb_domain_analyzer_spark.sources.audio import audio_stats

imgs = spark.read.parquet(img_cache)
wavs = spark.read.parquet(wav_cache)
# warm-up (codegen + Python worker spawn), then best-of-2
pixel_stats(imgs).count(); audio_stats(wavs).count()
best = float("inf")
for _ in range(2):
    t0 = time.time()
    n1 = pixel_stats(imgs).count()
    n2 = audio_stats(wavs).count()
    best = min(best, time.time() - t0)
assets = n1 + n2
print(json.dumps({"cores": cores, "sec": round(best, 3), "assets": assets,
                  "assets_per_sec": round(assets / best, 1)}))
spark.stop()
"""


def run_level(cores: int, env_extra: dict) -> dict:
    env = dict(os.environ, FW_REPO=str(REPO), FW_CORES=str(cores), **env_extra)
    out = subprocess.run(
        [sys.executable, "-c", RUNNER], env=env,
        capture_output=True, text=True, timeout=1800,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"runner failed (cores={cores}):\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n_img = int(os.environ.get("FW_MEDIA_ASSETS", "96000"))
    n_wav = int(os.environ.get("FW_MEDIA_AUDIO", "32000"))
    extra = {
        "FW_N_IMG": str(n_img),
        "FW_N_WAV": str(n_wav),
        "FW_IMG_CACHE": f"/tmp/fw_media_img_{n_img}",
        "FW_WAV_CACHE": f"/tmp/fw_media_wav_{n_wav}",
    }
    c_n = int(os.environ.get("FW_MEDIA_N_CORES", "8"))
    c_4n = c_n * 4
    n = run_level(c_n, extra)
    n4 = run_level(c_4n, extra)
    n_b = run_level(c_n, extra)
    n4_b = run_level(c_4n, extra)
    if n_b["assets_per_sec"] > n["assets_per_sec"]:
        n = n_b
    if n4_b["assets_per_sec"] > n4["assets_per_sec"]:
        n4 = n4_b
    eff = round(n4["assets_per_sec"] / (4 * n["assets_per_sec"]), 3)
    result = {
        "question": "does the multimodal decode path scale like the text pipeline?",
        "method": (
            "pixel_stats over mixed PNG/BMP/PPM/GIF/JPEG 64x48 payloads + "
            "audio_stats over 2k-frame stereo WAVs, distributed-encoded once "
            "and cached to parquet; decode-only timed at local[8] vs "
            "local[32] (128KB scan splits so both levels get many task waves: the few-KB synthetic assets would otherwise coalesce into so few tasks that the 32-core level runs one full wave plus a near-empty one, capping speedup at wave quantization rather than decode throughput), fresh JVM per level, interleaved A/B/A/B visits, "
            "best-of-2 per visit after warm-up"
        ),
        "n_images": n_img,
        "n_wavs": n_wav,
        "N": n,
        "4N": n4,
        "efficiency": eff,
    }
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "media_bench.json").write_text(
        json.dumps(result, indent=2) + "\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
