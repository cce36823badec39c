"""Tests for the WAV/PCM decoder (sources/audio.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fineweb_domain_analyzer_spark.sources.audio import (
    N_AUDIO_ASSETS,
    _audio_samples,
    _audio_spec,
    audio_stats,
    decode_wav,
    encode_wav,
    synth_audio_assets,
)


def test_round_trip_all_specs():
    for i in range(N_AUDIO_ASSETS):
        nf, nc, rate, bits = _audio_spec(i)
        s = _audio_samples(i, nf, nc, bits)
        got_rate, got = decode_wav(encode_wav(s, rate, bits))
        assert got_rate == rate
        assert np.array_equal(got, s), f"asset {i}"


def test_stereo_deinterleave():
    # channel identity must survive interleaving: ch0 ascending,
    # ch1 descending — a swapped/misaligned de-interleave breaks this
    nf = 50
    s = np.stack([np.arange(nf), -np.arange(nf)], axis=1).astype(np.int32)
    _, got = decode_wav(encode_wav(s, 16000, 16))
    assert np.array_equal(got[:, 0], np.arange(nf))
    assert np.array_equal(got[:, 1], -np.arange(nf))


def test_24bit_pcm_full_range():
    rng = np.random.RandomState(2)
    s = rng.randint(-(1 << 23), 1 << 23, size=(200, 2)).astype(np.int32)
    rate, got = decode_wav(encode_wav(s, 44100, 24))
    assert rate == 44100 and np.array_equal(got, s)
    edge = np.array([[-(1 << 23)], [0], [(1 << 23) - 1]], dtype=np.int32)
    _, got = decode_wav(encode_wav(edge, 8000, 24))
    assert np.array_equal(got, edge)


def test_float32_wav_exact_for_16bit_magnitudes():
    # s/32768 is exactly representable in float32 for |s| < 2^15, so
    # the float path round-trips bit-exactly
    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32768, size=(150, 1)).astype(np.int32)
    rate, got = decode_wav(encode_wav(s, 22050, float32=True))
    assert rate == 22050 and np.array_equal(got, s)


def test_8bit_centering():
    # 8-bit PCM is unsigned on the wire; decode centers it to -128..127
    s = np.array([[-128], [0], [127]], dtype=np.int32)
    _, got = decode_wav(encode_wav(s, 8000, 8))
    assert np.array_equal(got, s)


def test_junk_chunk_tolerated():
    # encode_wav injects an odd-length LIST chunk before fmt; also add
    # a trailing chunk after data to confirm the walk stops cleanly
    payload = encode_wav(np.ones((10, 1), dtype=np.int32), 8000, 16)
    payload += b"cue " + struct.pack("<I", 4) + b"\x00" * 4
    rate, got = decode_wav(payload)
    assert rate == 8000 and got.shape == (10, 1)


def test_rejects_non_pcm_and_truncation():
    payload = bytearray(encode_wav(np.ones((10, 2), dtype=np.int32), 8000, 16))
    fmt_at = bytes(payload).index(b"fmt ") + 8
    struct.pack_into("<H", payload, fmt_at, 85)  # unknown format code
    with pytest.raises(ValueError, match="format code"):
        decode_wav(bytes(payload))
    struct.pack_into("<H", payload, fmt_at, 3)  # float code w/ 16-bit depth
    with pytest.raises(ValueError, match="float WAV bit depth"):
        decode_wav(bytes(payload))
    good = encode_wav(np.ones((10, 2), dtype=np.int32), 8000, 16)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-5])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_closed_form_matches_q77_oracle_identity():
    i = 9
    nf, nc, rate, bits = _audio_spec(i)
    s = _audio_samples(i, nf, nc, bits)
    m = 256 if bits == 8 else 65536
    expect = sum(
        (13 * t + 29 * c + 31 * i) % m - m // 2
        for t in range(nf)
        for c in range(nc)
    )
    assert int(s.sum()) == expect


def test_audio_stats_operator(spark):
    out = {
        r["asset_id"]: r.asDict()
        for r in audio_stats(synth_audio_assets(spark, n=8)).collect()
    }
    assert len(out) == 8
    for i in range(8):
        nf, nc, rate, bits = _audio_spec(i)
        s = _audio_samples(i, nf, nc, bits)
        r = out[i]
        assert (r["sample_rate"], r["n_frames"], r["n_channels"]) == (rate, nf, nc)
        assert r["sum_samples"] == int(s.sum(dtype=np.int64))
        assert r["sum_abs"] == int(np.abs(s).sum(dtype=np.int64))
