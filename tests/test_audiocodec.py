"""WAV codec twins: byte-level round-trip, header layout, chunk-walk
robustness, and the closed-form stats identity mm_wav_stats' oracle
relies on."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sdg_data_catalog_spark.operators.audiocodec import wav_decode, wav_encode
from sdg_data_catalog_spark.operators.multimodal import synthetic_samples


def test_roundtrip_bit_exact():
    rng = np.random.default_rng(11)
    for n in (0, 1, 63, 64, 1000):
        s = rng.integers(-(2**15), 2**15, n).astype(np.int16)
        back, rate = wav_decode(wav_encode(s, 8000))
        assert rate == 8000
        assert back.dtype == np.int16 and (back == s).all()


def test_header_is_canonical_44_bytes():
    s = np.array([1, -2, 3], dtype=np.int16)
    data = wav_encode(s)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert data[12:16] == b"fmt " and data[36:40] == b"data"
    assert len(data) == 44 + 6
    assert struct.unpack("<I", data[40:44])[0] == 6  # data size
    # stereo/24-bit/float containers must be rejected, not misread
    bad = bytearray(data)
    bad[22] = 2  # channels = 2
    with pytest.raises(ValueError, match="PCM16 mono"):
        wav_decode(bytes(bad))


def test_chunk_walk_skips_extra_chunks():
    """Real-world WAVs carry LIST/INFO chunks between fmt and data — the
    parser must walk, not assume the 44-byte layout."""
    s = np.arange(-5, 5, dtype=np.int16)
    data = wav_encode(s)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # 2-byte pad
    spliced = data[:36] + extra + data[36:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, rate = wav_decode(spliced)
    assert (back == s).all() and rate == 16_000


def test_truncation_and_garbage_raise_value_error():
    s = np.arange(8, dtype=np.int16)
    data = wav_encode(s)
    with pytest.raises(ValueError):
        wav_decode(data[:-3])  # truncated data chunk
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxWAVE")  # no fmt/data
    with pytest.raises(ValueError):
        wav_decode(b"\x89PNG1234....")  # not RIFF at all


def test_synthetic_samples_match_oracle_closed_form():
    """The identity mm_wav_stats' DuckDB oracle assumes: for every doc_id,
    the encode→decode→stats pipeline equals the closed-form integer
    formula (n = 64 + id%64, s_i = (id*7 + i*13) % 251 - 125)."""
    for did in (0, 1, 63, 64, 499, 12345):
        s = synthetic_samples(did)
        n = 64 + did % 64
        i = np.arange(n)
        expect = (did * 7 + i * 13) % 251 - 125
        assert len(s) == n and (s == expect).all()
        back, _ = wav_decode(wav_encode(s))
        s64 = back.astype(np.int64)
        assert int((s64 * s64).sum()) == int((expect * expect).sum())
        assert int(np.abs(s64).max()) == int(np.abs(expect).max())
