"""Self-contained WAV (RIFF/WAVE PCM16 mono) encoder/decoder.

The audio rung of the multimodal ladder: images get real PNG/JPEG/WebP
codecs (operators/imagecodec.py, jpegcodec.py, webpcodec.py); audio
payloads get the same treatment — real container bytes built and parsed
in-worker, no external library, deterministic output. The container is
the canonical 44-byte RIFF header + little-endian int16 PCM frames, the
subset every tool (ffmpeg, soundfile, scipy.io.wavfile) emits for plain
mono PCM.

Reference analog: the reference pipeline treats downloaded media as
opaque blobs with validated headers (papers_download.py:136-148); the
engine-side analog is typed decode with exact integer stats.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples -> canonical 44-byte-header RIFF/WAVE bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    data_size = len(pcm)
    hdr = b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH",
        16,  # fmt chunk size
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
    )
    hdr += b"data" + struct.pack("<I", data_size)
    return hdr + pcm


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 mono samples, sample_rate).

    Walks the chunk list (2-byte aligned, like the WebP decoder) so
    containers with extra chunks (LIST/INFO) still parse; raises
    ValueError on non-WAV, truncated, or non-PCM16-mono payloads."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    sample_rate = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > len(data):
            raise ValueError("truncated WAV chunk")
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
            sample_rate = rate
        elif tag == b"data":
            pcm = payload
        pos += 8 + size + (size & 1)
    if sample_rate is None or pcm is None:
        raise ValueError("WAV container missing fmt/data chunk")
    if len(pcm) % 2:
        raise ValueError("odd PCM16 byte length")
    return np.frombuffer(pcm, dtype="<i2"), sample_rate
