"""Minimal self-contained PNG codec + nearest-neighbor resize.

The container ships no image libraries (no PIL/Pillow, no OpenCV), but PNG
itself only needs stdlib ``zlib`` + ``struct``: this module implements
encode/decode for 8-bit RGB/RGBA/greyscale non-interlaced PNGs — enough to
make the multimodal resize operator REAL end-to-end on synthetic images
instead of a NotImplementedError stub. ``operators.multimodal.resize_media``
tries Pillow first at runtime (the production path on a cluster image that
ships codecs) and falls back to this decoder for PNG payloads.

Scope (documented, asserted): bit depth 8, color types 0 (grey), 2 (RGB),
6 (RGBA); no interlace, no palette, no ancillary-chunk interpretation.
Filters 0-4 are fully implemented on both encode (filter 0 only) and decode
(all five, required for spec-conformant reading).

Reference analog: none — the reference's only binary handling is the gzip'd
PDF sink (scrapping/papers_download.py:136-150); this is north-star
"multimodal columns" surface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode an (H, W), (H, W, 3) or (H, W, 4) uint8 array as PNG
    (filter 0 rows, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, channels = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 per row, rows concatenated
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * channels)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG row filters (types 0-4) in place; returns (h, stride)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, stride + 1)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            line = cur
        elif ftype == 2:  # Up
            line = (cur + prior) & 0xFF
        else:  # Sub / Average / Paeth need a sequential scan over the row
            line = np.zeros(stride, np.int32)
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0  # left
                b = prior[x]  # up
                c = prior[x - bpp] if x >= bpp else 0  # up-left
                if ftype == 1:  # Sub
                    rec = cur[x] + a
                elif ftype == 3:  # Average
                    rec = cur[x] + ((a + b) >> 1)
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec = cur[x] + pred
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                line[x] = rec & 0xFF
        out[y] = line.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit grey/RGB/RGBA non-interlaced PNG to a uint8 array
    of shape (H, W[, C])."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace}); this codec reads 8-bit "
                    "grey/RGB/RGBA non-interlaced only"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = _CHANNELS[color]
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG data size mismatch")
    out = _unfilter(raw, h, stride, channels)
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, channels)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize to (height, width) — deterministic, matches
    the standard floor(dst_idx * src/dst) sampling grid."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h // height), h - 1)
    xs = np.minimum((np.arange(width) * w // width), w - 1)
    return arr[ys][:, xs]
