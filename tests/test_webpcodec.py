"""WebP lossless (VP8L) codec tests: self-roundtrip, bit-exact
differential against the system libwebp (both directions), and the
multimodal resize-ladder integration.

The libwebp differential is the conformance anchor: the container ships
libwebp.so.7 (no Python bindings), so the real encoder is driven via
ctypes. libwebp's lossless encoder uses the full feature surface —
palette + sub-byte bundling, predictor/cross-color/subtract-green
transforms, color cache, LZ77, meta prefix images — so decoding its
output exercises every branch of the decoder. Tests are skipped cleanly
if the shared library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from sdg_data_catalog_spark.operators import webpcodec as W


def _libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        return lib
    return None


LIBWEBP = _libwebp()


def _rgba(img: np.ndarray) -> np.ndarray:
    if img.shape[2] == 4:
        return img
    h, w = img.shape[:2]
    return np.dstack([img, np.full((h, w), 255, np.uint8)])


def _lib_encode(img: np.ndarray) -> bytes:
    rgba = np.ascontiguousarray(_rgba(img))
    h, w = rgba.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = LIBWEBP.WebPEncodeLosslessRGBA(
        rgba.tobytes(), w, h, w * 4, ctypes.byref(out)
    )
    assert size > 0
    return ctypes.string_at(out, size)


def _lib_decode(data: bytes) -> np.ndarray | None:
    wi, hi = ctypes.c_int(), ctypes.c_int()
    dec = LIBWEBP.WebPDecodeRGBA(data, len(data), ctypes.byref(wi), ctypes.byref(hi))
    if not dec:
        return None
    return np.ctypeslib.as_array(dec, shape=(hi.value, wi.value, 4)).copy()


def _cases() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(20260815)
    h, w = 48, 80
    base = (np.arange(w)[None, :] * 3 + np.arange(h)[:, None] * 5) % 256
    structured = np.stack(
        [base, (base * 2) % 256, (255 - base) % 256, np.full((h, w), 255)],
        axis=-1,
    ).astype(np.uint8)
    structured[10:20, 10:30] = [255, 0, 0, 255]
    structured[30:40, 40:60] = rng.integers(0, 256, (10, 20, 4), dtype=np.uint8)
    noise = {}
    for n in (1, 2, 7, 16, 33, 64):
        im = rng.integers(0, 256, (n, n, 4), dtype=np.uint8)
        im[..., 3] = 255
        noise[f"noise{n}"] = im
    pal = np.zeros((40, 40, 4), np.uint8)
    pal[..., 0] = (np.arange(1600) % 7).reshape(40, 40) * 30
    pal[..., 3] = 255
    return {
        "structured": structured,
        **noise,
        "grad": np.stack(
            [np.tile(np.arange(64), (64, 1))] * 3 + [np.full((64, 64), 255)],
            axis=-1,
        ).astype(np.uint8),
        "const": np.full((32, 32, 4), [10, 20, 30, 255], dtype=np.uint8),
        "palette7": pal,
    }


def test_roundtrip_self():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 3), (3, 5, 3), (16, 16, 4), (33, 7, 4), (64, 64, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = W.webp_decode(W.webp_encode(img))
        assert (out == _rgba(img)).all(), shape


def test_rejects_non_webp():
    with pytest.raises(ValueError):
        W.webp_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError):
        W.vp8l_decode(b"\x00" * 8)


@pytest.mark.skipif(LIBWEBP is None, reason="libwebp shared library absent")
def test_decode_matches_libwebp_bit_exact():
    """Decode libwebp-encoded streams and require equality with libwebp's
    OWN decode (not the pre-encode image: libwebp's default lossless
    encoder squashes RGB under fully-transparent pixels, which is an
    encoder choice, not a decoder property)."""
    for name, img in _cases().items():
        data = _lib_encode(img)
        assert (W.webp_decode(data) == _lib_decode(data)).all(), name


@pytest.mark.skipif(LIBWEBP is None, reason="libwebp shared library absent")
def test_libwebp_accepts_my_encoder():
    for name, img in _cases().items():
        my = W.webp_encode(img)
        back = _lib_decode(my)
        assert back is not None, f"libwebp rejected stream for {name}"
        assert (back == _rgba(img)).all(), name


@pytest.mark.skipif(LIBWEBP is None, reason="libwebp shared library absent")
def test_decode_matches_libwebp_random_alpha():
    rng = np.random.default_rng(99)
    img = rng.integers(0, 256, (24, 24, 4), dtype=np.uint8)
    data = _lib_encode(img)
    assert (W.webp_decode(data) == _lib_decode(data)).all()


def test_resize_ladder_handles_vp8l_payload():
    from sdg_data_catalog_spark.operators import imagecodec
    from sdg_data_catalog_spark.operators.multimodal import _resize_payload

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (12, 18, 3), dtype=np.uint8)
    payload = W.webp_encode(img)
    png = _resize_payload(payload, 9, 6)
    arr = imagecodec.png_decode(png)
    assert arr.shape == (6, 9, 4)
    expected = imagecodec.resize_nearest(_rgba(img), 9, 6)
    assert (arr == expected).all()


def test_limited_lengths_kraft_exact_on_skewed_freqs():
    """ADVICE r9: clamp-then-deepen could overshoot and leave an
    incomplete prefix code (kraft < 2^max_len), which strict decoders
    such as libwebp's BuildHuffmanTable reject. The repair must land on
    kraft == 2^max_len exactly, for any frequency profile."""
    import random

    rng = random.Random(7)
    for trial in range(120):
        n = rng.choice([4, 40, 256, 280])
        freqs = [
            rng.choice([0, 1, 1, 2, 3, 2 ** rng.randint(0, 20)]) for _ in range(n)
        ]
        if sum(1 for f in freqs if f) < 2:
            continue
        lengths = W._limited_lengths(freqs, 15)
        syms = [s for s, f in enumerate(freqs) if f > 0]
        assert all(1 <= lengths[s] <= 15 for s in syms), trial
        assert sum(1 << (15 - lengths[s]) for s in syms) == 1 << 15, trial
    # geometric skew = the depth>15 clamp reproducer class
    freqs = [2**i for i in range(30)]
    lengths = W._limited_lengths(freqs, 15)
    assert sum(1 << (15 - l) for l in lengths if l) == 1 << 15


def test_decode_rejects_truncated_chunk():
    """ADVICE r9: a size-corrupted container must raise the codec's
    documented ValueError, not IndexError from deep inside BitReader."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = bytearray(W.webp_encode(img))
    # corrupt the VP8L chunk size upward so the payload overruns the buffer
    pos = data.index(b"VP8L")
    data[pos + 4 : pos + 8] = (2**24).to_bytes(4, "little")
    with pytest.raises(ValueError, match="truncated WebP chunk"):
        W.webp_decode(bytes(data))
    # plain truncation of the container body
    with pytest.raises(ValueError):
        W.webp_decode(bytes(W.webp_encode(img))[:-5])
