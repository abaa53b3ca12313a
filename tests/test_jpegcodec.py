"""Self-contained baseline JPEG codec: round-trip error bounds across
quality/subsampling/restart options, marker-level rejection of unsupported
processes, codec-ladder integration, and the registered `mm_resize_jpeg`
query against a local byte-exact twin."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import imagecodec, jpegcodec as jc
from sdg_data_catalog_spark.operators import multimodal as MM
from sdg_data_catalog_spark.operators.multimodal import synthetic_image
from sdg_data_catalog_spark.queries.registry import all_queries


def _err(a, b):
    return np.abs(a.astype(int) - b.astype(int)).mean()


@pytest.mark.parametrize("side", [8, 24, 37, 64])
def test_rgb_roundtrip_error_bounded(side):
    img = synthetic_image(side * 3 + 1, side)
    dec = jc.jpeg_decode(jc.jpeg_encode(img, quality=90))
    assert dec.shape == img.shape
    # q90 gradient: measured ~1.6-3.3 at side>=24; ~5.1 at side=8 where the
    # mod-256 wrap makes one pixel-wide edges (JPEG's worst input)
    assert _err(dec, img) < 8.0


@pytest.mark.parametrize(
    "opts",
    [
        {"subsampling": "420"},
        {"restart_interval": 2},
        {"subsampling": "420", "restart_interval": 3},
    ],
)
def test_roundtrip_options(opts):
    img = synthetic_image(11, 48)
    dec = jc.jpeg_decode(jc.jpeg_encode(img, quality=90, **opts))
    assert dec.shape == img.shape
    # 4:2:0 averages chroma 2x2 -> higher but still-bounded error
    assert _err(dec, img) < 12.0


def test_restart_decode_identical_to_unrestarted():
    """RSTn markers change the byte stream but must not change pixels."""
    img = synthetic_image(5, 32)
    plain = jc.jpeg_decode(jc.jpeg_encode(img, 85))
    rst = jc.jpeg_decode(jc.jpeg_encode(img, 85, restart_interval=1))
    assert np.array_equal(plain, rst)


def test_grey_roundtrip():
    g = synthetic_image(3, 40)[:, :, 0]
    dg = jc.jpeg_decode(jc.jpeg_encode(g, 85))
    assert dg.shape == g.shape and dg.ndim == 2
    assert _err(dg, g) < 2.0


def test_quality_tradeoff_monotone():
    """Higher quality -> more bytes and less error (the defining knob)."""
    img = synthetic_image(9, 64)
    sizes, errs = [], []
    for q in (10, 50, 95):
        data = jc.jpeg_encode(img, q)
        sizes.append(len(data))
        errs.append(_err(jc.jpeg_decode(data), img))
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[1] > errs[2]


def test_encode_deterministic():
    img = synthetic_image(21, 24)
    assert jc.jpeg_encode(img, 90) == jc.jpeg_encode(img, 90)


def test_decode_rejects_arithmetic_and_garbage():
    with pytest.raises(ValueError, match="SOI"):
        jc.jpeg_decode(b"\x00\x01\x02")
    data = jc.jpeg_encode(synthetic_image(1, 16), 90)
    # flip SOF0 -> SOF9 (arithmetic-coded sequential); marker bytes can't
    # occur in the entropy segment (0xFF is stuffed) and q90 quant values
    # stay < 0xC0
    assert data.count(b"\xff\xc0") == 1
    with pytest.raises(ValueError, match="Huffman"):
        jc.jpeg_decode(data.replace(b"\xff\xc0", b"\xff\xc9"))


@pytest.mark.parametrize(
    "shape", [(16, 16), (24, 40, 3), (13, 17, 3), (8, 8), (64, 64, 3)]
)
def test_progressive_decodes_identical_to_baseline(shape):
    """The progressive encoding quantizes to the SAME coefficients as the
    baseline encoding, so both streams must reconstruct IDENTICAL pixels —
    an exact differential between two completely different entropy paths
    (interleaved sequential vs spectral-selection + successive
    approximation with EOB runs and refinement bits)."""
    rng = np.random.default_rng(hash(shape) % 2**31)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    img = (img.astype(np.int32) // 2 + 64).astype(np.uint8)  # tame sizes
    prog_bytes = jc.jpeg_encode_progressive(img, quality=85)
    assert b"\xff\xc2" in prog_bytes[:256]  # SOF2 frame header
    base = jc.jpeg_decode(jc.jpeg_encode(img, quality=85))
    prog = jc.jpeg_decode(prog_bytes)
    assert base.shape == prog.shape
    assert np.array_equal(base, prog)


def test_progressive_synthetic_image_roundtrip():
    """End-to-end on the repo's synthetic corpus image + codec-ladder
    integration: a progressive payload resizes through _resize_payload
    without Pillow (the branch is no longer environment-dependent)."""
    img = synthetic_image(42, 24)
    prog_bytes = jc.jpeg_encode_progressive(img, quality=90)
    assert _err(jc.jpeg_decode(prog_bytes), img) < 4.0
    png = MM._resize_payload(prog_bytes, 16, 16)
    expect = imagecodec.png_encode(
        imagecodec.resize_nearest(jc.jpeg_decode(prog_bytes), 16, 16)
    )
    assert png == expect


def test_noise_roundtrip_high_quality():
    """Uniform noise is JPEG's worst case; q95 must still stay bounded."""
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    dec = jc.jpeg_decode(jc.jpeg_encode(noise, 95))
    assert _err(dec, noise) < 8.0


def test_pillow_interop_if_available():
    """When a cluster image ships Pillow: our bytes decode there, their
    bytes decode here, pixels agree within quantization error."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = synthetic_image(13, 48)
    ours = jc.jpeg_encode(img, 90)
    theirs_arr = np.asarray(PIL.open(io.BytesIO(ours)).convert("RGB"))
    assert _err(theirs_arr, img) < 5.0
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="JPEG", quality=90)
    assert _err(jc.jpeg_decode(buf.getvalue()), img) < 5.0


def test_resize_payload_ladder_handles_jpeg():
    """_resize_payload: JPEG in -> deterministic PNG out, no Pillow."""
    img = synthetic_image(4, 32)
    payload = jc.jpeg_encode(img, 90)
    out = MM._resize_payload(payload, 16, 16)
    arr = imagecodec.png_decode(out)
    assert arr.shape == (16, 16, 3)
    expected = imagecodec.resize_nearest(jc.jpeg_decode(payload), 16, 16)
    assert np.array_equal(arr, expected)


def _expected_resized_sha(doc_id: int) -> tuple[int, str]:
    sub = "420" if doc_id % 2 else "444"
    payload = jc.jpeg_encode(synthetic_image(doc_id, 24), 90, sub)
    png = imagecodec.png_encode(
        imagecodec.resize_nearest(jc.jpeg_decode(payload), 16, 16)
    )
    return len(png), hashlib.sha256(png).hexdigest()


def test_mm_resize_jpeg_query_matches_local_twin(spark, sf_dir):
    rows = all_queries()["mm_resize_jpeg"](spark, sf_dir).collect()
    assert rows
    docs = {r.doc_id for r in table(spark, sf_dir, "documents").limit(100).collect()}
    assert {r.media_id for r in rows} == docs
    for r in rows[:25]:
        n_bytes, sha = _expected_resized_sha(r.media_id)
        assert (r.width, r.height) == (16, 16)
        assert r.n_bytes == n_bytes
        assert r.sha == sha
