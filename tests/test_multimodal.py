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


def test_resize_stub_raises_lazily(spark, sf_dir):
    media = _media(spark, sf_dir).limit(4)
    out = MM.resize_stub(media, 224, 224)  # plan builds fine
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        out.collect()  # codec gap surfaces only at execution
