"""Round-11 batch 1: census-promotion twins.

The main job here is the CONSTANT PIN: the hardcoded expected tables in
queries/round11_batch1.py (resized-payload size + sha per image key) must
equal a fresh regeneration from the live codecs — codec drift fails here
instead of silently desyncing the DuckDB oracle. Plus oracle-equivalence
runs of all three censuses at sf0.001.
"""

from __future__ import annotations

import hashlib

import duckdb

from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries
from sdg_data_catalog_spark.queries.round11_batch1 import (
    _RESIZE_JPEG_CONSTANTS,
    _RESIZE_PNG_CONSTANTS,
)

SF = "/root/testdata/sf0.001"


def _parse_constants(chunks: tuple[str, ...]) -> dict[int, tuple[int, str]]:
    rows = eval("[" + "".join(chunks).rstrip(",") + "]")  # noqa: S307 - literal tuples
    return {k: (n, sha) for k, n, sha in rows}


def _regen(fmt: str) -> dict[int, tuple[int, str]]:
    from sdg_data_catalog_spark.operators.imagecodec import png_encode
    from sdg_data_catalog_spark.operators.jpegcodec import jpeg_encode
    from sdg_data_catalog_spark.operators.multimodal import (
        _resize_payload,
        synthetic_image,
    )

    out = {}
    for k in range(64):
        img = synthetic_image(k, 24)
        if fmt == "png":
            payload = png_encode(img)
        else:
            payload = jpeg_encode(img, 90, "420" if k % 2 else "444")
        resized = _resize_payload(payload, 16, 16)
        out[k] = (len(resized), hashlib.sha256(resized).hexdigest())
    return out


def test_png_constants_pin_live_codec():
    assert _parse_constants(_RESIZE_PNG_CONSTANTS) == _regen("png")


def test_jpeg_constants_pin_live_codec():
    assert _parse_constants(_RESIZE_JPEG_CONSTANTS) == _regen("jpeg")


def _oracle_rows(name: str):
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    rows = con.execute(all_oracles()[name]).fetchall()
    con.close()
    return rows


def _spark_rows(spark, name: str):
    return [tuple(r) for r in all_queries()[name](spark, SF).collect()]


def _assert_match(spark, name: str, key_cols: int = 1):
    got = sorted(_spark_rows(spark, name))
    want = sorted(tuple(r) for r in _oracle_rows(name))
    assert len(got) == len(want) and got[:3] == want[:3] and got == want, name


def test_mm_resize_census_matches_oracle(spark):
    _assert_match(spark, "mm_resize_census")


def test_mm_resize_jpeg_census_matches_oracle(spark):
    _assert_match(spark, "mm_resize_jpeg_census")


def test_text_compression_census_matches_oracle(spark):
    _assert_match(spark, "text_compression_census")


def test_jpeg_census_covers_both_subsampling_paths(spark):
    # doc_id % 3 == 0 under key = doc_id % 64 must include odd keys (4:2:0)
    # and even keys (4:4:4) — gcd(3, 64) = 1 guarantees full residue
    # coverage as the corpus grows; even sf0.001's 500 docs hit both.
    keys = {
        r.media_id % 64
        for r in all_queries()["mm_resize_jpeg_census"](spark, SF).collect()
    }
    assert any(k % 2 for k in keys) and any(not k % 2 for k in keys)
