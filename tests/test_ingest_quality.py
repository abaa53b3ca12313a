"""Semantic tests for ingest_quality.py. Oracle parity is covered by
tests/test_contract.py."""

from __future__ import annotations

import hashlib

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.sources.formats import io_dir


def test_dlq_preserves_bad_lines_for_replay(spark, sf_dir):
    out = all_queries()["etl_dlq_routing"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    expect_bad = int((docs["doc_id"] % 13 == 0).sum())
    routed = dict(zip(out["route"], out["n_rows"]))
    assert routed["dlq"] == expect_bad
    assert routed["ok"] == len(docs) - expect_bad
    # the dead letters still carry the ORIGINAL malformed payload: replay
    # is possible (nothing was dropped or mangled)
    parsed = (
        spark.read.schema(
            "doc_id BIGINT, source STRING, n_chars BIGINT, _corrupt_record STRING"
        )
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(io_dir(sf_dir, "dlq_jsonl", fresh=False))
        .cache()
    )
    bad = parsed.filter("_corrupt_record IS NOT NULL").collect()
    assert len(bad) == expect_bad
    assert all(r._corrupt_record.startswith('{"doc_id": ') for r in bad)


def test_negative_pairs_match_hash_twin(spark, sf_dir):
    out = all_queries()["sample_negative_pairs"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    n = len(docs)
    assert (out["anchor_id"] != out["negative_id"]).all()
    assert (out.groupby("anchor_id").size() <= 4).all()
    got = set(zip(out["anchor_id"], out["slot"], out["negative_id"]))
    expect = set()
    for a in docs[docs["doc_id"] % 10 == 0]["doc_id"]:
        for o in range(4):
            neg = int(hashlib.md5(f"{a}#{o}".encode()).hexdigest()[:8], 16) % n
            if neg != a:
                expect.add((a, o, neg))
    assert got == expect
