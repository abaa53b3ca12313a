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


def test_backfill_is_partition_idempotent(spark, sf_dir):
    out = all_queries()["etl_backfill_partitioned"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupby(ev["ts"].dt.strftime("%Y-%m-%d")).size()
    assert dict(zip(out["day"], out["n_rows"])) == daily.to_dict()
    # a second backfill pass over the staged table finds nothing missing:
    # the partition is the idempotence unit
    import pyspark.sql.functions as F

    path = io_dir(sf_dir, "backfill_days", fresh=False)
    existing = spark.read.parquet(path).select("day").distinct()
    ev_df = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "day", F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    )
    assert ev_df.join(existing, "day", "left_anti").count() == 0


def test_gap_islands_match_python_twin(spark, sf_dir):
    out = all_queries()["win_gap_islands"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    got = {
        (r.user_id, r.streak_start, r.streak_end, r.streak_days)
        for r in out.itertuples()
    }
    expect = set()
    for user, g in ev.groupby("user_id"):
        days = sorted(set(g["ts"].dt.normalize()))
        start = prev = days[0]
        for d in days[1:] + [None]:
            if d is not None and (d - prev).days == 1:
                prev = d
                continue
            expect.add(
                (
                    user,
                    start.strftime("%Y-%m-%d"),
                    prev.strftime("%Y-%m-%d"),
                    (prev - start).days + 1,
                )
            )
            if d is not None:
                start = prev = d
    assert got == expect


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


def test_medallion_layers_published_and_isolated(spark, sf_dir):
    """Both layer roots hold an atomic version after the run, and the gold
    rollup equals a pandas recompute that excludes the planted-corrupt
    keys (bronze corruption never leaks downstream)."""
    import os

    import pandas as pd

    from sdg_data_catalog_spark.queries.registry import all_queries
    from sdg_data_catalog_spark.sources.atomic import latest_version
    from sdg_data_catalog_spark.sources.formats import io_dir

    out = all_queries()["pipeline_medallion"](spark, sf_dir).toPandas()
    for layer in ("medallion_silver", "medallion_gold"):
        root = io_dir(sf_dir, layer, fresh=False)
        assert latest_version(root) is not None, layer
        assert os.path.isfile(os.path.join(root, "LATEST"))
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    clean = docs[docs["doc_id"] % 13 != 0]
    want = (
        clean.groupby(["lang", "source"])
        .agg(n_docs=("doc_id", "size"), total_chars=("n_chars", "sum"))
        .reset_index()
    )
    got = out.sort_values(["lang", "source"]).reset_index(drop=True)
    want = want.sort_values(["lang", "source"]).reset_index(drop=True)
    assert (got["n_docs"] == want["n_docs"]).all()
    assert (got["total_chars"] == want["total_chars"]).all()
