"""Semantic tests for sources_extra.py (binary-file ingestion + snapshot
diff). Oracle parity is covered by tests/test_contract.py."""

from __future__ import annotations

import glob
import hashlib

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.sources.formats import io_dir


def test_binaryfile_roundtrip_and_pruning(spark, sf_dir):
    out = all_queries()["scan_binaryfile"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    sampled = docs[docs["doc_id"] % 50 == 0]
    assert len(out) == len(sampled)
    # byte-exact round-trip: sha of the on-disk file == sha of the source text
    by_name = dict(zip(out["fname"], out["sha"]))
    staged = sorted(glob.glob(io_dir(sf_dir, "binfiles", fresh=False) + "/*.bin"))
    assert len(staged) == len(sampled)
    for path in staged[:5]:
        payload = open(path, "rb").read()
        name = path.rsplit("/", 1)[-1]
        assert by_name[name] == hashlib.sha256(payload).hexdigest()
    # metadata-only projection prunes the content column out of the scan
    meta_only = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(io_dir(sf_dir, "binfiles", fresh=False))
        .select("path", "length")
    )
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan.split("ReadSchema")[-1]


def test_stream_datasource_replay_is_deterministic(spark, sf_dir):
    """The streaming Python DataSource's replay contract:
    readBetweenOffsets over any committed range reproduces exactly the
    rows the original micro-batches emitted (exactly-once on retry)."""
    from sdg_data_catalog_spark.sources.datasource_api import (
        make_papers_stream_source,
    )

    _, reader_cls = make_papers_stream_source()
    r = reader_cls({"pages": "5", "page_size": "100"})
    off = r.initialOffset()
    emitted = []
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if not rows and nxt == off:
            break
        emitted.extend(rows)
        off = nxt
    assert len(emitted) == 500
    replay = list(r.readBetweenOffsets({"page": 0}, {"page": 5}))
    assert replay == emitted
    # partial-range replay matches the matching slice
    assert list(r.readBetweenOffsets({"page": 2}, {"page": 4})) == emitted[200:400]


def test_diff_versions_matches_pandas_twin(spark, sf_dir):
    out = all_queries()["catalog_diff_versions"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    v0 = docs[docs["doc_id"] % 2 == 0][["doc_id", "n_chars"]]
    v1 = docs[docs["doc_id"] % 3 != 0][["doc_id", "n_chars"]].copy()
    v1.loc[v1["doc_id"] % 10 == 0, "n_chars"] += 1
    k0, k1 = set(v0["doc_id"]), set(v1["doc_id"])
    expect = {
        "added": len(k1 - k0),
        "removed": len(k0 - k1),
    }
    both = v0.merge(v1, on="doc_id", suffixes=("_0", "_1"))
    expect["changed"] = int((both["n_chars_0"] != both["n_chars_1"]).sum())
    expect["unchanged"] = len(both) - expect["changed"]
    got = dict(zip(out["status"], out["n_rows"]))
    assert got == {k: v for k, v in expect.items() if v > 0}


def test_table_changes_replay_contract(spark, sf_dir, tmp_path):
    """The CDF reader's readBetweenOffsets must replay EXACTLY what the
    incremental read() path emitted, for the full range and any split of
    it — the retried-micro-batch contract."""
    import pyspark.sql.functions as F

    from sdg_data_catalog_spark.catalog import table
    from sdg_data_catalog_spark.sources.atomic import publish
    from sdg_data_catalog_spark.sources.datasource_api import (
        make_table_changes_stream_source,
    )

    root = str(tmp_path / "cdf")
    docs = table(spark, sf_dir, "documents")
    publish(docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars"), root, 0, keep=10)
    publish(docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "n_chars"), root, 1, keep=10)
    publish(docs.filter(F.col("doc_id") % 4 == 0).select("doc_id", "n_chars"), root, 2, keep=10)

    _, reader_cls = make_table_changes_stream_source()
    r = reader_cls({"root": root, "max_version": "2"})
    off = r.initialOffset()
    incremental = []
    for _ in range(3):
        it, off2 = r.read(off)
        incremental.extend(it)
        if off2 == off:
            break
        off = off2
    assert off == {"v": 3}
    full = list(r.readBetweenOffsets({"v": 1}, {"v": 3}))
    assert incremental == full
    split = list(r.readBetweenOffsets({"v": 1}, {"v": 2})) + list(
        r.readBetweenOffsets({"v": 2}, {"v": 3})
    )
    assert incremental == split
    # parked offset emits nothing
    it, same = r.read({"v": 3})
    assert list(it) == [] and same == {"v": 3}


def test_jsonl_sink_abort_leaves_no_output(spark, sf_dir, tmp_path):
    """Two-phase commit: a job that fails mid-write must leave NO
    committed shards and NO _SUCCESS manifest — readers of the target
    directory see nothing."""
    import os

    import pyspark.sql.functions as F
    import pytest

    from sdg_data_catalog_spark.sources.datasource_api import (
        register_jsonl_sink_source,
    )

    register_jsonl_sink_source(spark)
    path = str(tmp_path / "sink_abort")

    @F.udf("long")
    def boom(x):
        raise RuntimeError("planted task failure")

    bad = spark.range(100).select(boom(F.col("id")).alias("doc_id"))
    with pytest.raises(Exception):
        bad.write.format("sdg_jsonl_sink").option("path", path).mode(
            "append"
        ).save()
    committed = (
        [f for f in os.listdir(path) if not f.startswith(".")]
        if os.path.isdir(path)
        else []
    )
    assert "_SUCCESS" not in committed
    assert not [f for f in committed if f.startswith("part-")]
