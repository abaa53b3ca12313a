"""Driver-contract conformance: entry() runs, every query runs, every oracle
matches DuckDB on sf0.001 (the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest

from sdg_data_catalog_spark.oracle_check import compare
from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable, non-empty schema


def _params():
    qs = all_queries()
    return sorted(qs)


@pytest.mark.parametrize("name", _params())
def test_query_matches_oracle(spark, sf_dir, duck, name):
    qs, oracles = all_queries(), all_oracles()
    df = qs[name](spark, sf_dir)
    if name not in oracles:
        # rows-only contract: runs and has a stable schema
        assert df.columns
        df.count()
        return
    err = compare(name, df, oracles[name], duck)
    assert err is None, f"{name}: {err}"


def test_atomic_publish_survives_concurrent_reader(spark, tmp_path):
    """sink_upsert's publication primitive: a reader pinned to the previous
    snapshot keeps its files across a new publish (retention floor), new
    readers see the flipped pointer, replaying a committed version is a
    no-op, and pruning keeps exactly `keep` versions."""
    import os

    from sdg_data_catalog_spark.sources.atomic import latest_version, publish, read_latest

    root = str(tmp_path / "atomic")
    publish(spark.range(10).withColumnRenamed("id", "k"), root, 0)
    pinned = spark.read.parquet(latest_version(root)[0])  # reader on v0
    publish(spark.range(20).withColumnRenamed("id", "k"), root, 1)
    assert pinned.count() == 10  # old snapshot still readable mid-flight
    assert read_latest(spark, root).count() == 20
    publish(spark.range(99).withColumnRenamed("id", "k"), root, 1)  # replay
    assert read_latest(spark, root).count() == 20  # idempotent: unchanged
    publish(spark.range(30).withColumnRenamed("id", "k"), root, 2)
    assert sorted(os.listdir(os.path.join(root, "versions"))) == [
        "v000000001",
        "v000000002",
    ]
    assert read_latest(spark, root).count() == 30


def test_publish_gate_blocks_bad_batch(spark, tmp_path):
    """The DQ publish gate: a batch with constraint violations is
    quarantined BEFORE the pointer flip — latest_version stays on the old
    snapshot, readers never see the bad rows, no dead version dir lingers
    for the retention pruner to trip over, and a corrected batch under the
    same version number then publishes cleanly."""
    import os

    import pytest

    from sdg_data_catalog_spark.operators.dq import document_gate
    from sdg_data_catalog_spark.sources.atomic import (
        QualityGateError,
        latest_version,
        publish,
        read_latest,
    )

    schema = "doc_id long, source string, n_chars long"
    root = str(tmp_path / "gated")
    good = spark.createDataFrame([(1, "a", 5), (2, "b", 7)], schema)
    publish(good, root, 0, gate=document_gate)
    assert latest_version(root)[1] == 0

    bad = spark.createDataFrame([(3, "c", 5), (3, "c", -1)], schema)
    with pytest.raises(QualityGateError, match="doc_id_unique"):
        publish(bad, root, 1, gate=document_gate)
    assert latest_version(root)[1] == 0  # pointer untouched
    assert sorted(r.doc_id for r in read_latest(spark, root).collect()) == [1, 2]
    assert not os.path.isdir(os.path.join(root, "versions", "v000000001"))

    fixed = spark.createDataFrame([(3, "c", 5), (4, "d", 1)], schema)
    publish(fixed, root, 1, gate=document_gate)
    assert latest_version(root)[1] == 1
    assert sorted(r.doc_id for r in read_latest(spark, root).collect()) == [3, 4]


def test_approx_distinct_within_bound(spark, sf_dir):
    """agg_approx_distinct (oracle-backed since r4): the query itself emits
    the HLL in-bound boolean; cross-check the exact column independently."""
    import pyspark.sql.functions as F

    from sdg_data_catalog_spark.catalog import table
    from sdg_data_catalog_spark.queries.registry import all_queries

    rows = {
        r["event_type"]: r
        for r in all_queries()["agg_approx_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for et, ex in exact.items():
        assert rows[et]["users_exact"] == ex, (et, rows[et], ex)
        assert rows[et]["hllpp_within_5pct"], (et, rows[et])


def test_priority_window_hygiene():
    """Every _PRIORITY name must resolve to a registered query — a typo
    here silently drops the name out of the driver's 50-name hash window
    (registry._reorder skips unknown names). Also: no duplicates, and the
    window head (first 50 registered names) comes verbatim from the
    priority list."""
    from sdg_data_catalog_spark.queries.registry import _PRIORITY, all_queries

    qs = all_queries()
    unknown = [n for n in _PRIORITY if n not in qs]
    assert unknown == [], f"_PRIORITY names not registered: {unknown}"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate _PRIORITY names"
    head = list(qs)[:50]
    assert head == [n for n in _PRIORITY if n in qs][:50]
