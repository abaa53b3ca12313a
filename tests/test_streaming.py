"""Streaming surface: the streaming window aggs must equal their batch
twins once the backlog is drained (unified-model parity)."""

from __future__ import annotations

import shutil

import pytest

from sdg_data_catalog_spark.queries.events_json import stream_session, stream_tumbling
from sdg_data_catalog_spark.streaming import windows as W


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # streaming file source wants a directory of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def _as_sorted_tuples(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, sf_dir, events_dir):
    stream = W.tumbling_counts(W.read_events_stream(spark, events_dir))
    got = W.run_available_now(stream, "t_tumbling")
    expect = stream_tumbling(spark, sf_dir)
    assert _as_sorted_tuples(got) == _as_sorted_tuples(expect)


def test_session_stream_matches_batch(spark, sf_dir, events_dir):
    stream = W.session_counts(W.read_events_stream(spark, events_dir))
    got = W.run_available_now(stream, "t_session")
    expect = stream_session(spark, sf_dir)
    assert _as_sorted_tuples(got) == _as_sorted_tuples(expect)


def test_stream_dedup_bounded_state(spark, events_dir):
    events = W.read_events_stream(spark, events_dir)
    deduped = W.dedup_within_watermark(events)
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_dedup")
    # event_id is unique in the synthetic data: dedup must be lossless
    batch_n = spark.read.parquet(events_dir).count()
    assert got.count() == batch_n
    assert got.select("event_id").distinct().count() == batch_n
