"""Streaming surface: the streaming window aggs must equal their batch
twins once the backlog is drained (unified-model parity)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

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


def test_stateful_stream_matches_batch(spark, sf_dir, events_dir):
    from sdg_data_catalog_spark.streaming.stateful import (
        user_stats_batch,
        user_stats_stream,
    )

    events = W.read_events_stream(spark, events_dir)
    stream = user_stats_stream(events)
    q = (
        stream.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit a row per user per micro-batch: keep the last
    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_gap_us"])
        for r in spark.table("t_stateful").collect()
    }
    from sdg_data_catalog_spark.catalog import table as load

    expect = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_gap_us"])
        for r in user_stats_batch(load(spark, sf_dir, "events")).collect()
    }
    assert got == expect


def test_stateful_state_carries_across_microbatches(spark, sf_dir, tmp_path_factory):
    """Split events into two files and force one file per trigger: the
    (n, total, max_gap, last_ts) state must carry across micro-batches so
    the final row per user equals the single-pass batch fold."""
    import pyspark.sql.functions as F

    from sdg_data_catalog_spark.catalog import table as load
    from sdg_data_catalog_spark.streaming.stateful import (
        OUT_SCHEMA,
        user_stats_batch,
        user_stats_stream,
    )

    d = tmp_path_factory.mktemp("events_two_batches")
    ev = load(spark, sf_dir, "events")  # ts normalized to timestamp
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    ev.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(str(d / "a"))
    ev.filter(F.col("event_id") > mid).coalesce(1).write.parquet(str(d / "b"))

    events = W.read_events_stream(spark, str(d / "*"), max_files_per_trigger=1)
    q = (
        user_stats_stream(events)
        .writeStream.format("memory")
        .queryName("t_stateful2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user is the final state
    import pandas as pd

    emitted = spark.table("t_stateful2").toPandas()
    got = {
        int(r.user_id): (int(r.n_events), r.total_value, int(r.max_gap_us))
        for r in emitted.groupby("user_id").tail(1).itertuples()
    }
    expect = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_gap_us"])
        for r in user_stats_batch(load(spark, sf_dir, "events")).collect()
    }
    assert got == expect


def test_transform_with_state_matches_batch(spark, sf_dir, events_dir):
    """transformWithStateInPandas (Spark 4 arbitrary-state API) must
    produce the same final per-user stats as the batch fold and the
    applyInPandasWithState twin."""
    from sdg_data_catalog_spark.catalog import table as load
    from sdg_data_catalog_spark.streaming.stateful import (
        user_stats_batch,
        user_stats_stream_tws,
    )

    # the TWS state-server protocol speaks protobuf from the Python side;
    # without it the driver worker crashes at init (verified: ImportError
    # in transform_with_state_driver_worker.py)
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf (not in container)",
    )
    events = W.read_events_stream(spark, events_dir)
    # transformWithState requires the RocksDB state store provider
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, W.ROCKSDB_PROVIDER)
    try:
        q = (
            user_stats_stream_tws(events)
            .writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    except Exception as e:  # noqa: BLE001
        if "transformWithState" in str(e) or "STATE_STORE" in str(e) or "XXKST" in str(e):
            pytest.skip(f"transformWithState unsupported here: {e}")
        raise
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_gap_us"])
        for r in spark.table("t_tws").collect()
    }
    expect = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_gap_us"])
        for r in user_stats_batch(load(spark, sf_dir, "events")).collect()
    }
    assert got == expect


def test_rate_source_live_windows(spark):
    """Liveness: the same tumbling-window agg runs continuously on the
    built-in rate source under a processing-time trigger — at least two
    non-empty micro-batches commit, and results respect the events schema."""
    ev = W.rate_events_stream(spark, rows_per_second=500)
    agg = W.tumbling_counts(ev, watermark="10 seconds")
    out, progress = W.run_processing_time(agg, "rate_demo", interval="1 seconds", batches=2)
    rows = out.collect()
    assert rows, "continuous query produced no output"
    assert {r.event_type for r in rows} <= {"click", "view", "error"}
    assert all(r.n > 0 for r in rows)
    assert progress is not None and progress["sources"][0]["description"].startswith("Rate")


def test_foreach_batch_upsert_matches_batch_counts(spark, sf_dir, tmp_path_factory):
    """foreachBatch incremental sink: after draining a 3-file split with
    maxFilesPerTrigger=1 (3 micro-batches), the merged state table must
    equal the one-shot batch groupBy counts — batch boundaries invisible."""
    from sdg_data_catalog_spark.catalog import table

    src = tmp_path_factory.mktemp("febatch_src")
    state = str(tmp_path_factory.mktemp("febatch_state") / "state")
    table(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    got = W.run_foreach_batch_counts(stream, state)
    expect = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    assert _as_sorted_tuples(got) == _as_sorted_tuples(expect)

    # at-least-once safety: re-applying the LAST committed micro-batch (what
    # foreachBatch does after a failure) must be a no-op, not a double count
    from sdg_data_catalog_spark.sources.atomic import latest_version

    replay = spark.read.parquet(str(src))
    last_batch_id = latest_version(state)[1]
    W.merge_counts_batch(spark, state, replay, last_batch_id)
    again = spark.read.parquet(latest_version(state)[0])
    assert _as_sorted_tuples(again) == _as_sorted_tuples(expect)

    # restartability: a fresh availableNow run over the same source + state
    # resumes from the checkpoint (no new files -> no new batches -> state
    # unchanged), instead of replaying the backlog into the existing counts
    stream2 = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    got2 = W.run_foreach_batch_counts(stream2, state)
    assert _as_sorted_tuples(got2) == _as_sorted_tuples(expect)


def test_stream_stream_join_matches_batch(spark, sf_dir, events_dir):
    """The stream-stream interval join must produce exactly the batch
    join's pairs once the backlog drains (unified-model parity)."""
    from sdg_data_catalog_spark.queries.events_json import stream_join

    ev = W.read_events_stream(spark, events_dir)
    pairs = W.conversion_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    got = W.run_available_now(pairs, "t_ssjoin", output_mode="append")
    expect = stream_join(spark, sf_dir)
    assert _as_sorted_tuples(got) == _as_sorted_tuples(expect)
    assert got.count() > 0


def test_stream_stream_left_outer_join_semantics(spark, sf_dir, events_dir):
    """LEFT OUTER stream-stream join: every inner pair must match the batch
    join; null-purchase rows must be (a) truly unmatched clicks and (b)
    emitted ONLY for clicks old enough that the final watermark proves no
    match can arrive — newer unmatched clicks stay in state, exactly the
    rows a resumed stream could still match."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = W.read_events_stream(spark, events_dir)
    out = W.conversion_join_outer(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    got = W.run_available_now(out, "t_ssjoin_outer", output_mode="append")
    matched = {
        (r.user_id, r.click_id, r.purchase_id)
        for r in got.collect()
        if r.purchase_id is not None
    }
    nulls = {r.click_id for r in got.collect() if r.purchase_id is None}

    # batch reference: full outer pairs + per-click match flag
    from sdg_data_catalog_spark.catalog import table as load

    bev = load(spark, sf_dir, "events")
    c = bev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = bev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    inner = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    expect_matched = {
        (r.user_id, r.click_id, r.purchase_id) for r in inner.collect()
    }
    assert matched == expect_matched  # inner pairs identical to batch

    matched_clicks = {cid for _, cid, _ in expect_matched}
    all_clicks = {r.click_id for r in c.collect()}
    unmatched_clicks = all_clicks - matched_clicks
    # (a) every null row is a genuinely unmatched click
    assert nulls <= unmatched_clicks
    # (b) exact emission frontier: the GLOBAL watermark is the MIN across
    # both inputs' watermarks (each = its max event time − 10 min delay),
    # and an unmatched click emits its null row iff the global watermark
    # proves no purchase inside the horizon can still arrive
    # (click_ts + 1 h < global watermark). Everything newer stays in state
    # — the rows a resumed stream could still match.
    import datetime as dt

    max_c = c.agg(F.max("click_ts")).collect()[0][0]
    max_p = p.agg(F.max("purchase_ts")).collect()[0][0]
    global_wm = min(max_c, max_p) - dt.timedelta(minutes=10)
    frontier = global_wm - dt.timedelta(hours=1)
    click_ts = {r.click_id: r.click_ts for r in c.collect()}
    expect_nulls = {cid for cid in unmatched_clicks if click_ts[cid] < frontier}
    assert nulls == expect_nulls
    assert nulls  # non-vacuous: the drained backlog does emit null rows


def test_rocksdb_state_store_parity_and_evidence(spark, sf_dir, events_dir, tmp_path_factory):
    """The RocksDB provider (rocksdbjni ships in Spark's jars) must produce
    the same windowed aggregate as the default in-heap provider AND actually
    serve the state: the query progress's stateOperators customMetrics carry
    rocksdb* keys only when the provider is live."""
    ckpt = str(tmp_path_factory.mktemp("rocksdb_ckpt"))
    stream = W.tumbling_counts(W.read_events_stream(spark, events_dir))
    try:
        got, progress = W.run_available_now_rocksdb(stream, "t_rocksdb", ckpt)
    except Exception as e:  # noqa: BLE001
        if "RocksDB" in str(e) or "rocksdb" in str(e):
            pytest.skip(f"RocksDB state store provider unavailable: {e}")
        raise
    expect = stream_tumbling(spark, sf_dir)
    assert _as_sorted_tuples(got) == _as_sorted_tuples(expect)
    metrics = progress["stateOperators"][0]["customMetrics"]
    assert any(k.startswith("rocksdb") for k in metrics)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_read_events_stream_handles_both_ts_units(
    spark, sf_dir, tmp_path_factory, unit
):
    """Regression (round 2): read_events_stream must produce identical
    timestamps whether the source parquet stores ts as TIMESTAMP(MICROS)
    (read natively) or TIMESTAMP(NANOS) (readable only as long, needing the
    ÷1000 conversion). The r2 reader hard-assumed nanos and shifted every
    µs-typed event to 1970."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{sf_dir}/events.parquet")
    ts_type = pa.timestamp(unit)
    rewritten = src.set_column(
        src.schema.get_field_index("ts"),
        pa.field("ts", ts_type),
        src.column("ts").cast(ts_type),
    )
    d = tmp_path_factory.mktemp(f"events_{unit}")
    pq.write_table(rewritten, str(d / "part-000.parquet"))

    got = W.run_available_now(
        W.tumbling_counts(W.read_events_stream(spark, str(d))),
        f"t_unit_{unit}",
    )
    expect = stream_tumbling(spark, sf_dir)
    assert _as_sorted_tuples(got) == _as_sorted_tuples(expect)


def test_stream_static_enrich_matches_batch(spark, sf_dir, events_dir):
    """Stream-static broadcast join parity: the streaming enrich over the
    drained backlog must equal the registered batch twin."""
    from sdg_data_catalog_spark.catalog import table
    from sdg_data_catalog_spark.queries.sketches_curation import stream_enrich

    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    stream = W.enrich_counts(W.read_events_stream(spark, events_dir), dim)
    got = W.run_available_now(stream, "t_enrich")
    expect = stream_enrich(spark, sf_dir)
    assert _as_sorted_tuples(got) == _as_sorted_tuples(expect)
