"""Structured Streaming surface over the events table (SURVEY.md §2.9).

The reference has no streaming (its closest construct is the Prodigy lazy
generator, multi_classification_recipe_sdg_dc.py:43-45). Here every batch
window aggregation from queries/events_json.py is wrapped with
readStream → transform → writeStream: the SAME logical operators, which is
the point of Structured Streaming's unified model.

Pattern (scale notes):
  - file source with explicit schema (streaming sources can't infer);
  - withWatermark bounds state: late events beyond the watermark are
    dropped and window state is evicted — without it, state grows forever;
  - availableNow trigger drains the backlog as one bounded run (the
    batch-parity mode used by tests); continuous jobs use processingTime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Legacy events schema with ts as epoch-nanos long, for parquet written with
# TIMESTAMP(NANOS) (which Spark can only read as long). Kept for callers that
# know their source is nanos; read_events_stream detects the actual type.
EVENTS_NANOS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Open the events parquet dir as a stream; one file = one microbatch
    backlog unit (or `max_files_per_trigger` files per micro-batch).

    Streaming sources can't infer schemas, so the schema is taken from a
    batch footer read of the same dir — which also tells us whether `ts` is
    stored as TIMESTAMP (µs, the current testdata) or as nanos-as-long
    (TIMESTAMP(NANOS) parquet, which Spark only reads as long). The nanos →
    µs conversion is applied ONLY in the long case, mirroring the batch
    loader's guard (catalog._load_events) — unconditionally dividing a
    µs-typed read by 1000 lands every event in 1970 (round-2 regression)."""
    from sdg_data_catalog_spark.catalog import _ensure_conf

    _ensure_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.parquet(events_dir)  # footer-only: schema discovery
    reader = spark.readStream.schema(batch.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(events_dir)
    if dict(batch.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        # watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
        # on NTZ); session tz is UTC so the cast is value-preserving
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of queries.events_json.stream_tumbling. Window bounds
    are cast back to TIMESTAMP_NTZ so drained results are value-identical to
    the NTZ batch twin independent of driver/system timezone."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup on event_id with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def rate_events_stream(spark: SparkSession, rows_per_second: int = 500) -> DataFrame:
    """Live unbounded source: the built-in `rate` source emits
    (timestamp, value) at a fixed rate; rows map deterministically into the
    events schema (event_id = the monotonic value, user hash, type from a
    modulo lookup) so every downstream window/dedup/stateful operator runs
    unchanged against a genuinely unbounded stream.

    This is the demo/liveness twin of the file source: file + availableNow
    proves batch parity (oracle-checkable), rate + processingTime proves
    the same plans run continuously. No oracle by construction — the input
    is wall-clock-driven."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.col("value"), F.lit(97)).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("error")),
            (F.pmod(F.col("value"), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.col("value") * F.lit(37), F.lit(1000)) / 10.0).alias("value"),
    )


def run_processing_time(
    stream_df: DataFrame, query_name: str, interval: str = "1 seconds", batches: int = 2
):
    """Run a continuous query with a processing-time trigger until it has
    committed `batches` micro-batches, then stop and return the sink table
    plus the final progress dict. Demo harness for the rate source —
    production jobs simply never stop."""
    import time

    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(processingTime=interval)
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            progress = q.recentProgress
            if len([p for p in progress if p["numInputRows"] > 0]) >= batches:
                break
            time.sleep(0.25)
    finally:
        q.stop()
        q.awaitTermination()
    return stream_df.sparkSession.table(query_name), q.lastProgress


def merge_counts_batch(
    spark: SparkSession, state_dir: str, batch_df: DataFrame, batch_id: int
) -> None:
    """Idempotent per-micro-batch merge (the foreachBatch body).

    foreachBatch is at-least-once: after a failure the SAME batch_id is
    re-invoked with the same data, and a naive read-merge-overwrite would
    double-count it. `sources.atomic.publish` makes this exactly-once:
    the LATEST pointer doubles as the batch ledger (replayed batch_id <=
    committed version → no-op) and the versioned-dir + pointer flip keeps
    every published state immutable, so a crash mid-publish leaves the old
    state visible and the replay simply re-writes the same version dir.

    On Delta/Iceberg this whole body is one `MERGE INTO` with
    txnAppId/txnVersion = batch_id; the pointer dance is what plain
    parquet needs to get the same guarantee."""
    from sdg_data_catalog_spark.operators.dq import user_counts_gate
    from sdg_data_catalog_spark.sources.atomic import latest_version, publish

    cur = latest_version(state_dir)
    if cur is not None and cur[1] >= batch_id:
        return  # replayed micro-batch: already folded into the state
    batch_agg = (
        batch_df.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    if cur is not None:
        merged = (
            spark.read.parquet(cur[0])
            .unionByName(batch_agg)
            .groupBy("user_id")
            .agg(F.sum("n_events").cast("bigint").alias("n_events"))
        )
    else:
        merged = batch_agg
    # DQ-gated: a merge bug (duplicate user_id, non-positive count) fails
    # this micro-batch loudly; the state table keeps its previous version.
    publish(merged, state_dir, batch_id, gate=user_counts_gate)


def run_foreach_batch_counts(
    events: DataFrame, state_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """`foreachBatch` incremental sink — the production pattern for merging
    micro-batches into a table when the sink has no native streaming writer
    (plain parquet here; on Delta/Iceberg the merge body becomes one
    MERGE INTO). Each micro-batch's per-user counts fold into the state
    table via `merge_counts_batch` — idempotent per batch_id and atomic
    via a versioned dir + pointer-file flip, with a checkpointLocation
    tied to the state dir so a re-run RESUMES (processes only new files)
    instead of replaying the whole backlog against existing state.
    Returns the final state table.

    Parity property (tested): after draining any file split of the input,
    the state table equals the one-shot batch `groupBy(user_id).count()` —
    micro-batch boundaries must not show in the result; neither must
    retried micro-batches (tested by double-applying a batch)."""
    import os

    spark = events.sparkSession
    os.makedirs(state_dir, exist_ok=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_counts_batch(spark, state_dir, batch_df, batch_id)

    q = (
        events.writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(state_dir, "checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from sdg_data_catalog_spark.sources.atomic import latest_version

    ptr = latest_version(state_dir)
    if ptr is None:  # empty input stream: no batch ever committed
        return spark.createDataFrame([], "user_id BIGINT, n_events BIGINT")
    return spark.read.parquet(ptr[0])


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str | None = None
) -> DataFrame:
    """Drain the whole backlog once into an in-memory sink and return the
    result as a batch DataFrame (test/demo harness). Aggregating streams
    default to complete mode; non-aggregating ones (joins, dedup, maps)
    must use append — pass output_mode explicitly for those."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode or ("complete" if stream_df.isStreaming else "append"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def conversion_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 HOUR",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: purchases within `horizon` of a same-user
    click. Both sides MUST carry watermarks and the join MUST carry a
    time-interval condition — that pair is what lets Structured Streaming
    expire join state (a buffered click is droppable once the purchase-side
    watermark passes click_ts + horizon). Without it, state grows without
    bound. Batch twin: queries.events_json.stream_join."""
    c = (
        clicks.select(
            "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
        ).withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        ).withWatermark("purchase_ts", watermark)
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            # cast NTZ→TIMESTAMP (session tz is UTC, value-preserving):
            # unix_micros rejects TIMESTAMP_NTZ inputs outright
            (
                F.unix_micros(F.col("purchase_ts").cast("timestamp"))
                - F.unix_micros(F.col("click_ts").cast("timestamp"))
            ).alias("lag_us"),
        )
    )


def conversion_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 HOUR",
    watermark: str = "10 minutes",
) -> DataFrame:
    """LEFT OUTER stream-stream join: like conversion_join, but clicks with
    NO purchase inside the horizon emit a null-purchase row — once the
    purchase-side watermark passes click_ts + horizon and Spark can PROVE
    no match can still arrive. Consequence (tested): at the end of a
    drained finite stream, unmatched clicks NEWER than the final watermark
    have not been emitted yet — they are still provisional state, exactly
    what resuming the stream with more data would need. The batch twin has
    no such tail (its input is complete by definition); the parity test
    accounts for the difference explicitly rather than papering over it."""
    c = (
        clicks.select(
            "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
        ).withWatermark("click_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        ).withWatermark("purchase_ts", watermark)
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "left_outer",
    ).select("user_id", "click_id", "click_ts", "purchase_id")


def enrich_counts(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Streaming twin of queries.sketches_curation.stream_enrich: stream ⋈
    static broadcast dimension, then aggregate. Stream-static joins keep no
    state — Spark re-evaluates the static side per micro-batch (so a dim
    refresh is picked up on the next batch), and the broadcast means event
    rows never shuffle for the join."""
    return (
        events.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# --- RocksDB state store (the at-scale state backend) ----------------------

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_available_now_rocksdb(
    stream_df: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str | None = None,
):
    """Drain the backlog with the RocksDB state store provider — the
    production choice once streaming state (dedup sets, session windows,
    join buffers) exceeds executor heap: state lives off-heap in a local
    RocksDB instance and checkpoints incrementally (changelog files) to the
    checkpoint location, instead of the default HDFS-backed provider's
    full-snapshot-per-batch of an in-heap map. The provider conf is read at
    query start, so it is set for the duration and restored after (no
    session-wide side effect — same save/restore discipline as the Arrow
    batch-size hoisting). Returns (result_df, last_progress) so callers can
    assert RocksDB actually served the state (customMetrics carry rocksdb*
    keys only under this provider)."""
    spark = stream_df.sparkSession
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode or "complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.lastProgress
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return spark.table(query_name), progress
