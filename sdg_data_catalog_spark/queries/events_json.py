"""Events-table operators: JSON extraction, pivot, and the batch-equivalent
time-window aggregations of the streaming surface (SURVEY.md §2.9).

Structured Streaming's unified model means every window op here is the SAME
operator the streaming wrappers (streaming/windows.py) run with readStream —
implemented and oracle-checked in batch first, then streamed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           ROUND(CAST(AVG(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE), 4) AS avg_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (json_parse: ujson.loads at
    papers_download.py:47) via get_json_object — JVM-side JSON path, no
    Python round-trip."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "json_serialize",
    oracle="""
    SELECT event_id,
           '{"event_id":' || CAST(event_id AS VARCHAR)
             || ',"event_type":"' || event_type
             || '","user_id":' || CAST(user_id AS VARCHAR) || '}' AS payload
    FROM events
    WHERE event_type = 'signup'
    """,
)
def json_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct → JSON sink shape (prodigy JSONL sink, prodigy_processing.py:
    20-30): to_json(struct(...)) builds the task payload."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "signup").select(
        "event_id",
        F.to_json(F.struct("event_id", "event_type", "user_id")).alias("payload"),
    )


@register(
    "json_parse_spans",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(n_chars % 40 + 5 AS INTEGER) AS s1 FROM documents
    )
    SELECT doc_id, 0 AS span_idx, 0 AS start_pos, s1 AS end_pos,
           'DATASET_NAME' AS label
    FROM base
    UNION ALL
    SELECT doc_id, 1 AS span_idx, s1 + 5 AS start_pos, s1 + 15 AS end_pos,
           'METHOD' AS label
    FROM base WHERE doc_id % 4 <> 0
    """,
)
def json_parse_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stringified-span annotation ingest (ner_pipeline.py:126,257,284: the
    annotations CSV's `entities` column holds Python-repr
    ``[(start, end, 'LABEL'), ...]`` lists re-parsed per row with
    ast.literal_eval — SURVEY §1.4's "parse once with from_json at
    ingest"). Here the repr string is normalized to JSON with a constant
    `translate` (tuple parens → brackets, single → double quotes), parsed
    JVM-side with `from_json` into a nested array, and exploded to typed
    (doc_id, span_idx, start_pos, end_pos, label) rows — no Python eval
    anywhere. Span count varies per doc (1 or 2) so the variable-length
    path is exercised; the oracle regenerates the spans relationally,
    checking serialize→parse is the identity."""
    docs = table(spark, sf_dir, "documents")
    s1 = (F.col("n_chars") % 40 + 5).cast("int")
    one = F.format_string("[(0, %s, 'DATASET_NAME')]", s1)
    two = F.format_string(
        "[(0, %s, 'DATASET_NAME'), (%s, %s, 'METHOD')]", s1, s1 + 5, s1 + 15
    )
    ents = F.when(F.col("doc_id") % 4 == 0, one).otherwise(two)
    parsed = F.from_json(F.translate(ents, "()'", '[]"'), "array<array<string>>")
    return docs.select("doc_id", F.posexplode(parsed).alias("span_idx", "span")).select(
        "doc_id",
        "span_idx",
        F.col("span")[0].cast("int").alias("start_pos"),
        F.col("span")[1].cast("int").alias("end_pos"),
        F.col("span")[2].alias("label"),
    )


@register(
    "pivot_user_events",
    oracle="""
    SELECT user_id,
           CAST(COUNT(IF(event_type = 'click', 1, NULL)) AS BIGINT) AS click,
           CAST(COUNT(IF(event_type = 'error', 1, NULL)) AS BIGINT) AS error,
           CAST(COUNT(IF(event_type = 'purchase', 1, NULL)) AS BIGINT) AS purchase,
           CAST(COUNT(IF(event_type = 'signup', 1, NULL)) AS BIGINT) AS signup,
           CAST(COUNT(IF(event_type = 'view', 1, NULL)) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (one-hot analog, arr_onehot /
    few_shot_learning cells 16-17). Pinning the pivot values skips the
    extra distinct-scan Spark otherwise runs to discover them."""
    ev = table(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", list(EVENT_TYPES)).count()
    return out.na.fill(0, list(EVENT_TYPES))


@register(
    "stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window agg — identical operator streams with
    readStream + watermark (streaming/windows.py)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@register(
    "stream_sliding",
    oracle="""
    SELECT window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS total_value
    FROM (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS window_start,
               event_type, value
        FROM events
    )
    GROUP BY 1, 2
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min size / 5 min slide): every event lands in two
    overlapping windows."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@register(
    "stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '5 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '5 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) via the built-in session_window —
    Spark merges adjacent events server-side; the oracle reconstructs the
    same islands with a gaps-and-islands window chain."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type,
           time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           CAST(MIN(event_id) AS BIGINT) AS first_event_id
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup (dropDuplicatesWithinWatermark batch equivalent):
    first event per (user, type, 10-min bucket), deterministic survivor."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", "event_type", F.window("ts", "10 minutes").alias("w")
        )
        .agg(F.min("event_id").alias("first_event_id"))
        .select("user_id", "event_type", F.col("w.start").alias("window_start"), "first_event_id")
    )


@register(
    "stream_watermark_late",
    oracle="""
    WITH maxts AS (SELECT MAX(ts) AS m FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS on_time_events
    FROM events, maxts
    WHERE ts >= m - INTERVAL '1 day'
    GROUP BY event_type
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics, batch-checkable: events older than
    (max ts - 1 day) are 'late' and dropped — what withWatermark does
    incrementally in the streaming wrapper."""
    ev = table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]  # driver scalar, tiny agg
    return (
        ev.filter(F.col("ts") >= F.lit(max_ts) - F.expr("INTERVAL 1 DAY"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("on_time_events"))
    )


@register(
    "win_user_running",
    oracle="""
    SELECT event_id, user_id,
           ROUND(CAST(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_value,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS event_seq
    FROM events
    """,
)
def win_user_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running state (the batch twin of the stateful streaming
    operator in streaming/stateful.py)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_value"
        ),
        F.row_number().over(w).alias("event_seq"),
    )


@register(
    "stream_stateful",
    oracle="""
    WITH g AS (
      SELECT user_id, value,
             date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS total_value,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us
    FROM g GROUP BY user_id
    """,
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator, batch twin (SURVEY §2.9 stream_stateful).
    Per-user sequential fold — count, value total, max inter-event gap —
    via groupBy(user_id).applyInPandas; the streaming version
    (streaming/stateful.py:user_stats_stream) runs the SAME kernel under
    applyInPandasWithState with (n, total, max_gap, last_ts) persisted in
    the state store. Oracle expresses the fold relationally (LAG + MAX)."""
    from sdg_data_catalog_spark.streaming.stateful import user_stats_batch

    return user_stats_batch(table(spark, sf_dir, "events"))


@register(
    "unpivot_stack",
    oracle="""
    WITH wide AS (
      SELECT user_id,
             COUNT(IF(event_type = 'click', 1, NULL)) AS click,
             COUNT(IF(event_type = 'view', 1, NULL)) AS view,
             COUNT(IF(event_type = 'error', 1, NULL)) AS error
      FROM events GROUP BY user_id)
    SELECT user_id, kind, CAST(n AS BIGINT) AS n FROM (
      SELECT user_id, 'click' AS kind, click AS n FROM wide
      UNION ALL SELECT user_id, 'view', view FROM wide
      UNION ALL SELECT user_id, 'error', error FROM wide
    ) WHERE n > 0
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of pivot_user_events, via the native
    `unpivot` operator (SQL `stack`): wide per-type count columns back to
    (user_id, kind, n) long form. In-row reshape, no shuffle beyond the
    originating aggregation."""
    ev = table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "error"])
        .count()
        .na.fill(0, ["click", "view", "error"])
    )
    return (
        wide.unpivot("user_id", ["click", "view", "error"], "kind", "n")
        .filter(F.col("n") > 0)
    )


@register(
    "stream_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS lag_us
    FROM events c JOIN events p ON c.user_id = p.user_id
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming/windows.py::conversion_join): click→purchase conversions per
    user within a 1-hour horizon. In streaming form both sides carry
    watermarks and the time-interval condition bounds join state (a click
    can leave state once the purchase watermark passes click_ts + horizon);
    the batch form is the same logical join, oracle-checked. The equi-key
    (user_id) makes it a hash join with a range residual — never a
    cartesian; at 100 TB both sides shuffle on user_id once."""
    ev = table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            # cast NTZ→TIMESTAMP before unix_micros (rejects TIMESTAMP_NTZ);
            # session tz is UTC so the cast is value-preserving
            (
                F.unix_micros(F.col("purchase_ts").cast("timestamp"))
                - F.unix_micros(F.col("click_ts").cast("timestamp"))
            ).alias("lag_us"),
        )
    )


@register(
    "stream_join_outer",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER stream-stream interval join
    (streaming/windows.py::conversion_join_outer): clicks keep a row even
    with no in-horizon purchase. In streaming form the null rows emit only
    once the global watermark (min across both inputs) proves no match can
    still arrive — the exact eviction frontier is pinned in
    tests/test_streaming.py::test_stream_stream_left_outer_join_semantics;
    the batch form is the complete-input answer the stream converges to."""
    ev = table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
            "left_outer",
        )
        .select("user_id", "click_id", "purchase_id")
    )


@register(
    "stream_rocksdb",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window aggregate executed as a REAL streaming query with
    the RocksDB state store provider (rocksdbjni ships in Spark's jars) —
    the production state backend once windowed/dedup/join state exceeds
    executor heap: state lives off-heap in local RocksDB and checkpoints
    incrementally, instead of the default provider's in-heap map with a
    full snapshot per batch. The backlog is drained with availableNow into
    a memory sink and the flattened result is oracle-checked against the
    same DuckDB SQL as the batch twin (stream_tumbling) — streaming with
    RocksDB state must be value-identical to batch."""
    import shutil as _sh

    from sdg_data_catalog_spark.sources.formats import io_dir, table_safe_sf_name
    from sdg_data_catalog_spark.streaming import windows as W

    src = io_dir(sf_dir, "events_stream_rocksdb")
    os.makedirs(src, exist_ok=True)
    _sh.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(src, "part-000.parquet"))
    ckpt = io_dir(sf_dir, "events_stream_rocksdb_ckpt")
    name = f"t_rocksdb_{table_safe_sf_name(sf_dir)}"
    stream = W.tumbling_counts(W.read_events_stream(spark, src))
    sunk, _ = W.run_available_now_rocksdb(stream, name, ckpt)
    return sunk.select("window_start", "event_type", "n", "total_value")
