"""Round-10 operator batch 20: session-depth histogram and OOV rates.

- ``agg_session_depth_histogram`` — how many events does a session
  contain? 5-minute-gap sessionization (the etl_sessionize convention:
  per-user LAG + running session counter), session sizes rolled into
  the depth histogram — the engagement-shape readout behind funnel and
  dwell metrics. Every window partitions by user_id; the histogram is
  |distinct depths| rows at any scale.
- ``text_oov_rate_by_source`` — out-of-vocabulary rate per source
  against the top-1000 global head vocabulary: exact integer token
  counts, OOV share as an integer DIV image. The tokenizer-budget
  readout that says which sources blow up a fixed vocab (the
  per-source companion to agg_vocab_coverage's global curve). The head
  vocab is a bounded rank over the word census; the probe join streams
  tokens against the broadcast vocab.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_GAP_US = 5 * 60 * 1_000_000
_HEAD_VOCAB = 1000


@register(
    "agg_session_depth_histogram",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
    ),
    flagged AS (
        SELECT user_id, ts_us, event_id,
               CASE WHEN LAG(ts_us) OVER w IS NULL
                         OR ts_us - LAG(ts_us) OVER w > {_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS sess
        FROM flagged
    ),
    depth AS (
        SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS depth
        FROM sessions GROUP BY user_id, sess
    )
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM depth GROUP BY depth ORDER BY depth
    """,
)
def agg_session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth histogram under 5-minute-gap sessionization: LAG
    per user flags session starts, a per-user running sum numbers the
    sessions, sizes roll into the depth census — all windows partition
    by user_id (bounded per key) and the output is |distinct depths|
    rows. Both engines run the flag and the running session counter over
    the identical (user, ts, event_id) window order."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > _GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "sess",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    depth = sessions.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).cast("bigint").alias("depth")
    )
    return (
        depth.groupBy("depth")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy("depth")
    )


@register(
    "text_oov_rate_by_source",
    oracle=f"""
    WITH w AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY word),
    vocab AS (
        SELECT word FROM (
            SELECT word, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rk
            FROM df
        ) WHERE rk <= {_HEAD_VOCAB}
    )
    SELECT w.source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(1000000 * SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS oov_rate_x1e6
    FROM w LEFT JOIN vocab v ON v.word = w.word
    GROUP BY w.source ORDER BY w.source
    """,
)
def text_oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOV rate per source against the global top-1000 head vocabulary:
    word census → bounded head-vocab rank (constant-key window over the
    vocabulary table after coalesce — the repo's bounded-global-rank
    convention) → broadcast membership join against the token stream →
    per-source exact counts with the OOV share as an integer DIV image.
    Two corpus passes (census + probe); the decision it feeds is 'which
    sources need a bigger tokenizer vocab'."""
    docs = table(spark, sf_dir, "documents")
    w = docs.select("source", F.explode(F.split("text", " ")).alias("word"))
    df = w.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rk = F.row_number().over(
        Window.partitionBy(F.spark_partition_id()).orderBy(
            F.col("c").desc(), "word"
        )
    )
    vocab = (
        df.coalesce(1)
        .withColumn("rk", rk)
        .filter(F.col("rk") <= _HEAD_VOCAB)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    return (
        w.join(F.broadcast(vocab), "word", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("bigint"))
            .cast("bigint")
            .alias("n_oov"),
            F.expr(
                "CAST(1000000 * SUM(CASE WHEN in_vocab IS NULL THEN 1"
                " ELSE 0 END) DIV COUNT(*) AS BIGINT)"
            ).alias("oov_rate_x1e6"),
        )
        .orderBy("source")
    )
