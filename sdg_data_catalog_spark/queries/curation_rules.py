"""Canonical corpus-curation rule stacks and sequence analytics:
Gopher-style quality rules, CDC apply, Markov transitions, and
compression-ratio scoring.

`filter_gopher_rules` is the rule stack every large LM corpus pipeline
runs (Rae et al., "Scaling Language Models: ... Gopher", 2021, App. A —
doc-length bounds, mean-word-length bounds, symbol/word caps,
stopword-ish floors), expressed as pure codegen'd column expressions so
the whole screen is one scan. `etl_cdc_apply` folds an ordered
change stream (upserts + deletes) into final table state — the piece
`etl_scd2` (history) and `sink_upsert` (idempotent publish) don't cover:
DELETE semantics. `agg_markov_transitions` is the event-sequence
transition matrix behind next-action models. `text_compression_ratio`
is the Gopher-adjacent redundancy signal (highly compressible text is
boilerplate or repetition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


@register(
    "filter_gopher_rules",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             strlen(replace(text, ' ', ''))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mwl,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('the','a','of','to','and','in')))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_frac
      FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           ROUND(mwl, 6) AS mean_word_len,
           ROUND(stop_frac, 6) AS stopword_frac,
           (n_words BETWEEN 20 AND 100000) AS ok_length,
           (mwl BETWEEN 3.0 AND 10.0) AS ok_word_len,
           (stop_frac >= 0.01) AS ok_stopwords,
           ((n_words BETWEEN 20 AND 100000)
            AND (mwl BETWEEN 3.0 AND 10.0)
            AND (stop_frac >= 0.01)) AS passes
    FROM m
    """,
)
def filter_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule screen (Rae et al. 2021, App. A,
    adapted to this corpus' scale): word-count bounds, mean-word-length
    bounds, and a stopword-fraction floor, each surfaced as its own
    verdict column so downstream curation can report WHICH rule killed a
    document (the operational requirement the single-boolean form
    hides). Everything is a codegen'd expression over one scan — the
    rule stack costs the same as reading the text column, which is why
    these screens run first in every production pipeline."""
    docs = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    # r14 (guide §4.1): split-on-'␣' keeps empties, so n_spaces =
    # n_words − 1 and the non-space char count is length − n_spaces —
    # identical to length(regexp_replace(text,' ','')) without the
    # whole-text regex rewrite pass (2.42 → 1.74 s min-of-5 at the
    # 100× replica, oracle-green at sf0.001/0.01/0.1)
    mwl = (F.length("text") - n_words + 1) / n_words.cast("double")
    stops = F.filter(
        words, lambda w: w.isin("the", "a", "of", "to", "and", "in")
    )
    stop_frac = F.size(stops) / n_words.cast("double")
    ok_length = (n_words >= 20) & (n_words <= 100000)
    ok_word_len = (mwl >= 3.0) & (mwl <= 10.0)
    ok_stop = stop_frac >= 0.01
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(stop_frac, 6).alias("stopword_frac"),
        ok_length.alias("ok_length"),
        ok_word_len.alias("ok_word_len"),
        ok_stop.alias("ok_stopwords"),
        (ok_length & ok_word_len & ok_stop).alias("passes"),
    )


@register(
    "etl_cdc_apply",
    oracle="""
    WITH changes AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'purchase' THEN 'delete'
                  ELSE 'upsert' END AS op
      FROM events
    ),
    latest AS (
      SELECT user_id, op, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM changes
    )
    SELECT user_id, ROUND(value, 6) AS value
    FROM latest
    WHERE rn = 1 AND op <> 'delete'
    """,
)
def etl_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: fold an ordered change stream into final table state —
    per key, the LAST change wins, and a trailing delete removes the row
    entirely (the semantics `sink_upsert`'s append-flavored idempotence
    and `etl_scd2`'s history build both leave uncovered; this is what a
    Debezium/binlog consumer materializes). The demo treats events as
    the change feed: 'purchase' → DELETE, everything else → UPSERT of
    `value`. One hash-partitioned window on the key, ties broken by the
    unique event_id — at 100 TB this is the standard merge-on-read
    compaction shape, and the same plan folds any day's delta into a
    snapshot."""
    ev = table(spark, sf_dir, "events")
    op = F.when(F.col("event_type") == "purchase", "delete").otherwise("upsert")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select("user_id", "ts", "event_id", "value", op.alias("op"))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "delete"))
        .select("user_id", F.round("value", 6).alias("value"))
    )


@register(
    "agg_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    pairs AS (
      SELECT prev, event_type AS curr, COUNT(*) AS n
      FROM seq WHERE prev IS NOT NULL
      GROUP BY prev, curr
    )
    SELECT prev, curr, CAST(n AS BIGINT) AS n,
           ROUND(n / CAST(SUM(n) OVER (PARTITION BY prev) AS DOUBLE), 6)
             AS p
    FROM pairs
    """,
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next action | current action) — the base model behind
    next-event prediction and funnel-dropoff attribution. One window on
    user_id orders each user's stream (lag = previous action), one
    map-side-combined count collapses the corpus to the action-pair
    grid (|types|² rows), and the row-normalization window runs over
    that tiny grid, never raw events."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_type").alias("curr"),
    ).filter(F.col("prev").isNotNull())
    pairs = seq.groupBy("prev", "curr").agg(F.count(F.lit(1)).alias("n"))
    norm = Window.partitionBy("prev")
    return pairs.select(
        "prev",
        "curr",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(norm).cast("double"), 6).alias("p"),
    )


@register("text_compression_ratio")
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio redundancy signal (rows-only: the ratio depends
    on the zlib build, so no cross-engine oracle — the pure-Python twin
    in tests/test_curation_rules.py pins it on this platform): bytes
    after DEFLATE / bytes before, per document. Template spam and
    repeated boilerplate compress far below natural text, catching
    near-duplication INSIDE one document that `dedup_*` (cross-document)
    and `text_repetition_score` (fixed n-gram window) miss. Runs as an
    Arrow-batched mapInPandas over the text column; the doc_id % 20
    subsample bounds the demo, the operator is corpus-wide."""
    import pandas as pd

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)

    def _ratio(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": raw.str.len(),
                    "ratio": [
                        round(len(zlib.compress(b, 6)) / max(len(b), 1), 6)
                        for b in raw
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        _ratio, "doc_id long, n_bytes long, ratio double"
    )
