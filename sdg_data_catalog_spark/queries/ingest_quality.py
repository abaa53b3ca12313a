"""Ingest-quality operators: corrupt-record dead-letter routing and
deterministic contrastive negative sampling.

`etl_dlq_routing` is the missing failure path of every JSONL ingest the
reference does optimistically (papers_download.py writes `.fail` marker
files; prodigy_processing.py assumes clean JSONL): malformed records
must neither kill the job nor vanish — they route to a dead-letter
count/sink while clean rows flow on. `sample_negative_pairs` builds the
(anchor, negative) training pairs a contrastive embedding run needs,
with hash-deterministic negatives so the pairing is reproducible across
engines and corpus growth (same md5 arithmetic as `sample_hash`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.sources.formats import io_dir


@register(
    "etl_dlq_routing",
    oracle="""
    SELECT CASE WHEN doc_id % 13 = 0 THEN 'dlq' ELSE 'ok' END AS route,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE n_chars END)
                AS BIGINT) AS total_chars
    FROM documents
    GROUP BY route
    """,
)
def etl_dlq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing on a JSONL ingest: the staged feed carries a
    deterministic fraction of malformed lines (doc_id % 13 — a truncated
    JSON object), the scan runs PERMISSIVE with an explicit
    `_corrupt_record` column, and rows split into 'ok' (parsed payload
    flows on, chars accounted) vs 'dlq' (counted, payload preserved for
    replay — never dropped, never job-fatal). The oracle recomputes both
    routes from the source table, so a green row proves the corrupt rows
    were EXACTLY the planted ones — no false routing either way. The
    parsed frame is cached before routing: Spark (correctly) refuses
    plans that filter raw JSON solely on the internal corrupt column."""
    path = io_dir(sf_dir, "dlq_jsonl")
    docs = table(spark, sf_dir, "documents")
    line = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(F.lit('{"doc_id": '), F.col("doc_id").cast("string")),
    ).otherwise(F.to_json(F.struct("doc_id", "source", "n_chars")))
    docs.select(line.alias("value")).write.text(path)
    parsed = (
        spark.read.schema(
            "doc_id BIGINT, source STRING, n_chars BIGINT, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    route = F.when(F.col("_corrupt_record").isNotNull(), "dlq").otherwise("ok")
    return (
        parsed.select(route.alias("route"), "n_chars")
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("route") == "ok", F.col("n_chars"))), F.lit(0)
            )
            .cast("long")
            .alias("total_chars"),
        )
    )


@register(
    "etl_backfill_partitioned",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           (strftime(CAST(ts AS DATE), '%Y-%m-%d') > '2024-01-15')
             AS backfilled
    FROM events
    GROUP BY day
    """,
)
def etl_backfill_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level incremental backfill: the events table lives
    day-partitioned on disk; an initial load lands the first half of the
    month, then the backfill pass discovers which day-partitions are
    MISSING (left-anti join against the partition values already on
    disk — directory listing, no data scan) and appends exactly those.
    The idempotence unit is the partition, so a re-run of the backfill
    moves nothing — the pattern that makes daily history loads safely
    retryable at 100 TB (contrast `sink_upsert`, whose unit is the
    whole-table version). The oracle checks the final table equals one
    clean full load, day for day."""
    path = io_dir(sf_dir, "backfill_days")
    ev = table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    )
    ev.filter(F.col("day") <= "2024-01-15").write.partitionBy("day").parquet(path)
    existing = spark.read.parquet(path).select("day").distinct()
    missing = ev.join(existing, "day", "left_anti")
    missing.write.mode("append").partitionBy("day").parquet(path)
    final = spark.read.parquet(path)
    return final.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows")
    ).withColumn("backfilled", F.col("day") > "2024-01-15")


N_NEGATIVES = 4


@register(
    "sample_negative_pairs",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
    anchors AS (SELECT doc_id AS anchor_id FROM documents WHERE doc_id % 10 = 0),
    cand AS (
      SELECT anchor_id, o,
             CAST(('0x' || substr(md5(CAST(anchor_id AS VARCHAR) || '#'
                                       || CAST(o AS VARCHAR)), 1, 8))
                  AS BIGINT) % n.n_docs AS neg_id
      FROM anchors, range({N_NEGATIVES}) t(o), n
    )
    SELECT anchor_id, CAST(o AS BIGINT) AS slot, d.doc_id AS negative_id,
           d.source AS negative_source
    FROM cand JOIN documents d ON d.doc_id = cand.neg_id
    WHERE d.doc_id <> cand.anchor_id
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negative sampling: every 10th document anchors 4
    negatives drawn by hashing (anchor, slot) into the id space — a pure
    function of row identity, so the SAME pairs come out on every
    engine, every run, every cluster size (rand()-based negative
    sampling destroys that reproducibility, and with it run-to-run loss
    comparability). Accidental self-pairs are dropped, matching standard
    practice. Plan: the id-space size rides along from a 1-row count
    (lazy), candidates explode 4× the anchor set (never the corpus), and
    the negative join is an equi-join on doc_id. doc_ids here are dense
    [0, n); a sparse-id corpus would hash into a row_number index
    instead."""
    docs = table(spark, sf_dir, "documents")
    # 1-row id-space size: materialize so the crossJoin doesn't re-expand
    # a third corpus scan (audited 3 document scans, now 2: anchors +
    # the negative equi-join probe)
    n = docs.agg(F.count(F.lit(1)).alias("n_docs")).localCheckpoint(eager=True)
    anchors = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("anchor_id")
    )
    cand = (
        anchors.crossJoin(n)
        .select(
            "anchor_id",
            F.explode(F.sequence(F.lit(0), F.lit(N_NEGATIVES - 1))).alias("o"),
            "n_docs",
        )
        .select(
            "anchor_id",
            "o",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("anchor_id").cast("string"),
                                F.lit("#"),
                                F.col("o").cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_docs")
            ).alias("neg_id"),
        )
    )
    return (
        cand.join(docs, cand["neg_id"] == docs["doc_id"])
        .filter(F.col("doc_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col("o").cast("long").alias("slot"),
            F.col("doc_id").alias("negative_id"),
            F.col("source").alias("negative_source"),
        )
    )


@register(
    "pipeline_medallion",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id % 13 <> 0
    GROUP BY lang, source
    """,
)
def pipeline_medallion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The medallion layering end-to-end through this engine's own
    primitives — the architecture a 100 TB lake actually runs:

      bronze: raw JSONL feed with planted malformed lines (doc_id % 13,
              the etl_dlq_routing corpus), scanned PERMISSIVE — corrupt
              records route to the dead letter, never kill the job;
      silver: parsed survivors, exact-dedup'd on the key, atomically
              published BEHIND the document DQ gate (operators/dq.py) —
              a bad batch can never become LATEST;
      gold:   the per-(lang, source) rollup computed FROM THE PUBLISHED
              silver snapshot (not the in-flight frame) and published as
              its own version — consumers read gold, silver is the
              replay/repair point, bronze is the audit trail.

    The oracle recomputes gold straight from the source table minus the
    planted-corrupt keys: a green row proves the full chain — corruption
    split, dedup, gated publish, snapshot isolation, rollup — end to
    end. Each hop is one shuffle or less; every layer boundary is an
    atomic pointer flip."""
    from sdg_data_catalog_spark.operators.dq import document_gate
    from sdg_data_catalog_spark.sources.atomic import publish, read_latest

    docs = table(spark, sf_dir, "documents")
    bronze_path = io_dir(sf_dir, "medallion_bronze")
    line = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(F.lit('{"doc_id": '), F.col("doc_id").cast("string")),
    ).otherwise(F.to_json(F.struct("doc_id", "lang", "source", "n_chars")))
    docs.select(line.alias("value")).write.text(bronze_path)

    parsed = (
        spark.read.schema(
            "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT,"
            " _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(bronze_path)
        .cache()
    )
    silver = (
        parsed.filter(F.col("_corrupt_record").isNull())
        .select("doc_id", "lang", "source", "n_chars")
        .dropDuplicates(["doc_id"])
    )
    silver_root = io_dir(sf_dir, "medallion_silver")
    publish(silver, silver_root, 0, gate=document_gate)

    gold = (
        read_latest(spark, silver_root)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
    gold_root = io_dir(sf_dir, "medallion_gold")
    publish(gold, gold_root, 0)
    return read_latest(spark, gold_root)
