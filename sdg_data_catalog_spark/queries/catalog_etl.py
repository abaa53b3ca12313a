"""Catalog-ingest ETL recast (SURVEY.md §3 E1) over the documents table.

The reference's ingestion (dataset_ner/paper_processing.py): glob XML files
→ parse → split into paragraphs → keep candidates containing 'data' →
per-row SQLite INSERT with uuid4 ids. Spark shape: scan → explode →
filter → write, with sha2-derived deterministic ids (the seeded-UUID intent
of paper_processing.py:147-150 done right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_CHUNK = 10  # tokens per synthetic paragraph


@register(
    "etl_explode_paragraphs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
                      i -> struct_pack(w := string_split(text, ' ')[i], ord := i))) AS tk
        FROM documents
    ),
    paras AS (
        SELECT doc_id,
               CAST((tk.ord - 1) // {_CHUNK} AS INTEGER) AS chunk_idx,
               string_agg(tk.w, ' ' ORDER BY tk.ord) AS body_text
        FROM toks
        GROUP BY doc_id, (tk.ord - 1) // {_CHUNK}
    )
    SELECT sha256(CAST(doc_id AS VARCHAR) || '|' || CAST(chunk_idx AS VARCHAR)) AS paragraph_id,
           doc_id, chunk_idx, body_text
    FROM paras
    WHERE contains(body_text, 'data')
    """,
)
def etl_explode_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 ingest: document → paragraphs (10-token chunks) → candidate filter
    ('data' in body, paper_processing.py:170-171) → deterministic sha2
    paragraph ids. One explode + one keyed agg; ids never shuffle-dependent."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    paras = (
        toks.groupBy("doc_id", (F.col("pos") / _CHUNK).cast("int").alias("chunk_idx"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))), lambda s: s["w"]
                ),
                " ",
            ).alias("body_text")
        )
    )
    return paras.filter(F.col("body_text").contains("data")).select(
        F.sha2(
            F.concat_ws("|", F.col("doc_id").cast("string"), F.col("chunk_idx").cast("string")),
            256,
        ).alias("paragraph_id"),
        "doc_id",
        "chunk_idx",
        "body_text",
    )


@register(
    "proj_doc_meta",
    oracle="""
    SELECT sha256('doc|' || CAST(doc_id AS VARCHAR)) AS paper_id,
           array_to_string(string_split(text, ' ')[1:5], ' ') AS title,
           array_to_string(string_split(text, ' ')[1:25], ' ') AS abstract,
           lang, source,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    WHERE len(string_split(text, ' ')) >= 5
    """,
)
def proj_doc_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection (proj_meta/proj_abstract: paper_processing.py:
    149-165,71-77): derive title/abstract slices + deterministic paper_id."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.filter(F.size(toks) >= 5).select(
        F.sha2(F.concat(F.lit("doc|"), F.col("doc_id").cast("string")), 256).alias("paper_id"),
        F.array_join(F.slice(toks, 1, 5), " ").alias("title"),
        F.array_join(F.slice(toks, 1, 25), " ").alias("abstract"),
        "lang",
        "source",
        F.size(toks).alias("n_tokens"),
    )


@register(
    "scalar_hash_id",
    oracle="""
    SELECT o_orderkey,
           sha256(CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)) AS row_id
    FROM orders
    """,
)
def scalar_hash_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic row ids via sha2 (replaces uuid4 at
    paper_processing.py:151,178 — nondeterministic ids break retries,
    lineage, and any content-addressed dedup at scale)."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.sha2(
            F.concat_ws("|", F.col("o_orderkey").cast("string"), F.col("o_custkey").cast("string")),
            256,
        ).alias("row_id"),
    )


@register(
    "etl_rollup_maintained",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(value) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def etl_rollup_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance — the hypertable-rollup pattern a
    100 TB event pipeline needs: the per-(event_type, hour) rollup is a
    MAINTAINED table, folded forward batch by batch, never recomputed from
    raw history. Here the events table arrives as three deterministic
    ingest batches (event_id mod 3); each batch aggregates ONLY its own
    rows (map-side combine on the batch), then merges into the maintained
    state by key — incremental cost is O(batch + live buckets), while the
    naive nightly recompute is O(all events ever). Each merge publishes
    through the versioned atomic pointer (sources/atomic.py) behind a DQ
    gate, so a bad batch can never become the readable rollup and a
    replayed batch id is a no-op (exactly-once folding — same ledger trick
    as the streaming foreachBatch sink).

    The oracle is the ONE-SHOT full recompute over all events: incremental
    maintenance must be observationally identical to batch. Raw sums are
    kept unrounded in the maintained state; rounding happens only at read
    so fp batch-order differences stay below the 2-dp surface (the
    stream_tumbling precedent)."""
    from sdg_data_catalog_spark.operators.dq import constraint_report
    from sdg_data_catalog_spark.sources.atomic import publish, read_latest
    from sdg_data_catalog_spark.sources.formats import io_dir

    def rollup_gate(df: DataFrame) -> DataFrame:
        from sdg_data_catalog_spark.operators import dq

        return constraint_report(
            df,
            {
                "bucket_key_unique": F.count(F.lit(1))
                - F.count_distinct("event_type", "bucket_hour"),
                "n_events_positive": dq.violations(
                    F.col("n_events").isNull() | (F.col("n_events") <= 0)
                ),
            },
        )

    root = io_dir(sf_dir, "events_rollup")
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        "value",
    )
    for i in range(3):
        batch_agg = (
            ev.filter(F.col("event_id") % 3 == i)
            .groupBy("event_type", "bucket_hour")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.sum("value").alias("_total"),
            )
        )
        if i == 0:
            merged = batch_agg
        else:
            merged = (
                read_latest(spark, root)
                .unionByName(batch_agg)
                .groupBy("event_type", "bucket_hour")
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("_total").alias("_total"),
                )
            )
        publish(merged, root, i, gate=rollup_gate)
    return read_latest(spark, root).select(
        "event_type",
        "bucket_hour",
        "n_events",
        F.round("_total", 2).alias("total_value"),
    )
