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
