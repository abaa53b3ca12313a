"""Round-10 operator batch 18: contingency residuals and balanced
downsampling.

- ``agg_crosstab_residuals`` — WHICH cells drive a significant
  chi-square: standardized Pearson residuals (O−E)/√E for the
  source×language contingency table, from exact integer counts with E
  and the residual as one identical double expression each, surfaced
  as FLOOR(10³·r) images with the |r| > 2 flag decided on the image.
  The interpretability companion to the chi-square family.
- ``sample_balanced_downsample`` — balanced-corpus construction: every
  language downsampled to the SMALLEST language's document count by
  deterministic md5(doc_id) rank (language-partitioned windows — no
  RNG, no global sort), reported as the per-language census with a
  checksum over the kept doc_ids so the exact selection is inside the
  hash check. The class-balancing step before training a classifier on
  skewed corpora.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


@register(
    "agg_crosstab_residuals",
    oracle="""
    WITH cell AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY source, lang
    ),
    margins AS (
        SELECT source, lang, o,
               SUM(o) OVER (PARTITION BY source) AS row_n,
               SUM(o) OVER (PARTITION BY lang) AS col_n,
               SUM(o) OVER () AS n
        FROM cell
    )
    SELECT source, lang, o,
           CAST(FLOOR(1000.0 * (o - CAST(row_n AS DOUBLE) * col_n / n)
                / sqrt(CAST(row_n AS DOUBLE) * col_n / n)) AS BIGINT)
             AS resid_x1e3,
           abs(CAST(FLOOR(1000.0 * (o - CAST(row_n AS DOUBLE) * col_n / n)
                / sqrt(CAST(row_n AS DOUBLE) * col_n / n)) AS BIGINT))
             > 2000 AS notable
    FROM margins
    ORDER BY source, lang
    """,
)
def agg_crosstab_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized Pearson residuals of the source×language table:
    r = (O − E)/√E with E = row·col/N — the per-cell diagnosis behind a
    significant chi-square (|r| > 2 ≈ a cell off at the 5% level). One
    grouped pass to the bounded 20×5 cell table; margins ride as
    partition windows OVER THAT TABLE; the residual is one identical
    double expression from exact integers, imaged ×10³ with the flag
    compared in integers."""
    docs = table(spark, sf_dir, "documents")
    cell = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    margins = cell.select(
        "source",
        "lang",
        "o",
        F.sum("o").over(Window.partitionBy("source")).alias("row_n"),
        F.sum("o").over(Window.partitionBy("lang")).alias("col_n"),
        F.sum("o").over(Window.partitionBy(F.spark_partition_id())).alias("n"),
    )
    resid = F.floor(
        1000.0
        * (F.col("o") - F.col("row_n").cast("double") * F.col("col_n") / F.col("n"))
        / F.sqrt(F.col("row_n").cast("double") * F.col("col_n") / F.col("n"))
    ).cast("bigint")
    return margins.select(
        "source",
        "lang",
        "o",
        resid.alias("resid_x1e3"),
        (F.abs(resid) > 2000).alias("notable"),
    ).orderBy("source", "lang")


@register(
    "sample_balanced_downsample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    ),
    target AS (
        SELECT MIN(cnt) AS m FROM (
            SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
        )
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
           CAST(SUM(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    ::BIGINT % 1000000007) AS BIGINT) AS kept_checksum
    FROM ranked, target
    WHERE rk <= target.m
    GROUP BY lang ORDER BY lang
    """,
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced downsampling to the smallest language's count: keep the
    first min_n documents per language by md5(doc_id) rank — a
    deterministic pseudo-random draw (no RNG, so the exact selection is
    hash-checkable), computed with language-partitioned windows
    (bounded per key, never a global sort). Output certifies the
    SELECTION itself: per-language kept counts, the kept-id sum, and an
    md5 checksum over the ordered kept ids — any divergence in who got
    sampled flips the hash."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    target = counts.agg(F.min("cnt").alias("m"))
    kept = (
        docs.withColumn("rk", rk)
        .crossJoin(F.broadcast(target))
        .filter(F.col("rk") <= F.col("m"))
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("kept_id_sum"),
            # order-independent exact hash SUM (a per-group collect_list
            # checksum would not survive corpus scale)
            F.sum(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("bigint")
                % 1_000_000_007
            )
            .cast("bigint")
            .alias("kept_checksum"),
        )
        .orderBy("lang")
    )
