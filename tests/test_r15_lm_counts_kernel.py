"""r15 lm_counts kernel (operators/lm_counts.py): the fused Arrow
unigram+bigram partial-count pass must reproduce EXACTLY the counts the
retired explode+groupBy passes produced — equality is exact integers,
not approx. Edge cases pinned: NULL token array (explode emits nothing),
1-token doc (unigram only — the empty bigram slice), empty-string
tokens (split of consecutive/trailing separators counts '' like any
token), repeated bigrams within and across docs, and a multi-partition
split (partial sums must merge to the same totals).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_data_catalog_spark.operators.lm_counts import token_count_partials

_DOCS = [
    (1, "a b b a"),
    (2, "a"),
    (3, ""),
    (4, "a  b"),  # consecutive separators -> empty-string token
    (5, "b a b a b"),
    (6, None),
    (7, "x y x y x y"),
]


def _kernel_counts(spark, docs):
    parts = token_count_partials(docs)
    c1 = {
        r.w1: r.c
        for r in parts.filter(F.col("kind") == 1)
        .groupBy("w1")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    }
    c2 = {
        (r.w1, r.w2): r.c
        for r in parts.filter(F.col("kind") == 2)
        .groupBy("w1", "w2")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    }
    return c1, c2


def _explode_counts(docs):
    left = F.slice("t", 1, F.size("t") - 1)
    right = F.slice(F.col("t"), F.lit(2), F.size("t") - 1)
    pairs = F.zip_with(
        left, right, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )
    c1 = {
        r.w: r.c
        for r in docs.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    c2 = {
        (r.w1, r.w2): r.c
        for r in docs.select(F.explode(pairs).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    return c1, c2


def test_kernel_matches_explode_on_edge_docs(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    assert _kernel_counts(spark, docs) == _explode_counts(docs)


def test_kernel_partials_merge_across_partitions(spark):
    # force many tiny partitions so per-batch partials MUST merge
    docs = (
        spark.createDataFrame(_DOCS * 13, "doc_id long, text string")
        .repartition(8)
        .select("doc_id", F.split("text", " ").alias("t"))
    )
    assert _kernel_counts(spark, docs) == _explode_counts(docs)


def test_kernel_matches_explode_on_corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.split("text", " ").alias("t"))
        .limit(400)
    )
    assert _kernel_counts(spark, docs) == _explode_counts(docs)
