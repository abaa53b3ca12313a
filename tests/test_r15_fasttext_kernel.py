"""r15 fastText per-doc kernel (_ft_doc_features): one Arrow pass with
md5-per-DISTINCT-bigram must reproduce EXACTLY the (doc_id, n_bigrams,
swint) rows of the retired explode + per-occurrence md5 expression form
— equality is exact integers. Edge cases pinned: 2-token doc (single
bigram), repeated bigram within a doc (occurrence-weighted sum, not
type-weighted), bigrams shared across docs (the task-lifetime memo
path), sub-2-token rows reaching the kernel (emit nothing), and a
multi-partition split (per-batch factorize/unique must not change the
integer sums).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_data_catalog_spark.queries.curation_quality import (
    _FT_B,
    _ft_doc_features,
    _tok_array,
)

_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "aa bb"),  # single bigram
    (3, "go go go go"),  # one repeated bigram type, 3 occurrences
    (4, "the cat sat again"),  # shares 'the cat' with doc 1 (memo path)
    (5, "solo"),  # 1 token -> filtered by caller, none if passed
    (6, "Punct!!! 123 the CAT"),  # tokenization handled in Spark
    (7, "x y z x y z x y"),
]


def _toks(spark, docs_rows):
    return (
        spark.createDataFrame(docs_rows, "doc_id long, text string")
        .select("doc_id", _tok_array().alias("t"))
        .filter(F.size("t") >= 2)
    )


def _expr_features(toks):
    n = F.size("t")
    bigs = F.zip_with(
        F.slice("t", 1, n - 1),
        F.slice(F.col("t"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10).cast("long")
        % _FT_B
    )
    wint = (F.col("bucket") * F.lit(2654435761)) % 1000003 % 197 - 98
    rows = (
        toks.select("doc_id", F.explode(bigs).alias("bg"))
        .select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum(wint).alias("swint"))
        .collect()
    )
    return sorted((r.doc_id, r.n_bigrams, r.swint) for r in rows)


def _kernel_features(toks):
    rows = _ft_doc_features(toks).collect()
    return sorted((r.doc_id, r.n_bigrams, r.swint) for r in rows)


def test_ft_kernel_matches_expr_on_edge_docs(spark):
    toks = _toks(spark, _DOCS)
    expr = _expr_features(toks)
    assert expr  # non-degenerate
    assert _kernel_features(toks) == expr


def test_ft_kernel_skips_sub2_token_rows(spark):
    # caller filters size>=2, but the kernel itself must also emit
    # nothing for shorter rows rather than crash or fabricate
    toks = (
        spark.createDataFrame(_DOCS, "doc_id long, text string")
        .select("doc_id", _tok_array().alias("t"))  # NO size filter
    )
    assert _kernel_features(toks) == _expr_features(
        toks.filter(F.size("t") >= 2)
    )


def test_ft_kernel_multi_partition(spark):
    toks = _toks(spark, [(i, t) for i, (_, t) in enumerate(_DOCS * 17)])
    assert _kernel_features(toks.repartition(9)) == _expr_features(toks)


def test_ft_kernel_matches_expr_on_corpus(spark, sf_dir):
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", _tok_array().alias("t"))
        .filter(F.size("t") >= 2)
        .limit(500)
    )
    assert _kernel_features(toks) == _expr_features(toks)
