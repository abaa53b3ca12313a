"""Twins for round-12 batch 1 (queries/round12_batch1.py). Oracle hashes
are covered by test_contract.py."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def test_lda_input_census_matches_python(spark, sf_dir):
    out = all_queries()["lda_input_census"](spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tf: Counter = Counter()
    df: Counter = Counter()
    for t in docs["text"]:
        toks = (t or "").split(" ")
        tf.update(toks)
        df.update(set(toks))
    expect = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[: len(out)]
    got = list(zip(out["token"], out["tf"]))
    assert got == expect
    for r in out.itertuples():
        assert int(r.df) == df[r.token]
    assert list(out["rank"]) == list(range(1, len(out) + 1))


def test_lda_input_census_is_countvectorizer_vocab(spark, sf_dir):
    """The link to the live MLlib pipeline: the census's token set is
    exactly the vocabulary the udtf_lda CountVectorizer fits (CV orders
    by frequency with arbitrary tie order, so compare SETS — the census's
    deterministic tie-break exists to stay hash-certifiable, the set is
    what the LDA term matrix actually sees)."""
    from pyspark.ml.feature import CountVectorizer
    from pyspark.sql import functions as F

    from sdg_data_catalog_spark.catalog import table
    from sdg_data_catalog_spark.queries.round12_batch1 import _LDA_VOCAB

    census = all_queries()["lda_input_census"](spark, sf_dir).toPandas()
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("tokens"))
    cv = CountVectorizer(
        inputCol="tokens", outputCol="tf", vocabSize=_LDA_VOCAB, minDF=1.0
    )
    vocab = set(cv.fit(toks).vocabulary)
    assert set(census["token"]) == vocab

    # guard the comparison itself: a frequency tie across the rank-64
    # boundary would make the top-64 SET engine-dependent; assert the
    # boundary is strict at this SF so the equality above is meaningful
    if len(census) == _LDA_VOCAB:
        tf_counts = sorted(census["tf"], reverse=True)
        # recompute count of the (64+1)-th term from raw data
        docs_pd = pd.read_parquet(f"{sf_dir}/documents.parquet")
        c: Counter = Counter()
        for t in docs_pd["text"]:
            c.update((t or "").split(" "))
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if len(ordered) > _LDA_VOCAB:
            assert ordered[_LDA_VOCAB][1] < tf_counts[-1], (
                "tf tie across the vocab boundary — census/CV set equality "
                "would be engine-dependent at this SF"
            )
