"""Differential/property tests for the UDF scoring, sampling, and
gazetteer operators (the rows-only surface needs its own evidence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import gazetteer as G
from sdg_data_catalog_spark.operators import sampling as SM
from sdg_data_catalog_spark.operators import scoring as SC
from sdg_data_catalog_spark.queries.ranking import rank_al_lc
from sdg_data_catalog_spark.queries.scoring_sampling import GAZETTEER


def test_ner_score_matches_sql_twin(spark, sf_dir):
    """mapInPandas path_score must equal the pure-SQL rank_al_lc scores."""
    docs = table(spark, sf_dir, "documents")
    udf_scores = {r.doc_id: r.path_score for r in SC.ner_score(docs).collect()}
    for r in rank_al_lc(spark, sf_dir).collect():
        assert abs(udf_scores[r.doc_id] - r.path_score) < 1e-4


def test_vectorize_pad_shape_and_vocab(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    vocab = SC.build_vocab(docs, size=50)
    assert 0 < len(vocab) <= 50 and min(vocab.values()) == 1
    out = SC.vectorize(docs, vocab).collect()
    assert all(len(r.token_ids) == SC.PAD_LEN for r in out)
    flat = {i for r in out for i in r.token_ids}
    assert flat <= set(range(0, len(vocab) + 1))  # ids in [0(OOV/pad), |V|]


def test_classifier_probabilities_valid(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    rows = SC.classify_embeddings(emb).collect()
    assert len(rows) == emb.count()
    assert all(0.0 < r.p_positive < 1.0 for r in rows)
    assert all(r.label_pred == (r.p_positive > 0.5) for r in rows)


def test_lda_topic_distributions(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(100)
    out = SC.lda_topics(docs, k=8, seed=100).collect()
    assert len(out) == 100
    for r in out:
        assert len(r.topic_dist) == 8
        assert abs(sum(r.topic_dist) - 1.0) < 1e-6


def test_group_normalize_stats(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").select(
        "c_nationkey", F.col("c_custkey").alias("row_key"), "c_acctbal"
    )
    out = SC.group_normalize(cust, key="c_nationkey", value="c_acctbal")
    stats = out.groupBy("c_nationkey").agg(
        F.round(F.avg("z"), 6).alias("m"), F.round(F.stddev_samp("z"), 4).alias("s"), F.count("*").alias("n")
    ).collect()
    for r in stats:
        if r.n > 1:
            assert abs(r.m) < 1e-6 and abs(r.s - 1.0) < 1e-3


def test_stratified_split_fractions_and_completeness(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    train, test = SM.stratified_split(docs, "lang", 0.85, key_cols=["doc_id"])
    n, tr, te = docs.count(), train.count(), test.count()
    assert tr + te == n  # partition: no row lost or duplicated
    assert 0.70 * n <= tr <= 0.95 * n
    # determinism: same seed → same draw
    train2, _ = SM.stratified_split(docs, "lang", 0.85, key_cols=["doc_id"])
    assert sorted(r.doc_id for r in train.select("doc_id").collect()) == sorted(
        r.doc_id for r in train2.select("doc_id").collect()
    )


def test_trie_matches_naive_scan(spark, sf_dir):
    """Differential: trie spans == naive str.find scan (fastmatch.py's
    O(n*m) worst case as ground truth), on a sample of docs."""
    docs = table(spark, sf_dir, "documents").limit(40)
    got = {
        (r.doc_id, r.match, r.start, r.end)
        for r in G.match_spans(docs, list(GAZETTEER))
        .select("doc_id", F.explode("matches").alias("m"))
        .select("doc_id", "m.match", "m.start", "m.end")
        .collect()
    }
    trie = G.Trie(sorted(GAZETTEER))
    expect = set()
    for row in docs.select("doc_id", "text").collect():
        for m, s, e in trie.scan(row.text):
            found = row.text.find(m, s)
            assert found == s and row.text[s:e] == m
            expect.add((row.doc_id, m, s, e))
    assert got == expect


def test_trie_longest_match_and_boundaries():
    trie = G.Trie(["data", "data set", "set"])
    # longest match wins; 'set' inside 'dataset' must not match (boundary)
    assert trie.scan("a data set here") == [("data set", 2, 10)]
    assert trie.scan("dataset") == []
    assert trie.scan("set data") == [("set", 0, 3), ("data", 4, 8)]


def test_match_names_equijoin_strategy_matches_broadcast(spark, sf_dir):
    """The big-gazetteer substring equi-join must return exactly the
    broadcast contains-join's (doc_id, name) pairs — including nested
    names (a name inside a longer name), which the trie scan by design
    does NOT emit."""
    docs = table(spark, sf_dir, "documents").limit(60)
    names = spark.createDataFrame(
        [(n,) for n in sorted(GAZETTEER) + ["data", "data set"]], "name string"
    )
    bcast = {
        (r.doc_id, r.name)
        for r in G.match_names_join(docs, names, strategy="broadcast").collect()
    }
    equi = {
        (r.doc_id, r.name)
        for r in G.match_names_join(docs, names, strategy="equijoin").collect()
    }
    assert bcast == equi
    assert bcast  # non-trivial corpus
