"""Web-curation batch: WARC grammar twin, URL canonicalization
invariants, temperature-mixture math, quantile-sketch bounds, and a
pure-Python k-core peeling twin."""

from __future__ import annotations

import gzip
import hashlib
from collections import defaultdict

import pytest

from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators.iterative import kcore
from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.queries.web_curation import (
    _warc_record,
    parse_warc_members,
)


def test_warc_record_grammar_roundtrip():
    """The writer's bytes parse back through the reader exactly — and the
    parser handles multi-record shards with \\r\\n inside payloads."""
    texts = ["plain text", "with\r\nCRLF inside", "", "unicode ≈ bytes"]
    blob = b"".join(
        _warc_record(i, f"src{i}", t) for i, t in enumerate(texts)
    )
    members = parse_warc_members(gzip.compress(blob))
    assert len(members) == len(texts)
    for i, (url, n_bytes, sha) in enumerate(members):
        payload = texts[i].encode("utf-8")
        assert url == f"https://src{i}.example.org/doc/{i}"
        assert n_bytes == len(payload)
        assert sha == hashlib.sha256(payload).hexdigest()


def test_scan_warc_covers_sample_exactly(spark, sf_dir):
    out = all_queries()["scan_warc"](spark, sf_dir)
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    expected = {
        f"https://{r.source}.example.org/doc/{r.doc_id}" for r in docs.collect()
    }
    got = [r.url for r in out.collect()]
    assert sorted(got) == sorted(expected)  # no dups, no misses


def test_dedup_url_groups_of_four(spark, sf_dir):
    out = all_queries()["dedup_url_canonical"](spark, sf_dir)
    rows = out.collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_variants for r in rows) == n_docs
    # every complete group of 4 variants collapses to ONE canonical URL
    full_groups = [r for r in rows if r.first_doc + 3 < n_docs]
    assert full_groups and all(r.n_variants == 4 for r in full_groups)
    assert all(
        r.canonical_url == f"https://www.example.com/a/{r.first_doc // 4}"
        for r in rows
    )


def test_sample_temperature_upweights_small_sources(spark, sf_dir):
    """α<1 must raise small sources' sampled share above their natural
    share and cap the overall budget at ~25%."""
    docs = table(spark, sf_dir, "documents")
    natural = {r.source: r["count"] for r in docs.groupBy("source").count().collect()}
    kept = (
        all_queries()["sample_temperature"](spark, sf_dir)
        .groupBy("source")
        .count()
        .collect()
    )
    kept = {r.source: r["count"] for r in kept}
    n_total = sum(natural.values())
    k_total = sum(kept.values())
    assert 0.15 * n_total <= k_total <= 0.35 * n_total
    smallest = min(natural, key=natural.get)
    largest = max(natural, key=natural.get)
    if natural[smallest] < natural[largest]:  # guard: distinct sizes
        assert (
            kept.get(smallest, 0) / natural[smallest]
            > kept.get(largest, 0) / natural[largest]
        )


def test_sample_temperature_is_map_side_after_broadcast(spark, sf_dir):
    """The doc-proportional side must not shuffle: only the tiny
    per-source aggregate exchanges."""
    plan = (
        all_queries()["sample_temperature"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sketch_quantiles_bounds_hold(spark, sf_dir):
    rows = all_queries()["sketch_quantiles"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_in_bound and r.p90_in_bound
        assert r.p50 <= r.p90


def _python_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_matches_python_twin(spark, k):
    import random

    rng = random.Random(42)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.degree for r in kcore(df, k).collect()}
    assert got == _python_kcore(edges, k)


def test_kcore_empty_result(spark):
    """A graph whose max degree < k peels to nothing without looping."""
    df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    assert kcore(df, 5).count() == 0


def test_graph_kcore_query_degrees_at_least_k(spark, sf_dir):
    rows = all_queries()["graph_kcore"](spark, sf_dir).collect()
    assert all(r.degree >= 3 for r in rows)


def test_keywords_top3_per_doc(spark, sf_dir):
    out = all_queries()["text_keywords_tfidf"](spark, sf_dir)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("max_rank")
    )
    bad = per_doc.filter((F.col("n") > 3) | (F.col("max_rank") > 3))
    assert bad.count() == 0
    # rank 1 keyword has the max score within its doc
    w_rows = out.collect()
    best = {}
    for r in w_rows:
        best.setdefault(r.doc_id, []).append((r.rank, r.score))
    for doc, pairs in best.items():
        pairs.sort()
        scores = [s for _, s in pairs]
        assert scores == sorted(scores, reverse=True)


def test_corr_matrix_single_shuffle(spark, sf_dir):
    """All five moments must ride ONE exchange (partial-aggregable)."""
    plan = (
        all_queries()["agg_corr_matrix"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    rows = all_queries()["agg_corr_matrix"](spark, sf_dir).collect()
    for r in rows:
        assert -1.0 <= r.corr_qty_price <= 1.0
        assert -1.0 <= r.corr_qty_disc <= 1.0


def test_dataset_card_shares_sum_to_one(spark, sf_dir):
    rows = all_queries()["agg_dataset_card"](spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-4
    docs = table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert r.total_tokens >= r.n_docs  # every doc has ≥1 token
        assert r.p50_chars > 0
