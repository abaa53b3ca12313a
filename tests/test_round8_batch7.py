"""Differential twins for the round-8 batch-7 operators."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.queries.round8_batch7 import _NPMI_MIN, _NPMI_W

SF = "/root/testdata/sf0.001"


def test_ess_twin(spark):
    qs = all_queries()
    [row] = qs["agg_effective_sample_size"](spark, SF).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    corpus = list(docs) + [(d + 1_000_000, t) for d, t in docs if d % 3 == 0]
    sizes: dict[str, int] = {}
    for _, text in corpus:
        h = hashlib.md5(" ".join(sorted(set(text.split(" ")))).encode()).hexdigest()
        sizes[h] = sizes.get(h, 0) + 1
    k = len(sizes)
    inv = sum(math.floor(1e12 / c) for c in sizes.values())
    ess = k * k / (inv / 1e12)
    assert row["n_docs"] == len(corpus)
    assert row["n_clusters"] == k
    assert row["ess"] == pytest.approx(math.floor(ess * 1e6) / 1e6, abs=2e-6)
    assert row["ess_ratio"] == pytest.approx(
        math.floor(ess / len(corpus) * 1e6) / 1e6, abs=2e-6
    )
    # Kish bounds: K <= ESS <= N for 1/c weights (equality at all-singletons)
    assert k - 1e-6 <= row["ess"] <= len(corpus) + 1e-6


def test_minhash_calibration(spark):
    """The estimator audit must (a) agree with an independent exact
    Jaccard on every candidate pair and (b) keep the mean |error|
    within the MinHash sd bound sqrt(J(1-J)/K) ~ 0.14 at K=12."""
    qs = all_queries()
    rows = qs["dedup_minhash_est_vs_exact"](spark, SF).collect()
    assert rows, "LSH must produce candidates on the planted near-dup corpus"
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    shingles = {}
    for doc_id, text in docs:
        t = text.split(" ")
        shingles[doc_id] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        } if len(t) >= 3 else set()
        t2 = t[1:]
        shingles[doc_id + 1_000_000] = {
            " ".join(t2[i : i + 3]) for i in range(len(t2) - 2)
        } if len(t2) >= 3 else set()
    errs = []
    for r in rows:
        a, b = shingles[r["doc_a"]], shingles[r["doc_b"]]
        exact = len(a & b) / len(a | b)
        assert r["jaccard_exact"] == pytest.approx(round(exact, 6), abs=2e-6)
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert r["abs_err"] == pytest.approx(
            round(abs(r["jaccard_est"] - exact), 6), abs=3e-6
        )
        errs.append(r["abs_err"])
    assert sum(errs) / len(errs) < 0.2  # K=12 sd bound with slack


def test_window_npmi_twin(spark):
    qs = all_queries()
    rows = qs["text_window_npmi"](spark, SF).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT lower(text) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    pc: dict[tuple[str, str], int] = {}
    uni: dict[str, int] = {}
    for (text,) in docs:
        t = text.split(" ")
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for o in range(1, _NPMI_W + 1):
            for i in range(len(t) - o):
                pc[(t[i], t[i + o])] = pc.get((t[i], t[i + o]), 0) + 1
    tp = sum(pc.values())
    tu = sum(uni.values())
    scored = []
    for (w1, w2), c in pc.items():
        if c < _NPMI_MIN or w1 == w2:
            continue
        pmi = math.log((c * tu * tu) / (tp * uni[w1] * uni[w2]))
        npmi = math.floor(pmi / (-math.log(c / tp)) * 1e6) / 1e6
        scored.append((-npmi, w1, w2, c))
    scored.sort()
    expect = [(w1, w2, c, -neg) for neg, w1, w2, c in scored[:20]]
    got = [(r["w1"], r["w2"], r["pair_count"], r["npmi"]) for r in rows]
    assert len(got) == min(20, len(expect))
    for (gw1, gw2, gc, gn), (ew1, ew2, ec, en) in zip(got, expect):
        assert (gw1, gw2, gc) == (ew1, ew2, ec)
        assert gn == pytest.approx(en, abs=2e-6)
        assert -1.0 - 1e-6 <= gn <= 1.0 + 1e-6
