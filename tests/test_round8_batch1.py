"""Differential twins for the round-8 batch-1 operators: each Spark
dataflow is replayed in pure Python/numpy on the same sf0.001 parquet
and compared exactly (the per-batch discipline every round-5+ operator
follows)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, n_chars, text FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    con.close()
    return rows


def test_emb_diversity_twin(spark):
    qs = all_queries()
    got = {
        r["label"]: (r["n"], r["diversity"])
        for r in qs["emb_diversity_by_label"](spark, SF).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    by_label: dict[int, list[np.ndarray]] = {}
    for label, emb in rows:
        q = np.array(
            [math.floor(float(np.float64(v)) * 1000 + 0.5) for v in emb],
            dtype=np.int64,
        )
        by_label.setdefault(label, []).append(q)
    for label, vecs in by_label.items():
        m = np.stack(vecs).astype(object)  # exact big-int arithmetic
        n = len(vecs)
        ssq = int((m * m).sum())
        s1 = m.sum(axis=0)
        num = ssq * n - int((s1 * s1).sum())
        div = math.floor(float(num) / (n * n) / 1e6 * 1e6) / 1e6
        gn, gd = got[label]
        assert gn == n
        assert gd == pytest.approx(div, abs=2e-6), label


def test_lm_jm_twin(spark, docs_rows):
    qs = all_queries()
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in qs["lm_jm_interpolated_score"](spark, SF).collect()
    }
    c1: dict[str, int] = {}
    c2: dict[tuple[str, str], int] = {}
    toks = {}
    for doc_id, _, _, text in docs_rows:
        t = text.split(" ")
        toks[doc_id] = t
        for w in t:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    nn = float(sum(c1.values()))
    lam = 0.7
    for doc_id, t in toks.items():
        pairs = list(zip(t, t[1:]))
        if not pairs:
            assert doc_id not in got
            continue
        logps = [
            math.log(lam * c2[(a, b)] / c1[a] + (1 - lam) * c1[b] / nn)
            for a, b in pairs
        ]
        nb, lp = got[doc_id]
        assert nb == len(pairs)
        assert lp == pytest.approx(round(sum(logps) / len(logps), 4), abs=2e-4)


def test_pps_systematic_twin(spark, docs_rows):
    qs = all_queries()
    got = sorted(
        (r["doc_id"], r["weight"], r["cum_w"])
        for r in qs["sample_pps_systematic"](spark, SF).collect()
    )
    cum = 0
    w_total = sum(r[2] for r in docs_rows)
    step = (w_total + 99) // 100
    expect = []
    for doc_id, _, n_chars, _ in docs_rows:
        prev = cum
        cum += n_chars
        if cum // step > prev // step:
            expect.append((doc_id, n_chars, cum))
    assert got == expect
    # systematic PPS yields at most k rows, and exactly k when no single
    # weight spans multiple strides
    assert len(got) <= 100
    if max(r[2] for r in docs_rows) < step:
        assert len(got) == 100 or cum // step == len(got)
