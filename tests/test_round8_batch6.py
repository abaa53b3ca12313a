"""Differential twins for the round-8 batch-6 operators."""

from __future__ import annotations

import math

import duckdb
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.queries.round8_batch6 import _QQ_PCTS, _QQ_SRC

SF = "/root/testdata/sf0.001"


def test_borda_vs_rrf_same_lists(spark):
    """Borda and RRF fuse the SAME candidate lists — every doc in the
    Borda top-20 carries rank columns consistent with rank_rrf's for
    the docs both top-20s share, and the Borda score recomputes from
    its own ranks exactly."""
    qs = all_queries()
    borda = {r["doc_id"]: r for r in qs["rank_borda_fusion"](spark, SF).collect()}
    rrf = {r["doc_id"]: r for r in qs["rank_rrf"](spark, SF).collect()}
    assert len(borda) == 20
    for doc_id, r in borda.items():
        expect = (1001 - r["lex_rank"] if r["lex_rank"] else 0) + (
            1001 - r["sem_rank"] if r["sem_rank"] else 0
        )
        assert r["borda"] == expect
        if doc_id in rrf:
            assert rrf[doc_id]["lex_rank"] == r["lex_rank"]
            assert rrf[doc_id]["sem_rank"] == r["sem_rank"]
    # integer scores are strictly ordered with the doc_id tie-break
    scores = [r["borda"] for r in borda.values()]
    assert max(scores) <= 2000


def test_qq_points_twin(spark):
    qs = all_queries()
    rows = {r["p"]: r for r in qs["dq_qq_points"](spark, SF).collect()}
    con = duckdb.connect()
    a = sorted(
        x[0]
        for x in con.execute(
            f"SELECT n_chars FROM read_parquet('{SF}/documents.parquet') WHERE source = '{_QQ_SRC}'"
        ).fetchall()
    )
    b = sorted(
        x[0]
        for x in con.execute(
            f"SELECT n_chars FROM read_parquet('{SF}/documents.parquet') WHERE source <> '{_QQ_SRC}'"
        ).fetchall()
    )
    con.close()

    def q(vals, p):
        idx = p * (len(vals) - 1)
        lo = int(math.floor(idx))
        frac = idx - lo
        hi = min(lo + 1, len(vals) - 1)
        return (1 - frac) * vals[lo] + frac * vals[hi]

    assert len(rows) == len(_QQ_PCTS)
    for p in _QQ_PCTS:
        r = rows[p]  # p literals are identical floats on both sides
        assert r["q_source"] == pytest.approx(round(q(a, p), 6), abs=2e-6)
        assert r["q_rest"] == pytest.approx(round(q(b, p), 6), abs=2e-6)
        assert r["gap"] == pytest.approx(round(q(a, p) - q(b, p), 6), abs=2e-6)


def test_hhi_twin(spark):
    qs = all_queries()
    [row] = qs["agg_concentration_hhi"](spark, SF).collect()
    con = duckdb.connect()
    g = con.execute(
        f"SELECT source, SUM(n_chars) FROM read_parquet('{SF}/documents.parquet') GROUP BY source"
    ).fetchall()
    con.close()
    wt = sum(w for _, w in g)
    n = len(g)
    hhi = sum(w * w for _, w in g) / (wt * wt)
    assert row["n_sources"] == n
    assert row["hhi"] == pytest.approx(math.floor(hhi * 1e6) / 1e6, abs=2e-6)
    assert row["hhi_uniform"] == pytest.approx(
        math.floor(1.0 / n * 1e6) / 1e6, abs=2e-6
    )
    assert row["hhi_normalized"] == pytest.approx(
        math.floor((hhi - 1 / n) / (1 - 1 / n) * 1e6) / 1e6, abs=2e-6
    )
    # HHI bounds: 1/n <= HHI <= 1
    assert row["hhi_uniform"] - 1e-6 <= row["hhi"] <= 1.0
