"""Differential twins for the round-8 batch-19 operators."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"

_DAY_US = 86_400_000_000


def _events():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, event_type, epoch_us(ts), value
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    con.close()
    return rows


def _pred(v, shift):
    if v < 100 + shift:
        return "view"
    if v < 200 + shift:
        return "click"
    if v < 300 + shift:
        return "signup"
    if v < 400 + shift:
        return "purchase"
    return "error"


def test_cochran_q_twin(spark):
    qs = all_queries()
    [row] = qs["agg_cochran_q"](spark, SF).collect()
    g = [0, 0, 0]
    sl = sl2 = n = 0
    for _, et, _, v in _events():
        cs = [
            _pred(v, 0) == et,
            _pred(v, 50) == et,
            _pred(v, -50) == et,
        ]
        li = sum(cs)
        for j, c in enumerate(cs):
            g[j] += c
        sl += li
        sl2 += li * li
        n += 1
    q = 2.0 * (3.0 * sum(x * x for x in g) - sl * sl) / (3.0 * sl - sl2)
    assert row["n"] == n
    assert (row["g1"], row["g2"], row["g3"]) == tuple(g)
    assert abs(row["q_stat"] - q) <= 1e-4
    assert row["q_stat"] >= 0


def test_friedman_twin(spark):
    qs = all_queries()
    [row] = qs["agg_friedman_test"](spark, SF).collect()
    daily = defaultdict(Counter)
    types = set()
    days = set()
    for _, et, t, _ in _events():
        d = t // _DAY_US
        daily[d][et] += 1
        types.add(et)
        days.add(d)
    types = sorted(types)
    k = len(types)
    n = len(days)
    r2j = Counter()
    a2x4 = 0
    for d in days:
        ys = [(daily[d].get(et, 0), et) for et in types]
        for y, et in ys:
            smaller = sum(1 for y2, _ in ys if y2 < y)
            equal = sum(1 for y2, _ in ys if y2 == y)
            rank2 = 2 * (smaller + 1) + equal - 1
            r2j[et] += rank2
            a2x4 += rank2 * rank2
    num4 = sum((r2j[et] - n * (k + 1)) ** 2 for et in types)
    chi2 = (k - 1) * num4 / (a2x4 - n * k * (k + 1) ** 2)
    assert row["n_blocks"] == n
    assert row["k_treatments"] == k
    assert abs(row["friedman_chi2"] - chi2) <= 1e-5
    assert row["friedman_chi2"] >= 0


def _mtld_fold(toks, thr=72):
    t = 0
    ty: set[str] = set()
    f = 0
    for w in toks:
        nk = len(ty) + (0 if w in ty else 1)
        if 100 * nk < thr * (t + 1):
            t, ty, f = 0, set(), f + 1
        else:
            t += 1
            ty.add(w)
    return t, len(ty), f


def test_mtld_twin(spark):
    qs = all_queries()
    rows = {r["doc_id"]: r for r in qs["text_mtld"](spark, SF).collect()}
    con = duckdb.connect()
    docs = con.execute(
        f"""SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')
            WHERE doc_id % 20 = 0"""
    ).fetchall()
    con.close()
    seen = 0
    for doc_id, text in docs:
        toks = [w for w in (text or "").split(" ") if w]
        if not toks:
            assert doc_id not in rows
            continue
        seen += 1
        t, kk, f = _mtld_fold(toks)
        if t == 0:
            mtld = len(toks) / max(f, 1)
        else:
            partial = (1.0 - kk / t) / 0.28
            mtld = 0.0 if f + partial <= 0 else len(toks) / (f + partial)
        r = rows[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["full_factors"] == f
        assert abs(r["mtld"] - round(mtld, 6)) <= 2e-6
    assert len(rows) == seen


def test_mtld_length_invariance_property(spark):
    """MTLD's point: doubling a text leaves MTLD roughly unchanged,
    while TTR halves-ish. Verified on the fold directly."""
    base = ["the", "cat", "sat", "on", "a", "mat", "with", "dog", "ran", "far"]
    t1, k1, f1 = _mtld_fold(base * 3)
    t2, k2, f2 = _mtld_fold(base * 6)
    def val(toks, t, kk, f):
        if t == 0:
            return len(toks) / max(f, 1)
        return len(toks) / (f + (1.0 - kk / t) / 0.28)
    m1 = val(base * 3, t1, k1, f1)
    m2 = val(base * 6, t2, k2, f2)
    assert abs(m1 - m2) / m1 < 0.35  # stable under doubling
    ttr1 = len(set(base * 3)) / len(base * 3)
    ttr2 = len(set(base * 6)) / len(base * 6)
    assert ttr2 <= ttr1 / 1.9  # TTR collapses under doubling
