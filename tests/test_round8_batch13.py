"""Differential twins for the round-8 batch-13 operators."""

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


def _km_subjects():
    rows = _events()
    t0 = {}
    for uid, et, ts_us, _ in rows:
        if et == "signup" and (uid not in t0 or ts_us < t0[uid]):
            t0[uid] = ts_us
    tp, tl = {}, {}
    for uid, et, ts_us, _ in rows:
        if uid not in t0:
            continue
        if et == "purchase" and ts_us > t0[uid]:
            if uid not in tp or ts_us < tp[uid]:
                tp[uid] = ts_us
        if uid not in tl or ts_us > tl[uid]:
            tl[uid] = ts_us
    return [
        (
            (tp[u] - t0[u]) // _DAY_US if u in tp else (tl[u] - t0[u]) // _DAY_US,
            1 if u in tp else 0,
        )
        for u in t0
    ]


def test_nelson_aalen_twin(spark):
    """Textbook NA recount with the same flooring convention."""
    qs = all_queries()
    rows = {r["day"]: r for r in qs["agg_nelson_aalen"](spark, SF).collect()}
    subj = _km_subjects()
    days = sorted({d for d, _ in subj})
    total = len(subj)
    exited = 0
    h_run = v_run = 0
    for day in days:
        n_risk = total - exited
        d = sum(1 for dd, died in subj if dd == day and died)
        c = sum(1 for dd, died in subj if dd == day and not died)
        h_run += math.floor(d * 1e9 / n_risk)
        v_run += math.floor(d * (n_risk - d) / n_risk / n_risk / n_risk * 1e12)
        r = rows[day]
        assert r["n_risk"] == n_risk
        assert r["n_death"] == d
        assert r["n_censored"] == c
        assert abs(r["cum_hazard"] - round(h_run / 1e9, 6)) <= 1e-9
        assert abs(r["cum_hazard_var"] - round(v_run / 1e12, 6)) <= 1e-9
        exited += d + c


def test_nelson_aalen_km_consistency(spark):
    """exp(-H(t)) ~ S(t): the NA curve must upper-bound KM survival
    (1-x <= exp(-x)) and track it closely while hazards are small."""
    qs = all_queries()
    na = {r["day"]: r for r in qs["agg_nelson_aalen"](spark, SF).collect()}
    km = {r["day"]: r for r in qs["agg_survival_km"](spark, SF).collect()}
    assert set(na) == set(km)
    for day in na:
        # identical day census by construction
        assert na[day]["n_risk"] == km[day]["n_risk"]
        assert na[day]["n_death"] == km[day]["n_death"]
        if km[day]["survival"] > 0:
            assert math.exp(-na[day]["cum_hazard"]) >= km[day]["survival"] - 1e-6


def test_tost_twin(spark):
    qs = all_queries()
    [row] = qs["agg_tost_equivalence"](spark, SF).collect()
    g = defaultdict(lambda: [0, 0, 0])  # n, s1, s2
    for uid, _, _, v in _events():
        img = math.floor(v * 1e6)
        a = g[uid % 2]
        a[0] += 1
        a[1] += img
        a[2] += img * img
    (n0, a1, a2), (n1, b1, b2) = g[0], g[1]
    m0, m1 = a1 / (n0 * 1e6), b1 / (n1 * 1e6)
    var0 = (n0 * a2 - a1 * a1) / (n0 * (n0 - 1) * 1e12)
    var1 = (n1 * b2 - b1 * b1) / (n1 * (n1 - 1) * 1e12)
    margin = 0.05 * (a1 + b1) / ((n0 + n1) * 1e6)
    se = math.sqrt(var0 / n0 + var1 / n1)
    t_lo = (m1 - m0 + margin) / se
    t_hi = (m1 - m0 - margin) / se
    assert row["n0"] == n0 and row["n1"] == n1
    assert abs(row["mean_even"] - m0) <= 2e-6
    assert abs(row["mean_odd"] - m1) <= 2e-6
    assert abs(row["margin"] - margin) <= 2e-6
    assert abs(row["t_lower"] - t_lo) <= 1e-4
    assert abs(row["t_upper"] - t_hi) <= 1e-4
    assert row["equivalent"] == (1 if t_lo > 1.644854 and t_hi < -1.644854 else 0)
    # structural: t_lower > t_upper always (margin > 0)
    assert row["t_lower"] > row["t_upper"]


def test_burstiness_twin(spark):
    qs = all_queries()
    rows = qs["text_burstiness"](spark, SF).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    n_docs = len(docs)
    tf, tf2, df = Counter(), Counter(), Counter()
    for (text,) in docs:
        cnts = Counter(text.split(" ") if text else [])
        for w, c in cnts.items():
            tf[w] += c
            tf2[w] += c * c
            df[w] += 1
    scored = [
        (round((n_docs * tf2[w] - tf[w] ** 2) / (n_docs * tf[w]), 6), w)
        for w in tf
        if tf[w] >= 10
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    expect = scored[:20]
    assert len(rows) == min(20, len(expect))
    for r, (fano, w) in zip(rows, expect):
        assert r["word"] == w
        assert abs(r["fano"] - fano) <= 2e-6
        assert r["df"] == df[w]
        assert r["tf"] == tf[w]
        assert r["fano"] > 0
