"""Differential twins for the round-8 batch-20 operators."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _events():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, value
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    con.close()
    return rows


def test_cohens_d_twin(spark):
    qs = all_queries()
    rows = {r["event_type"]: r for r in qs["agg_cohens_d"](spark, SF).collect()}
    g = defaultdict(lambda: [0, 0, 0])
    for et, v in _events():
        img = math.floor(v * 1e6)
        a = g[et]
        a[0] += 1
        a[1] += img
        a[2] += img * img
    tn = sum(a[0] for a in g.values())
    ts1 = sum(a[1] for a in g.values())
    ts2 = sum(a[2] for a in g.values())
    for et, (n, s1, s2) in g.items():
        n2 = tn - n
        m1 = s1 / (n * 1e6)
        m2 = (ts1 - s1) / (n2 * 1e6)
        ss1 = (n * s2 - s1 * s1) / (n * 1e12)
        ss2 = (n2 * (ts2 - s2) - (ts1 - s1) ** 2) / (n2 * 1e12)
        sp = math.sqrt((ss1 + ss2) / (n + n2 - 2))
        d = (m1 - m2) / sp
        gg = d * (1.0 - 3.0 / (4.0 * (n + n2) - 9.0))
        r = rows[et]
        assert r["n1"] == n and r["n2"] == n2
        assert abs(r["cohens_d"] - d) <= 2e-6
        assert abs(r["hedges_g"] - gg) <= 2e-6
        # |g| < |d| always (the correction shrinks)
        assert abs(r["hedges_g"]) <= abs(r["cohens_d"]) + 1e-9


def test_calinski_harabasz_twin(spark):
    qs = all_queries()
    [row] = qs["emb_calinski_harabasz"](spark, SF).collect()
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    con.close()
    X = np.array([[float(x) for x in e] for _, e in data])
    cents = X[:4].copy()
    for _ in range(3):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        asg = d2.argmin(axis=1)
        for c in range(4):
            if (asg == c).any():
                cents[c] = X[asg == c].mean(axis=0)
    d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    asg = d2.argmin(axis=1)
    n, k = len(X), len(set(asg))
    wss_img = sum(math.floor(d2[i, asg[i]] * 1e6) for i in range(n))
    gm = X.mean(axis=0)
    bss_img = 0
    for c in range(4):
        members = (asg == c).sum()
        if members:
            cd = math.sqrt(((cents[c] - gm) ** 2).sum()) ** 2
            bss_img += math.floor(members * cd * 1e6)
    ch = (bss_img / (k - 1)) / (wss_img / (n - k))
    assert row["n"] == n and row["k"] == k
    assert abs(row["within_ss"] - round(wss_img / 1e6, 6)) <= 2e-6
    assert abs(row["between_ss"] - round(bss_img / 1e6, 6)) <= 2e-6
    assert abs(row["ch_index"] - ch) <= max(1e-4, ch * 1e-5)
    assert row["ch_index"] > 0


def test_levene_bf_twin(spark):
    qs = all_queries()
    [row] = qs["agg_levene_bf"](spark, SF).collect()
    by = defaultdict(list)
    for et, v in _events():
        by[et].append(math.floor(v * 1e6))
    zs = {}
    for et, imgs in by.items():
        imgs.sort()
        med = imgs[math.ceil(len(imgs) / 2) - 1]
        zs[et] = [abs(x - med) for x in imgs]
    k = len(zs)
    tn = sum(len(z) for z in zs.values())
    gs1 = sum(sum(z) for z in zs.values())
    bterm_img = sum(
        math.floor(sum(z) ** 2 / len(z) / 1e6) for z in zs.values()
    )
    ss_tot = sum(sum(x * x for x in z) for z in zs.values())
    between = (bterm_img / 1e6 - gs1 * gs1 / tn / 1e12) / (k - 1)
    within = (ss_tot / 1e12 - bterm_img / 1e6 / 1e6) / (tn - k)
    f = between / within
    assert row["n_total"] == tn
    assert row["k"] == k
    assert abs(row["f_stat"] - f) <= max(1e-4, f * 1e-5)
    assert row["f_stat"] >= 0
