"""Differential twins for the round-8 batch-24 operators."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"

_DAY_US = 86_400_000_000


def test_abc_analysis_twin(spark):
    qs = all_queries()
    rows = {r["abc_class"]: r for r in qs["agg_abc_analysis"](spark, SF).collect()}
    con = duckdb.connect()
    rev = con.execute(
        f"""SELECT l_partkey,
                   SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT))
            FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    rev.sort(key=lambda t: (-t[1], t[0]))
    t = sum(c for _, c in rev)
    agg = defaultdict(lambda: [0, 0])
    cum = 0
    for pk, c in rev:
        cls = "A" if cum * 100 < t * 80 else "B" if cum * 100 < t * 95 else "C"
        cum += c
        agg[cls][0] += 1
        agg[cls][1] += c
    for cls, (n, cents) in agg.items():
        r = rows[cls]
        assert r["n_parts"] == n
        assert abs(r["revenue"] - round(cents / 100, 2)) <= 1e-6
        assert abs(r["revenue_share"] - round(cents / t, 6)) <= 1e-9
    # Pareto shape: class A has far fewer parts per revenue dollar
    if "A" in rows and "C" in rows:
        a, c = rows["A"], rows["C"]
        assert a["revenue_share"] / a["n_parts"] > c["revenue_share"] / max(
            c["n_parts"], 1
        )


def test_new_returning_twin(spark):
    qs = all_queries()
    rows = {r["day"]: r for r in qs["agg_new_returning_split"](spark, SF).collect()}
    con = duckdb.connect()
    du = con.execute(
        f"""SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US}
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    con.close()
    first = {}
    for uid, d in du:
        if uid not in first or d < first[uid]:
            first[uid] = d
    per_day = defaultdict(lambda: [0, 0])
    for uid, d in du:
        a = per_day[d]
        a[0] += 1
        if d == first[uid]:
            a[1] += 1
    total_new = 0
    for d, (act, new) in per_day.items():
        r = rows[d]
        assert r["active_users"] == act
        assert r["new_users"] == new
        assert r["returning_users"] == act - new
        assert abs(r["new_ratio"] - round(new / act, 6)) <= 1e-9
        total_new += new
    # every user is new exactly once
    assert total_new == len(first)


def test_cluster_balance_twin(spark):
    qs = all_queries()
    [row] = qs["curation_cluster_balance"](spark, SF).collect()
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
    cnt = Counter(asg.tolist())
    n = len(X)
    k = len(cnt)
    h_nano = sum(
        math.floor(-(c / n) * math.log(c / n) * 1e9) for c in cnt.values()
    )
    assert row["n"] == n
    assert row["k"] == k
    assert abs(row["entropy"] - round(h_nano / 1e9, 6)) <= 1e-9
    assert abs(row["balance"] - round(h_nano / 1e9 / math.log(k), 6)) <= 1e-9
    assert 0.0 <= row["balance"] <= 1.0 + 1e-9
