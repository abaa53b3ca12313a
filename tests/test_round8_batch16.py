"""Differential twins for the round-8 batch-16 operators."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import numpy as np

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"

_DAY_US = 86_400_000_000


def _kmeans_fit_numpy():
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = [v for v, _ in data]
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
    return ids, X, cents, asg, d2


def test_silhouette_twin(spark):
    qs = all_queries()
    rows = {r["cluster_id"]: r for r in qs["emb_silhouette"](spark, SF).collect()}
    _, X, cents, asg, d2 = _kmeans_fit_numpy()
    d = np.sqrt(d2)
    sums = defaultdict(int)
    counts = defaultdict(int)
    for i in range(len(X)):
        own = asg[i]
        a = d[i, own]
        b = min(d[i, j] for j in range(4) if j != own)
        sums[own] += math.floor((b - a) / max(a, b) * 1e6)
        counts[own] += 1
    for c in counts:
        r = rows[c]
        assert r["n"] == counts[c]
        expect = round(sums[c] / (1e6 * counts[c]), 6)
        assert abs(r["mean_silhouette"] - expect) <= 2e-6
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_davies_bouldin_twin(spark):
    qs = all_queries()
    rows = {
        r["cluster_id"]: r for r in qs["emb_davies_bouldin"](spark, SF).collect()
    }
    _, X, cents, asg, d2 = _kmeans_fit_numpy()
    d = np.sqrt(d2)
    s = {}
    n = {}
    for c in range(4):
        members = [i for i in range(len(X)) if asg[i] == c]
        if not members:
            continue
        n[c] = len(members)
        s[c] = sum(math.floor(d[i, c] * 1e6) for i in members) / (
            1e6 * len(members)
        )
    terms = {}
    for i in s:
        terms[i] = max(
            (s[i] + s[j])
            / math.sqrt(((cents[i] - cents[j]) ** 2).sum())
            for j in s
            if j != i
        )
    db = sum(terms.values()) / len(terms)
    for c, r in rows.items():
        assert r["n"] == n[c]
        assert abs(r["scatter"] - s[c]) <= 2e-6
        assert abs(r["db_term"] - terms[c]) <= 1e-4
        assert abs(r["db_index"] - db) <= 1e-4
        assert r["db_term"] > 0


def test_mase_twin(spark):
    qs = all_queries()
    rows = {r["event_type"]: r for r in qs["ts_backtest_mase"](spark, SF).collect()}
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, COUNT(*)
            FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    daily = defaultdict(dict)
    for et, day, y in data:
        daily[et][day] = y
    for et, series in daily.items():
        days = sorted(series)
        cutoff = max(days) - 6
        train = [(d, series[d]) for d in days if d < cutoff]
        test = [(d, series[d]) for d in days if d >= cutoff]
        n = len(train)
        sd = sum(d for d, _ in train)
        sy = sum(y for _, y in train)
        sdy = sum(d * y for d, y in train)
        sdd = sum(d * d for d, _ in train)
        slope = (n * sdy - sd * sy) / (n * sdd - sd * sd)
        num = sum(
            math.floor(abs(y - (sy / n + slope * (d - sd / n))) * 1e6)
            for d, y in test
        )
        pairs = [
            (series[d], series[d - 7])
            for d in days
            if d < cutoff and (d - 7) in series
        ]
        sum_abs = sum(abs(a - b) for a, b in pairs)
        mae_f = num / 1e6 / len(test)
        mae_n = sum_abs / len(pairs)
        r = rows[et]
        assert r["n_test"] == len(test)
        assert r["n_naive_pairs"] == len(pairs)
        assert abs(r["mae_forecast"] - mae_f) <= 2e-6
        assert abs(r["mae_naive"] - mae_n) <= 2e-6
        assert abs(r["mase"] - mae_f / mae_n) <= 1e-4
        assert r["mase"] >= 0
