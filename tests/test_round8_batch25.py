"""Differential twins for the round-8 batch-25 operators."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"

_DAY_US = 86_400_000_000


def _daily():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, epoch_us(ts) // {_DAY_US}, COUNT(*)
            FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    daily = defaultdict(dict)
    for et, d, y in rows:
        daily[et][d] = y
    return daily


def _residuals(series):
    days = sorted(series)
    n = len(days)
    sd = sum(days)
    sy = sum(series[d] for d in days)
    sdy = sum(d * series[d] for d in days)
    sdd = sum(d * d for d in days)
    slope = (n * sdy - sd * sy) / (n * sdd - sd * sd)
    return [
        math.floor((series[d] - (sy / n + slope * (d - sd / n))) * 1e6)
        for d in days
    ]


def test_ljung_box_twin(spark):
    qs = all_queries()
    rows = {r["event_type"]: r for r in qs["agg_ljung_box"](spark, SF).collect()}
    for et, series in _daily().items():
        es = _residuals(series)
        n = len(es)
        c0 = sum(e * e for e in es)
        t_img = 0
        n_lags = 0
        for k in range(1, 8):
            if k >= n:
                continue
            ck = sum(es[i] * es[i - k] for i in range(k, n))
            rho = ck / c0
            t_img += math.floor(rho * rho / (n - k) * 1e12)
            n_lags += 1
        lb = n * (n + 2) * t_img / 1e12
        r = rows[et]
        assert r["n_days"] == n
        assert r["n_lags"] == n_lags
        assert abs(r["lb_stat"] - lb) <= 1e-4
        assert r["lb_stat"] >= 0


def test_bollinger_twin(spark):
    qs = all_queries()
    rows = {
        (r["event_type"], r["day"]): r
        for r in qs["win_bollinger_bands"](spark, SF).collect()
    }
    count = 0
    for et, series in _daily().items():
        days = sorted(series)
        for i in range(13, len(days)):
            win = [series[d] for d in days[i - 13 : i + 1]]
            n = 14
            s1, s2 = sum(win), sum(v * v for v in win)
            mid = s1 / n
            sd = math.sqrt((n * s2 - s1 * s1) / (n * n))
            lower = round(mid - 2 * sd, 6)
            upper = round(mid + 2 * sd, 6)
            y = series[days[i]]
            r = rows[(et, days[i])]
            count += 1
            assert r["y"] == y
            assert abs(r["mid"] - round(mid, 6)) <= 1e-9
            assert abs(r["lower"] - lower) <= 1e-9
            assert abs(r["upper"] - upper) <= 1e-9
            breach = 1 if y > upper else -1 if y < lower else 0
            assert r["breach"] == breach
    assert len(rows) == count


def test_markov_entropy_twin(spark):
    qs = all_queries()
    [row] = qs["agg_markov_entropy_rate"](spark, SF).collect()
    con = duckdb.connect()
    seq = con.execute(
        f"""SELECT user_id, event_type, epoch_us(ts), event_id
            FROM read_parquet('{SF}/events.parquet')
            ORDER BY user_id, epoch_us(ts), event_id"""
    ).fetchall()
    con.close()
    trans = Counter()
    by_user = defaultdict(list)
    for uid, et, t, eid in seq:
        by_user[uid].append(et)
    for acts in by_user.values():
        for a, b in zip(acts, acts[1:]):
            trans[(a, b)] += 1
    row_tot = Counter()
    for (a, _), c in trans.items():
        row_tot[a] += c
    n = sum(trans.values())
    total_img = 0
    for src, rc in row_tot.items():
        h_nano = sum(
            math.floor(-(c / rc) * math.log(c / rc) * 1e9)
            for (a, _), c in trans.items()
            if a == src
        )
        total_img += math.floor(rc / n * h_nano)
    assert row["n_transitions"] == n
    assert row["n_states"] == len(row_tot)
    assert abs(row["entropy_rate_nats"] - round(total_img / 1e9, 6)) <= 1e-9
    # bounded by ln(k) for a k-state chain
    assert 0.0 <= row["entropy_rate_nats"] <= math.log(5) + 1e-9
