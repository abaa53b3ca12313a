"""Differential twins for the round-8 batch-17 operators."""

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


def test_mann_kendall_twin(spark):
    qs = all_queries()
    rows = {r["event_type"]: r for r in qs["agg_mann_kendall"](spark, SF).collect()}
    daily = defaultdict(Counter)
    for _, et, t, _ in _events():
        daily[et][t // _DAY_US] += 1
    for et, cnts in daily.items():
        days = sorted(cnts)
        ys = [cnts[d] for d in days]
        n = len(ys)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += (ys[j] > ys[i]) - (ys[j] < ys[i])
        ties = Counter(ys)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        s_cc = s - 1 if s > 0 else s + 1 if s < 0 else 0
        z = s_cc / math.sqrt(var_s)
        r = rows[et]
        assert r["n_days"] == n
        assert r["s"] == s
        assert abs(r["var_s"] - var_s) <= 2e-6
        assert abs(r["z"] - z) <= 1e-5


def test_mann_kendall_sen_agreement(spark):
    """Cross-op: a clearly significant MK trend (|z| > 2.5) must agree
    in sign with the Theil-Sen slope for the same series."""
    qs = all_queries()
    mk = {r["event_type"]: r for r in qs["agg_mann_kendall"](spark, SF).collect()}
    ts = {r["event_type"]: r for r in qs["ts_theil_sen"](spark, SF).collect()}
    assert set(mk) == set(ts)
    for et in mk:
        if abs(mk[et]["z"]) > 2.5 and abs(ts[et]["theil_sen_slope"]) > 1e-6:
            assert (mk[et]["z"] > 0) == (ts[et]["theil_sen_slope"] > 0)


def test_peak_concurrency_twin(spark):
    qs = all_queries()
    [row] = qs["win_peak_concurrency"](spark, SF).collect()
    data = _events()
    t0 = {}
    for uid, et, t, _ in data:
        if et == "signup" and (uid not in t0 or t < t0[uid]):
            t0[uid] = t
    tp, tl = {}, {}
    for uid, et, t, _ in data:
        if uid not in t0:
            continue
        if et == "purchase" and t > t0[uid]:
            if uid not in tp or t < tp[uid]:
                tp[uid] = t
        if uid not in tl or t > tl[uid]:
            tl[uid] = t
    bounds = []
    n_iv = 0
    for uid, start in t0.items():
        end = tp.get(uid, tl[uid])
        if end > start:
            n_iv += 1
            bounds.append((start * 2 + 1, 1))
            bounds.append((end * 2, -1))
    agg = Counter()
    for k, d in bounds:
        agg[k] += d
    run = 0
    peak = 0
    peak_at = None
    for k in sorted(agg):
        run += agg[k]
        if run > peak:
            peak = run
            peak_at = k // 2
    assert row["n_intervals"] == n_iv
    assert row["peak"] == peak
    assert row["peak_at_us"] == peak_at
    assert 0 < peak <= n_iv


def test_doubly_robust_twin(spark):
    qs = all_queries()
    [row] = qs["eval_doubly_robust"](spark, SF).collect()
    [ips_row] = qs["eval_ips_snips"](spark, SF).collect()
    pi = ["view", "click", "signup", "purchase", "error"]
    per_act = defaultdict(lambda: [0, 0, 0, 0])  # n, tot_r, m, sr
    n_pi = Counter()
    for uid, et, _, v in _events():
        a = per_act[et]
        r = math.floor(v * 1e6)
        a[0] += 1
        a[1] += r
        p = pi[uid % 5]
        n_pi[p] += 1
        if p == et:
            a[2] += 1
            a[3] += r
    n = sum(a[0] for a in per_act.values())
    dm = sum(
        math.floor(n_pi.get(act, 0) * a[1] / a[0]) for act, a in per_act.items()
    )
    ips = sum(math.floor(a[3] / a[0]) for a in per_act.values())
    corr = sum(math.floor(a[2] * a[1] / (a[0] * a[0])) for a in per_act.values())
    assert row["n"] == n
    assert abs(row["dm_value"] - round(dm / n / 1e6, 6)) <= 1e-9
    assert abs(row["ips_value"] - round(ips / 1e6, 6)) <= 1e-9
    assert abs(row["dr_value"] - round((dm / n + ips - corr) / 1e6, 6)) <= 1e-9
    # the IPS leg must agree with eval_ips_snips' (same convention)
    assert abs(row["ips_value"] - ips_row["ips_value"]) <= 1e-9
