"""Differential twins for the round-8 batch-15 operators."""

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


def test_psi_twin(spark):
    """Recount PSI with the same decile-edge, smoothing, and flooring
    conventions."""
    qs = all_queries()
    rows = qs["dq_psi"](spark, SF).collect()
    data = [(t // _DAY_US, math.floor(v * 1e6)) for _, _, t, v in _events()]
    days = [d for d, _ in data]
    m = (min(days) + max(days) + 1) // 2
    ref = sorted(img for d, img in data if d < m)
    cur = [img for d, img in data if d >= m]
    n = len(ref)
    edges = []
    for k in range(1, 10):
        # smallest img with 10*cum >= k*n
        idx = math.ceil(k * n / 10) - 1
        edges.append(ref[idx])
    def bin_of(img):
        return sum(1 for e in edges if img > e)
    rc, cc = Counter(map(bin_of, ref)), Counter(map(bin_of, cur))
    bins = sorted(set(rc) | set(cc))
    nr, nc = len(ref), len(cur)
    total_nano = 0
    expect = {}
    for b in bins:
        p_r = (rc.get(b, 0) + 1) / (nr + 10)
        p_c = (cc.get(b, 0) + 1) / (nc + 10)
        t_nano = math.floor((p_c - p_r) * math.log(p_c / p_r) * 1e9)
        total_nano += t_nano
        expect[b] = (rc.get(b, 0), cc.get(b, 0), t_nano)
    got = {r["bin"]: r for r in rows}
    assert set(got) == set(expect)
    for b, (r_n, c_n, t_nano) in expect.items():
        assert got[b]["n_ref"] == r_n
        assert got[b]["n_cur"] == c_n
        assert abs(got[b]["psi_term"] - round(t_nano / 1e9, 6)) <= 1e-9
        assert abs(got[b]["psi_total"] - round(total_nano / 1e9, 6)) <= 1e-9
    # PSI is non-negative by Gibbs' inequality (up to flooring slack)
    assert rows[0]["psi_total"] >= -len(bins) / 1e9 - 1e-6


def test_lift_gains_twin(spark):
    qs = all_queries()
    rows = {r["decile"]: r for r in qs["agg_lift_gains"](spark, SF).collect()}
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, embedding, label FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    import numpy as np

    w = np.array(
        [((((i + 17) * 2654435761) % 1000003) % 97 - 48) / 48.0 for i in range(1, 65)]
    )
    scored = []
    for vid, e, lab in data:
        p = 1.0 / (1.0 + math.exp(-float(np.array([float(x) for x in e]) @ w)))
        scored.append((math.floor(p * 1e18), vid, lab % 2))
    scored.sort(key=lambda t: (-t[0], -t[1]))  # p DESC, vec_id DESC
    n = len(scored)
    per_dec = defaultdict(lambda: [0, 0])
    for rd, (_, _, y) in enumerate(scored, start=1):
        d = (rd - 1) * 10 // n + 1
        per_dec[d][0] += 1
        per_dec[d][1] += y
    p_tot = sum(v[1] for v in per_dec.values())
    cum = 0
    for d in sorted(per_dec):
        n_d, pos_d = per_dec[d]
        cum += pos_d
        r = rows[d]
        assert r["n"] == n_d
        assert r["n_pos"] == pos_d
        lift = math.floor(pos_d * n / (n_d * p_tot) * 1e6) / 1e6
        gain = math.floor(cum / p_tot * 1e6) / 1e6
        assert abs(r["lift"] - lift) <= 1e-9
        assert abs(r["cum_gain"] - gain) <= 1e-9
    # gains are monotone and end at ~1
    assert abs(rows[max(rows)]["cum_gain"] - 1.0) <= 2e-6


def test_seasonality_strength_twin(spark):
    qs = all_queries()
    rows = {
        r["event_type"]: r
        for r in qs["ts_seasonality_strength"](spark, SF).collect()
    }
    daily = defaultdict(Counter)
    for _, et, t, _ in _events():
        daily[et][t // _DAY_US] += 1
    for et, cnts in daily.items():
        days = sorted(cnts)
        series = [(d, cnts[d]) for d in days]
        imgs = []
        # 7-day centered MA over POSITIONS (rows-between window semantics)
        for i, (d, y) in enumerate(series):
            if i < 3 or i >= len(series) - 3:
                continue
            s7 = sum(series[j][1] for j in range(i - 3, i + 4))
            imgs.append((d, y, s7))
        sea = defaultdict(lambda: [0, 0, 0])  # sum_y, sum_s7, n
        for d, y, s7 in imgs:
            a = sea[d % 7]
            a[0] += y
            a[1] += s7
            a[2] += 1
        s_dow = {k: (7 * a[0] - a[1]) / (7.0 * a[2]) for k, a in sea.items()}
        r_l, d_l, t_l = [], [], []
        for d, y, s7 in imgs:
            d_dbl = (7 * y - s7) / 7.0
            r_l.append(math.floor((d_dbl - s_dow[d % 7]) * 1e6))
            d_l.append(math.floor(d_dbl * 1e6))
            t_l.append(math.floor((y - s_dow[d % 7]) * 1e6))
        n = len(r_l)

        def var_ss(xs):
            return n * sum(x * x for x in xs) - sum(xs) ** 2

        f_seas = max(0.0, 1.0 - var_ss(r_l) / var_ss(d_l))
        f_trend = max(0.0, 1.0 - var_ss(r_l) / var_ss(t_l))
        r = rows[et]
        assert r["n_days"] == n
        assert abs(r["f_seasonal"] - f_seas) <= 2e-6
        assert abs(r["f_trend"] - f_trend) <= 2e-6
        assert 0.0 <= r["f_seasonal"] <= 1.0
        assert 0.0 <= r["f_trend"] <= 1.0
