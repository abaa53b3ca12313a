"""Differential twins for the round-8 batch-22 operators."""

from __future__ import annotations

import math
from collections import defaultdict

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


def test_rolling_corr_twin(spark):
    qs = all_queries()
    rows = {r["day"]: r for r in qs["win_rolling_corr"](spark, SF).collect()}
    daily = defaultdict(lambda: [0, 0])
    for _, et, t, _ in _events():
        if et in ("view", "click"):
            d = daily[t // _DAY_US]
            d[0 if et == "view" else 1] += 1
    days = sorted(daily)
    for i in range(13, len(days)):
        win = days[i - 13 : i + 1]
        xs = [daily[d][0] for d in win]
        ys = [daily[d][1] for d in win]
        n = 14
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        r = rows[days[i]]
        assert r["n_window"] == 14
        if vx * vy <= 0:
            assert r["rolling_r"] is None
        else:
            expect = (n * sxy - sx * sy) / math.sqrt(vx * vy)
            assert abs(r["rolling_r"] - expect) <= 2e-6
            assert -1.0 <= r["rolling_r"] <= 1.0
    assert len(rows) == max(0, len(days) - 13)


def test_hodges_lehmann_twin(spark):
    qs = all_queries()
    [row] = qs["agg_hodges_lehmann_shift"](spark, SF).collect()
    daily = defaultdict(lambda: [0, 0])
    for uid, _, t, _ in _events():
        daily[t // _DAY_US][uid % 2] += 1
    odds = [v[1] for v in daily.values()]
    evens = [v[0] for v in daily.values()]
    diffs = sorted(o - e for o in odds for e in evens)
    np_ = len(diffs)
    lo = diffs[(np_ + 1) // 2 - 1]
    hi = diffs[np_ // 2]
    assert row["n_pairs"] == np_
    assert abs(row["hl_shift"] - (lo + hi) / 2.0) <= 1e-9
    # HL is a median of differences: bounded by the extremes
    assert diffs[0] <= row["hl_shift"] <= diffs[-1]


def test_decay_score_twin(spark):
    qs = all_queries()
    rows = qs["feat_decay_score"](spark, SF).collect()
    data = _events()
    t_max = max(t for _, _, t, _ in data)
    scores = defaultdict(lambda: [0, 0])
    for uid, _, t, v in data:
        age_days = (t_max - t) / _DAY_US
        img = math.floor(v * math.exp(-0.6931471805599453 * age_days / 7.0) * 1e6)
        s = scores[uid]
        s[0] += 1
        s[1] += img
    top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    assert len(rows) == min(20, len(top))
    for r, (uid, (n, s_img)) in zip(rows, top):
        assert r["user_id"] == uid
        assert r["n_events"] == n
        assert abs(r["decay_score"] - round(s_img / 1e6, 6)) <= 1e-9
    # decay never exceeds the raw value sum
    raw = defaultdict(float)
    for uid, _, _, v in data:
        raw[uid] += v
    for r in rows:
        assert r["decay_score"] <= raw[r["user_id"]] + 1e-6
