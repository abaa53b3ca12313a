"""Differential twins for the round-8 batch-27 operators."""

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
        f"""SELECT user_id, event_type, epoch_us(ts)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    con.close()
    return rows


def test_wilcoxon_twin(spark):
    qs = all_queries()
    [row] = qs["agg_wilcoxon_signed_rank"](spark, SF).collect()
    data = _events()
    days = [t // _DAY_US for _, _, t in data]
    m = (min(days) + max(days) + 1) // 2
    per_user = Counter()
    for uid, _, t in data:
        per_user[uid] += 1 if t // _DAY_US >= m else -1
    ds = [d for d in per_user.values() if d != 0]
    n = len(ds)
    # midranks of |d|
    by_ad = Counter(abs(d) for d in ds)
    rank2 = {}
    run = 0
    for ad in sorted(by_ad):
        t = by_ad[ad]
        rank2[ad] = 2 * run + t + 1  # doubled midrank
        run += t
    w2 = sum(rank2[abs(d)] for d in ds if d > 0)
    ties = sum(t**3 - t for t in by_ad.values())
    z = (w2 / 2.0 - n * (n + 1) / 4) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - ties / 48
    )
    assert row["n_pairs"] == n
    assert abs(row["w_plus"] - w2 / 2.0) <= 1e-9
    assert abs(row["z"] - z) <= 1e-5


def test_sprt_twin(spark):
    qs = all_queries()
    rows = {r["day"]: r for r in qs["agg_sprt_replay"](spark, SF).collect()}
    daily = defaultdict(lambda: [0, 0])
    for _, et, t in _events():
        d = daily[t // _DAY_US]
        d[1] += 1
        if et == "purchase":
            d[0] += 1
    l1 = math.floor(math.log(0.25 / 0.20) * 1e9)
    l0 = math.floor(math.log(0.75 / 0.80) * 1e9)
    upper = math.floor(math.log(0.95 / 0.05) * 1e9)
    lower = math.floor(math.log(0.05 / 0.95) * 1e9)
    cum = 0
    first = -1
    for day in sorted(daily):
        x, n = daily[day]
        cum += x * l1 + (n - x) * l0
        dec = (
            "accept_h1"
            if cum >= upper
            else "accept_h0"
            if cum <= lower
            else "continue"
        )
        if dec != "continue" and first == -1:
            first = day
    cum = 0
    for day in sorted(daily):
        x, n = daily[day]
        cum += x * l1 + (n - x) * l0
        r = rows[day]
        assert r["purchases"] == x
        assert r["events"] == n
        assert abs(r["cum_llr"] - round(cum / 1e9, 6)) <= 1e-9
        dec = (
            "accept_h1"
            if cum >= upper
            else "accept_h0"
            if cum <= lower
            else "continue"
        )
        assert r["decision"] == dec
        assert r["first_decision_day"] == first
    # the synthetic share is ~0.20, so H0 should win if anything decides
    decided = {r["decision"] for r in rows.values()} - {"continue"}
    assert decided <= {"accept_h0"}
