"""Differential twins for the round-8 batch-9 hypothesis tests."""

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


def test_kruskal_wallis_twin(spark):
    """Brute-force H with true average ranks (midranks) in Python —
    the engine's prefix-sum form must agree to rounding."""
    qs = all_queries()
    [row] = qs["agg_kruskal_wallis"](spark, SF).collect()
    rows = _events()
    imgs = [(math.floor(v * 1e6), et) for _, et, _, v in rows]
    n = len(imgs)
    by_val = Counter(img for img, _ in imgs)
    # midrank of each distinct value
    rank = {}
    run = 0
    for img in sorted(by_val):
        t = by_val[img]
        rank[img] = run + (t + 1) / 2.0
        run += t
    rsum = defaultdict(float)
    cnt = Counter()
    for img, et in imgs:
        rsum[et] += rank[img]
        cnt[et] += 1
    s = sum(r * r / cnt[g] for g, r in rsum.items())
    h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
    ties = sum(t**3 - t for t in by_val.values())
    hc = h / (1.0 - ties / (n**3 - n))
    assert row["n"] == n
    assert row["k"] == len(cnt)
    # the engine floors each (2R)^2/n1 term at whole units: error per
    # group < 1 -> error in H < 3*k/(N(N+1)); allow that plus rounding
    tol = 3.0 * len(cnt) / (n * (n + 1)) + 2e-6
    assert abs(row["h"] - h) <= tol
    assert abs(row["h_tie_corrected"] - hc) <= tol * 1.1


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
    subj = []
    for uid in t0:
        if uid in tp:
            subj.append((uid % 2, (tp[uid] - t0[uid]) // _DAY_US, 1))
        else:
            subj.append((uid % 2, (tl[uid] - t0[uid]) // _DAY_US, 0))
    return subj


def test_logrank_twin(spark):
    """Textbook log-rank recount (exact rational E/V, no micro-unit
    flooring) — the engine's floored-term sums must agree to the
    accumulated flooring slack (< 1e-6 per day-row)."""
    qs = all_queries()
    [row] = qs["agg_logrank_test"](spark, SF).collect()
    subj = _km_subjects()
    days = sorted({d for _, d, _ in subj})
    o1 = e1 = v = 0.0
    for day in days:
        n = sum(1 for _, d, _ in subj if d >= day)
        n1 = sum(1 for g, d, _ in subj if d >= day and g == 1)
        d_tot = sum(1 for _, d, died in subj if d == day and died)
        d1 = sum(1 for g, d, died in subj if d == day and died and g == 1)
        o1 += d1
        if d_tot > 0:
            e1 += d_tot * n1 / n
            if n > 1:
                v += d_tot * (n1 / n) * ((n - n1) / n) * ((n - d_tot) / (n - 1))
    slack = len(days) * 1e-6 + 2e-6
    assert row["o1"] == o1
    assert abs(row["e1"] - e1) <= slack
    assert abs(row["v"] - v) <= slack
    z = (o1 - e1) / math.sqrt(v)
    assert abs(row["z"] - z) <= 1e-3  # z divides two floored sums
    assert abs(row["chi2"] - z * z) <= 2e-3


def test_logrank_groups_cover_all_signups(spark):
    """Subject bookkeeping: O1 <= total purchases-after-signup of odd
    users, and the chi2 is the square of z (structural)."""
    qs = all_queries()
    [row] = qs["agg_logrank_test"](spark, SF).collect()
    subj = _km_subjects()
    assert row["o1"] == sum(1 for g, _, died in subj if g == 1 and died)
    assert abs(row["chi2"] - row["z"] ** 2) <= 2e-5


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


def test_mcnemar_twin(spark):
    qs = all_queries()
    [row] = qs["agg_mcnemar_test"](spark, SF).collect()
    rows = _events()
    b = c = 0
    for _, et, _, v in rows:
        ca = _pred(v, 0) == et
        cb = _pred(v, 50) == et
        b += ca and not cb
        c += cb and not ca
    assert row["n"] == len(rows)
    assert row["b"] == b
    assert row["c"] == c
    if b + c:
        assert abs(row["chi2_mcnemar"] - (abs(b - c) - 1) ** 2 / (b + c)) <= 1e-6
    else:
        assert row["chi2_mcnemar"] == 0.0
