"""Differential twins for the round-8 batch-14 operators."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"

_GRID = [d * 10**b for b in range(4, 9) for d in range(1, 10)]


def _events():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_id, user_id, event_type, epoch_us(ts), value
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    con.close()
    return rows


def test_asof_nearest_twin(spark):
    qs = all_queries()
    rows = {
        r["event_id"]: r for r in qs["join_asof_nearest"](spark, SF).collect()
    }
    data = _events()
    signups = defaultdict(list)
    for _, uid, et, t, _ in data:
        if et == "signup":
            signups[uid].append(t)
    n_err = 0
    for eid, uid, et, t, _ in data:
        if et != "error":
            continue
        n_err += 1
        prevs = [s for s in signups[uid] if s <= t]
        nexts = [s for s in signups[uid] if s > t]
        prev_t = max(prevs) if prevs else None
        next_t = min(nexts) if nexts else None
        r = rows[eid]
        if prev_t is None and next_t is None:
            assert r["nearest_signup_us"] is None and r["delta_us"] is None
        elif prev_t is None:
            assert r["nearest_signup_us"] == next_t
            assert r["delta_us"] == next_t - t
        elif next_t is None:
            assert r["nearest_signup_us"] == prev_t
            assert r["delta_us"] == t - prev_t
        elif t - prev_t <= next_t - t:
            assert r["nearest_signup_us"] == prev_t
            assert r["delta_us"] == t - prev_t
        else:
            assert r["nearest_signup_us"] == next_t
            assert r["delta_us"] == next_t - t
    assert len(rows) == n_err


def test_asof_nearest_bounds_backward_asof(spark):
    """Cross-op: the nearest match is at most as far as the backward
    as-of match for every error event that has a prior signup."""
    qs = all_queries()
    near = {r["event_id"]: r for r in qs["join_asof_nearest"](spark, SF).collect()}
    back = {r["event_id"]: r for r in qs["join_asof"](spark, SF).collect()}
    assert set(near) == set(back)


def _stump_counts(data):
    cells = {}
    for thr in _GRID:
        for fold in range(5):
            cells[(thr, fold)] = [0, 0, 0, 0]  # nl, pl, n, p
    for eid, _, et, _, v in data:
        img = math.floor(v * 1e6)
        y = 1 if et == "purchase" else 0
        fold = eid % 5
        for thr in _GRID:
            c = cells[(thr, fold)]
            if img < thr:
                c[0] += 1
                c[1] += y
            c[2] += 1
            c[3] += y
    return cells


def _gini(nl, pl, n, p):
    if nl == 0 or n - nl == 0:
        return 2.0
    gl = 1.0 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
    gr = (
        1.0
        - ((p - pl) / (n - nl)) ** 2
        - (((n - nl) - (p - pl)) / (n - nl)) ** 2
    )
    return round((nl * gl + (n - nl) * gr) / n, 9)


def test_stump_cv_twin(spark):
    qs = all_queries()
    rows = {r["fold"]: r for r in qs["ml_stump_cv"](spark, SF).collect()}
    data = _events()
    cells = _stump_counts(data)
    for fold in range(5):
        best = None
        for thr in _GRID:
            nl = sum(cells[(thr, f)][0] for f in range(5) if f != fold)
            pl = sum(cells[(thr, f)][1] for f in range(5) if f != fold)
            n = sum(cells[(thr, f)][2] for f in range(5) if f != fold)
            p = sum(cells[(thr, f)][3] for f in range(5) if f != fold)
            g = _gini(nl, pl, n, p)
            key = math.floor(g * 1e9) * 1_000_000 + thr // 1000
            if best is None or key < best[0]:
                best = (key, thr, g, 2 * pl > nl, 2 * (p - pl) > (n - nl))
        _, thr, g, left_pos, right_pos = best
        hnl, hpl, hn, hp = cells[(thr, fold)]
        correct = (hpl if left_pos else hnl - hpl) + (
            hp - hpl if right_pos else (hn - hnl) - (hp - hpl)
        )
        r = rows[fold]
        assert abs(r["threshold"] - thr / 1e6) < 1e-9
        assert abs(r["train_gini"] - g) <= 2e-9
        assert r["n_holdout"] == hn
        assert abs(r["holdout_accuracy"] - round(correct / hn, 6)) <= 1e-9
        # held-out accuracy of a 1-split model: sane bounds
        assert 0.0 <= r["holdout_accuracy"] <= 1.0


def test_outlier_iqr_twin(spark):
    qs = all_queries()
    rows = {r["event_type"]: r for r in qs["dq_outlier_iqr"](spark, SF).collect()}
    by_type = defaultdict(list)
    for _, _, et, _, v in _events():
        by_type[et].append(math.floor(v * 1e6))
    for et, imgs in by_type.items():
        imgs.sort()
        n = len(imgs)
        p25 = imgs[math.ceil(n / 4) - 1]
        p75 = imgs[math.ceil(3 * n / 4) - 1]
        lo2, hi2 = 5 * p25 - 3 * p75, 5 * p75 - 3 * p25
        n_out = sum(1 for x in imgs if 2 * x < lo2 or 2 * x > hi2)
        r = rows[et]
        assert r["n"] == n
        assert abs(r["p25"] - p25 / 1e6) < 1e-9
        assert abs(r["p75"] - p75 / 1e6) < 1e-9
        assert abs(r["iqr"] - (p75 - p25) / 1e6) < 1e-9
        assert r["n_outliers"] == n_out
        assert abs(r["outlier_rate"] - round(n_out / n, 6)) <= 1e-9
