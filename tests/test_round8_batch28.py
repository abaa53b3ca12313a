"""Differential twins for the round-8 batch-28 operators."""

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


def test_kendall_w_twin(spark):
    """W must equal chi2_F / (n(k-1)) and agree with the registered
    Friedman statistic."""
    qs = all_queries()
    [row] = qs["agg_kendall_w"](spark, SF).collect()
    [fr] = qs["agg_friedman_test"](spark, SF).collect()
    n, k = row["n_blocks"], row["k_treatments"]
    assert (n, k) == (fr["n_blocks"], fr["k_treatments"])
    assert abs(row["friedman_chi2"] - fr["friedman_chi2"]) <= 1e-9
    assert abs(row["kendall_w"] - row["friedman_chi2"] / (n * (k - 1))) <= 1e-6
    assert 0.0 <= row["kendall_w"] <= 1.0 + 1e-9


def test_drawdown_twin(spark):
    qs = all_queries()
    rows = {r["event_type"]: r for r in qs["win_drawdown_max"](spark, SF).collect()}
    for et, series in _daily().items():
        days = sorted(series)
        peak = -1
        best = (-1, None)
        for d in days:
            peak = max(peak, series[d])
            dd = peak - series[d]
            if dd > best[0]:
                best = (dd, d)
        r = rows[et]
        assert r["max_drawdown"] == best[0]
        assert r["at_day"] == best[1]
        assert r["max_drawdown"] >= 0


def test_cohort_half_life_twin(spark):
    qs = all_queries()
    rows = {
        r["cohort_day"]: r
        for r in qs["agg_cohort_half_life"](spark, SF).collect()
    }
    # reconcile against the registered retention triangle
    grid = defaultdict(dict)
    for r in qs["agg_retention_cohorts"](spark, SF).collect():
        grid[r["cohort_day"]][r["day_offset"]] = r["n_users"]
    assert set(rows) == set(grid)
    for cd, offsets in grid.items():
        n0 = offsets[0]
        half = min(
            (o for o, n in offsets.items() if o > 0 and 2 * n < n0),
            default=-1,
        )
        r = rows[cd]
        assert r["cohort_size"] == n0
        assert r["half_life_days"] == half
