"""Differential / property twins for round-10 batch 19."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"
WEEK_US = 7 * 86_400_000_000


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def test_wow_growth_twin(spark):
    ev = _fetch(
        f"SELECT event_type, epoch_us(ts) // {WEEK_US}"
        f" FROM read_parquet('{SF}/events.parquet')"
    )
    weekly = Counter(ev)
    per_type = defaultdict(dict)
    for (et, wk), n in weekly.items():
        per_type[et][wk] = n
    def trunc_div(a, b):
        # both engines' integer division truncates toward zero (probed:
        # Spark DIV and DuckDB // give -7/2 -> -3)
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    expect = []
    for et in sorted(per_type):
        prev = None
        for wk in sorted(per_type[et]):
            n = per_type[et][wk]
            perm = (
                None
                if prev is None or prev == 0
                else trunc_div(1000 * (n - prev), prev)
            )
            expect.append(
                (et, wk, n, prev, perm, None if prev is None else n > prev)
            )
            prev = n
    rows = [
        (r["event_type"], r["week"], r["n"], r["prev_n"], r["wow_permille"], r["grew"])
        for r in all_queries()["ts_week_over_week_growth"](spark, SF).collect()
    ]
    assert rows == expect


def test_budget_allocation_properties(spark):
    """Identities the allocation must satisfy regardless of utilities."""
    rows = all_queries()["curation_budget_by_utility"](spark, SF).collect()
    total = sum(r["alloc_tokens"] for r in rows)
    assert total <= 1_000_000
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["tokens"]
        if r["utility_x1e6"] == 0:
            assert r["alloc_tokens"] == 0
    # allocations follow utility ordering up to the per-source caps
    uncapped = [r for r in rows if r["alloc_tokens"] < r["tokens"]]
    us = sorted(uncapped, key=lambda r: r["utility_x1e6"])
    for a, b in zip(us, us[1:]):
        assert a["alloc_tokens"] <= b["alloc_tokens"] + 1
    # the budget is actually spent when positive-utility capacity allows
    cap = sum(r["tokens"] for r in rows if r["utility_x1e6"] > 0)
    assert total >= min(1_000_000, cap) - len(rows)


def test_budget_reconciles_with_influence(spark):
    """Clipped utilities must equal curation_loo_influence's numbers."""
    infl = {
        r["source"]: max(r["influence_x1e6"], 0)
        for r in all_queries()["curation_loo_influence"](spark, SF).collect()
    }
    rows = {
        r["source"]: r["utility_x1e6"]
        for r in all_queries()["curation_budget_by_utility"](spark, SF).collect()
    }
    assert rows == infl
