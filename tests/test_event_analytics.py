"""Semantic tests for event_analytics.py — pure-Python differential twins
over the same parquet plus the invariants each operator promises. Oracle
parity is covered by tests/test_contract.py."""

from __future__ import annotations

from collections import defaultdict

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def test_funnel_matches_python_twin(spark, sf_dir):
    row = all_queries()["funnel_conversion"](spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    n_view = n_click = n_full = 0
    for _, g in ev.groupby("user_id"):
        views = g[g["event_type"] == "view"]["ts"]
        if views.empty:
            continue
        n_view += 1
        t1 = views.min()
        clicks = g[(g["event_type"] == "click") & (g["ts"] > t1)]["ts"]
        if clicks.empty:
            continue
        n_click += 1
        t2 = clicks.min()
        if ((g["event_type"] == "purchase") & (g["ts"] > t2)).any():
            n_full += 1
    assert (row["n_view"], row["n_view_click"], row["n_full_funnel"]) == (
        n_view,
        n_click,
        n_full,
    )
    assert row["n_view"] >= row["n_view_click"] >= row["n_full_funnel"]


def test_retention_cohorts_invariants(spark, sf_dir):
    out = all_queries()["agg_retention_cohorts"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert (out["day_offset"] >= 0).all()
    # day-0 cell of each cohort == number of users first seen that day
    first = (
        ev.assign(d=ev["ts"].dt.strftime("%Y-%m-%d"))
        .groupby("user_id")["d"]
        .min()
    )
    cohort_sizes = first.value_counts()
    day0 = out[out["day_offset"] == 0].set_index("cohort_day")["n_users"]
    for day, size in cohort_sizes.items():
        assert day0[day] == size, day
    # retention never exceeds cohort size
    for _, r in out.iterrows():
        assert r["n_users"] <= cohort_sizes[r["cohort_day"]]


def test_histogram_conserves_mass(spark, sf_dir):
    out = all_queries()["agg_histogram"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    assert out["n"].sum() == len(ev)
    assert abs(out["sum_value"].sum() - ev["value"].sum()) < 1e-3
    for _, r in out.iterrows():
        lo, hi = r["bin"] * 25.0, (r["bin"] + 1) * 25.0
        sel = ev[(ev["value"] >= lo) & (ev["value"] < hi)]
        assert len(sel) == r["n"]


def test_rolling_active_users_matches_pandas_twin(spark, sf_dir):
    out = all_queries()["agg_rolling_active_users"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.assign(d=ev["ts"].dt.normalize())
    max_day = ev["d"].max()
    # expected report days: every day reachable from an active day within
    # +6, capped at the max active day
    expect_days = sorted(
        {
            d + pd.Timedelta(days=o)
            for d in ev["d"].unique()
            for o in range(7)
            if d + pd.Timedelta(days=o) <= max_day
        }
    )
    got = dict(zip(out["day"], out["wau"]))
    assert sorted(got) == [d.strftime("%Y-%m-%d") for d in expect_days]
    for r in expect_days:
        lo = r - pd.Timedelta(days=6)
        expect = ev[(ev["d"] >= lo) & (ev["d"] <= r)]["user_id"].nunique()
        assert got[r.strftime("%Y-%m-%d")] == expect, r


def test_anomaly_zscores_match_numpy(spark, sf_dir):
    out = all_queries()["dq_anomaly_days"](spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    daily = ev.groupby(ev["ts"].dt.date).size()
    mu, sd = daily.mean(), daily.std(ddof=1)
    assert len(out) == len(daily)
    for r in out.itertuples():
        d = pd.to_datetime(r.day).date()
        z = (daily[d] - mu) / sd
        assert r.n == daily[d]
        assert abs(r.z - round(z, 4)) <= 1e-9
        assert r.is_anomaly == (abs(z) > 2.0)


def test_triangle_count_matches_bruteforce(spark, sf_dir):
    row = all_queries()["graph_triangle_count"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    li = li[li["l_partkey"] % 4 == 0]
    adj: dict[int, set[int]] = defaultdict(set)
    edges: set[tuple[int, int]] = set()
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(g["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                edges.add((u, v))
                adj[u].add(v)
                adj[v].add(u)
    # each triangle is counted once per incident edge = 3 times
    tri = sum(len(adj[u] & adj[v]) for u, v in edges) // 3
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri


def test_freshness_and_time_to_convert_twins(spark, sf_dir):
    """Freshness lags and conversion latencies reproduce from pandas with
    second-truncated epoch math (Spark unix_timestamp semantics)."""
    import pandas as pd

    from sdg_data_catalog_spark.queries.registry import all_queries

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    sec = ev["ts"].dt.floor("s")
    gmax = sec.max()

    fresh = {
        r.event_type: r
        for r in all_queries()["dq_freshness"](spark, sf_dir).toPandas().itertuples()
    }
    for et, g in ev.groupby("event_type"):
        lag = int((gmax - sec[g.index].max()).total_seconds() // 3600)
        assert fresh[et].lag_hours == lag, et
        assert fresh[et].stale == (lag > 24)

    out = {
        r.user_id: r
        for r in all_queries()["funnel_time_to_convert"](spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    signup = ev[ev.event_type == "signup"].groupby("user_id")["ts"].min()
    for user, s_ts in signup.items():
        later = ev[
            (ev.event_type == "purchase") & (ev.user_id == user) & (ev.ts > s_ts)
        ]["ts"]
        r = out[user]
        if later.empty:
            assert not r.converted and pd.isna(r.minutes_to_convert)
        else:
            want = int(
                (later.min().floor("s") - s_ts.floor("s")).total_seconds() // 60
            )
            assert r.converted and r.minutes_to_convert == want, user
