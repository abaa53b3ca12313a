"""Differential twins for the round-8 batch-18 operators."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_hits_twin(spark):
    """Integer-image HITS replay in Python."""
    qs = all_queries()
    rows = qs["graph_hits"](spark, SF).collect()
    con = duckdb.connect()
    edges = con.execute(
        f"""SELECT DISTINCT li.l_suppkey, o.o_custkey + 1000000
            FROM read_parquet('{SF}/lineitem.parquet') li
            JOIN read_parquet('{SF}/orders.parquet') o
              ON li.l_orderkey = o.o_orderkey"""
    ).fetchall()
    con.close()
    out_e = defaultdict(list)
    in_e = defaultdict(list)
    for s, d in edges:
        out_e[s].append(d)
        in_e[d].append(s)
    h = {s: 10**9 for s in out_e}
    a = {}
    for _ in range(3):
        raw_a = {d: sum(h[s] for s in in_e[d]) for d in in_e}
        mx = max(raw_a.values())
        a = {d: math.floor(v / mx * 1e9) for d, v in raw_a.items()}
        raw_h = {s: sum(a[d] for d in out_e[s]) for s in out_e}
        mx = max(raw_h.values())
        h = {s: math.floor(v / mx * 1e9) for s, v in raw_h.items()}
    top_a = sorted(a.items(), key=lambda t: (-t[1], t[0]))[:20]
    top_h = sorted(h.items(), key=lambda t: (-t[1], t[0]))[:20]
    got_a = [(r["node"], r["score"]) for r in rows if r["role"] == "authority"]
    got_h = [(r["node"], r["score"]) for r in rows if r["role"] == "hub"]
    assert got_a == [(n, round(s / 1e9, 9)) for n, s in top_a]
    assert got_h == [(n, round(s / 1e9, 9)) for n, s in top_h]
    # every score is in (0, 1] and some node holds the max exactly
    assert max(s for _, s in got_a) == 1.0
    assert max(s for _, s in got_h) == 1.0


def test_bh_fdr_twin(spark):
    """BH step-up recount from the registered MWU z statistics."""
    qs = all_queries()
    rows = qs["agg_bh_fdr"](spark, SF).collect()
    mwu = {r["event_type"]: r["z"] for r in qs["agg_mann_whitney"](spark, SF).collect()}

    def phi_tail(z):
        t = 1.0 / (1.0 + 0.2316419 * z)
        poly = (
            (((1.330274429 * t - 1.821255978) * t + 1.781477937) * t - 0.356563782)
            * t
            + 0.319381530
        ) * t
        return math.exp(-z * z / 2.0) / 2.5066282746310002 * poly

    ps = sorted(
        ((round(2.0 * phi_tail(abs(z)), 9), et, z) for et, z in mwu.items()),
        key=lambda t: (t[0], t[1]),
    )
    m = len(ps)
    kstar = max(
        (rk for rk, (p, _, _) in enumerate(ps, 1) if p * m <= 0.05 * rk),
        default=0,
    )
    got = {r["event_type"]: r for r in rows}
    for rk, (p, et, z) in enumerate(ps, 1):
        r = got[et]
        assert abs(r["z"] - z) <= 1e-9  # same z as the registered MWU op
        assert abs(r["p_value"] - p) <= 1e-9
        assert r["rank"] == rk
        assert abs(r["bh_threshold"] - round(0.05 * rk / m, 9)) <= 1e-9
        assert r["discovery"] == (1 if rk <= kstar else 0)
    # p-values are valid probabilities
    assert all(0.0 <= r["p_value"] <= 1.0 for r in rows)


def test_hll_intersect_twin(spark):
    qs = all_queries()
    rows = qs["sketch_hll_intersect"](spark, SF).collect()
    con = duckdb.connect()
    tu = con.execute(
        f"SELECT DISTINCT event_type, user_id FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()
    users = defaultdict(set)
    for et, uid in tu:
        users[et].add(uid)
    types = sorted(users)
    expect = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            inter = len(users[ta] & users[tb])
            if inter:
                expect[(ta, tb)] = (len(users[ta]), len(users[tb]), inter)
    got = {(r["type_a"], r["type_b"]): r for r in rows}
    assert set(got) == set(expect)
    for key, (na, nb, ni) in expect.items():
        r = got[key]
        assert r["n_a"] == na
        assert r["n_b"] == nb
        assert r["n_intersect"] == ni
        assert r["est_within_bound"] is True
