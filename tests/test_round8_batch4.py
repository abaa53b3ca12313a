"""Differential twins for the round-8 batch-4 operators."""

from __future__ import annotations

import math

import duckdb
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.queries.round8_batch4 import _XMR_C

SF = "/root/testdata/sf0.001"


def test_jackknife_twin(spark):
    qs = all_queries()
    [row] = qs["agg_jackknife_variance"](spark, SF).collect()
    con = duckdb.connect()
    groups = con.execute(
        f"""SELECT source, SUM(n_chars), COUNT(*)
            FROM read_parquet('{SF}/documents.parquet') GROUP BY source"""
    ).fetchall()
    con.close()
    st = sum(s for _, s, _ in groups)
    nt = sum(n for _, _, n in groups)
    g = len(groups)
    ts = [math.floor((st - s) / (nt - n) * 1e9) for _, s, n in groups]
    tt = sum(ts)
    sq = sum((g * t) ** 2 for t in ts)
    var = (sq - tt * tt) / (g**3) * (g - 1) / g
    se = math.sqrt(var) / 1e9
    assert row["n_groups"] == g
    assert row["mean_chars"] == pytest.approx(
        math.floor(st / nt * 1e6) / 1e6, abs=2e-6
    )
    assert row["jackknife_se"] == pytest.approx(
        math.floor(se * 1e6) / 1e6, abs=2e-6
    )
    assert row["jackknife_se"] > 0


def test_modularity_twin(spark):
    qs = all_queries()
    got = {
        r["brand"]: (r["intra_edges"], r["degree_sum"], r["q_contrib"])
        for r in qs["graph_modularity"](spark, SF).collect()
    }
    con = duckdb.connect()
    edges = con.execute(
        f"""WITH base AS (
              SELECT DISTINCT l_orderkey AS ord, l_partkey AS part
              FROM read_parquet('{SF}/lineitem.parquet'))
            SELECT DISTINCT a.part, b.part FROM base a
            JOIN base b ON a.ord = b.ord AND a.part < b.part"""
    ).fetchall()
    brand = dict(
        con.execute(
            f"SELECT p_partkey, p_brand FROM read_parquet('{SF}/part.parquet')"
        ).fetchall()
    )
    con.close()
    m = len(edges)
    intra: dict[str, int] = {}
    deg: dict[str, int] = {}
    for u, v in edges:
        cu, cv = brand[u], brand[v]
        deg[cu] = deg.get(cu, 0) + 1
        deg[cv] = deg.get(cv, 0) + 1
        if cu == cv:
            intra[cu] = intra.get(cu, 0) + 1
    assert set(got) == set(deg)
    q_total = 0.0
    for b_, (ie, ds, qc) in got.items():
        assert ie == intra.get(b_, 0)
        assert ds == deg[b_]
        expect = intra.get(b_, 0) / m - (deg[b_] / (2 * m)) ** 2
        assert qc == pytest.approx(math.floor(expect * 1e6) / 1e6, abs=2e-6)
        q_total += qc
    # modularity of any partition lies in [-1, 1]
    assert -1.0 <= q_total <= 1.0


def test_xmr_twin(spark):
    qs = all_queries()
    rows = qs["dq_xmr_control_chart"](spark, SF).collect()
    con = duckdb.connect()
    daily = con.execute(
        f"""SELECT event_type, CAST(ts AS DATE), COUNT(*)
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    con.close()
    series: dict[str, list[int]] = {}
    for et, _, n in daily:
        series.setdefault(et, []).append(n)
    limits = {}
    for et, ys in series.items():
        mrs = [abs(b - a) for a, b in zip(ys, ys[1:])]
        center = sum(ys) / len(ys)
        mrbar = sum(mrs) / len(mrs)
        limits[et] = (center, center + _XMR_C * mrbar, center - _XMR_C * mrbar)
    n_out = 0
    for r in rows:
        c, u, lo = limits[r["event_type"]]
        assert r["center"] == pytest.approx(math.floor(c * 1e6) / 1e6, abs=2e-6)
        assert r["ucl"] == pytest.approx(math.floor(u * 1e6) / 1e6, abs=2e-6)
        assert r["lcl"] == pytest.approx(math.floor(lo * 1e6) / 1e6, abs=2e-6)
        assert r["out_of_control"] == (r["y"] > u or r["y"] < lo)
        n_out += bool(r["out_of_control"])
    assert len(rows) == sum(len(v) for v in series.values())
