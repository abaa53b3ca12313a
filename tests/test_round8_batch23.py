"""Differential twins for the round-8 batch-23 operators."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_price_elasticity_twin(spark):
    qs = all_queries()
    rows = {
        r["l_returnflag"]: r
        for r in qs["agg_price_elasticity"](spark, SF).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT l_returnflag, l_extendedprice, l_quantity
            FROM read_parquet('{SF}/lineitem.parquet')
            WHERE l_quantity > 0 AND l_extendedprice > 0"""
    ).fetchall()
    con.close()
    g = defaultdict(list)
    for rf, ep, q in data:
        x = math.floor(math.log(ep / q) * 1e6)
        y = math.floor(math.log(q) * 1e6)
        g[rf].append((x, y))
    for rf, pts in g.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r = rows[rf]
        assert r["n"] == n
        assert abs(r["elasticity"] - slope) <= 1e-5
        assert abs(r["avg_ln_price"] - sx / n / 1e6) <= 2e-6
        assert abs(r["avg_ln_qty"] - sy / n / 1e6) <= 2e-6


def test_boilerplate_strip_twin(spark):
    qs = all_queries()
    rows = {
        r["doc_id"]: r
        for r in qs["curation_boilerplate_strip"](spark, SF).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, source, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    # phrase lists per source (df >= 3, top-5 by df DESC, gram ASC)
    df = defaultdict(Counter)
    for _, src, text in docs:
        ws = text.split(" ") if text else []
        grams = {f"{a} {b} {c}" for a, b, c in zip(ws, ws[1:], ws[2:])}
        for gm in grams:
            df[src][gm] += 1
    phrases = {}
    for src, cnts in df.items():
        elig = [(g, c) for g, c in cnts.items() if c >= 3]
        elig.sort(key=lambda t: (-t[1], t[0]))
        phrases[src] = [g for g, _ in elig[:5]]
    for doc_id, src, text in docs:
        if doc_id % 20 != 0:
            assert doc_id not in rows
            continue
        t = text
        for p in phrases.get(src, []):
            t = t.replace(p, "")
        r = rows[doc_id]
        assert r["chars_before"] == len(text)
        assert r["chars_after"] == len(t)
        assert r["chars_after"] <= r["chars_before"]


def test_feature_rank_twin(spark):
    qs = all_queries()
    rows = {r["feature"]: r for r in qs["ml_feature_rank_gini"](spark, SF).collect()}
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT FLOOR(value * 1e6), (epoch_us(ts) // 3600000000) % 24,
                   user_id % 10,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    con.close()
    grids = {
        "value": [d * 10**b for b in range(4, 9) for d in range(1, 10)],
        "hour": list(range(1, 24)),
        "bucket": list(range(1, 10)),
    }
    col = {"value": 0, "hour": 1, "bucket": 2}

    def gini(nl, pl, n, p):
        if nl == 0 or n - nl == 0:
            return 2.0
        gl = 1.0 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        gr = (
            1.0
            - ((p - pl) / (n - nl)) ** 2
            - (((n - nl) - (p - pl)) / (n - nl)) ** 2
        )
        return round((nl * gl + (n - nl) * gr) / n, 9)

    bests = {}
    n = len(data)
    p = sum(r[3] for r in data)
    for feat, grid in grids.items():
        best = None
        for thr in grid:
            nl = sum(1 for r in data if r[col[feat]] < thr)
            pl = sum(r[3] for r in data if r[col[feat]] < thr)
            g = gini(nl, pl, n, p)
            key = math.floor(g * 1e9) * 1_000_000_000 + thr
            if best is None or key < best[0]:
                best = (key, thr, g)
        bests[feat] = best
    ranked = sorted(bests.items(), key=lambda kv: (kv[1][2], kv[0]))
    for rank, (feat, (_, thr, g)) in enumerate(ranked, 1):
        r = rows[feat]
        assert r["best_threshold"] == thr
        assert abs(r["best_gini"] - g) <= 2e-9
        assert r["feature_rank"] == rank
    # structural: ranks are a permutation of 1..3 and ginis ascend
    ordered = sorted(rows.values(), key=lambda r: r["feature_rank"])
    assert [r["feature_rank"] for r in ordered] == [1, 2, 3]
    assert all(
        a["best_gini"] <= b["best_gini"] + 1e-9
        for a, b in zip(ordered, ordered[1:])
    )
