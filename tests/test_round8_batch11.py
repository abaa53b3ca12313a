"""Differential twins for the round-8 batch-11 operators."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_assortativity_twin(spark):
    """Rebuild the co-purchase graph in Python and compute textbook
    Pearson assortativity over the symmetrized directed pairs."""
    qs = all_queries()
    [row] = qs["graph_assortativity"](spark, SF).collect()
    con = duckdb.connect()
    pe = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_partkey
            FROM read_parquet('{SF}/lineitem.parquet')
            WHERE l_partkey % 4 = 0"""
    ).fetchall()
    con.close()
    by_order = defaultdict(list)
    for o, p in pe:
        by_order[o].append(p)
    edges = set()
    for parts in by_order.values():
        parts.sort()
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                edges.add((parts[i], parts[j]))
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(deg)
    # Pearson over the 2M directed degree pairs
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    mx = sum(xs) / n
    my = sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    r = cov / math.sqrt(vx * vy)
    assert abs(row["assortativity"] - r) <= 2e-6
    assert -1.0 <= row["assortativity"] <= 1.0


def test_cramers_v_twin(spark):
    """Recount the contingency table and the textbook V / corrected V."""
    qs = all_queries()
    [row] = qs["agg_cramers_v"](spark, SF).collect()
    con = duckdb.connect()
    cells = con.execute(
        f"""SELECT event_type,
                   CAST((epoch_us(ts) // 86400000000) % 7 AS INTEGER) AS wd,
                   COUNT(*)
            FROM read_parquet('{SF}/events.parquet')
            GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    rt, ct = Counter(), Counter()
    n = 0
    for et, wd, c in cells:
        rt[et] += c
        ct[wd] += c
        n += c
    chi2 = 0.0
    for et, wd, c in cells:
        exp = rt[et] * ct[wd] / n
        chi2 += math.floor(round((c - exp) ** 2 / exp, 6) * 1e6) / 1e6
    nr, nc = len(rt), len(ct)
    v = math.sqrt(chi2 / (n * (min(nr, nc) - 1)))
    phi2c = max(chi2 / n - (nr - 1) * (nc - 1) / (n - 1), 0.0)
    r_t = nr - (nr - 1) ** 2 / (n - 1)
    c_t = nc - (nc - 1) ** 2 / (n - 1)
    vc = math.sqrt(phi2c / (min(r_t, c_t) - 1.0))
    assert row["n"] == n
    assert row["nr"] == nr
    assert row["nc"] == nc
    assert abs(row["chi2"] - chi2) <= 2e-6
    assert abs(row["v"] - v) <= 2e-6
    assert abs(row["v_corrected"] - vc) <= 2e-6
    assert row["v_corrected"] <= row["v"] + 1e-9  # correction only shrinks


def test_cramers_v_shares_chi2_with_independence_test(spark):
    """Cross-op contract: the chi2 the V derives from equals the
    chi2_total of agg_chisq_independence (same grid, same flooring)."""
    qs = all_queries()
    [vrow] = qs["agg_cramers_v"](spark, SF).collect()
    chirow = qs["agg_chisq_independence"](spark, SF).collect()[0]
    assert abs(vrow["chi2"] - chirow["chi2_total"]) <= 1e-9


def test_heaps_law_twin(spark):
    """Recount the 16 checkpoints in Python (dedup-convention space-split
    3-shingles) and refit the log-log OLS on the same floored-1e-6
    images."""
    qs = all_queries()
    rows = qs["text_heaps_law"](spark, SF).collect()
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()
    hi = max(d for d, _ in docs) + 1
    tok_per_doc = {}
    first_doc = {}
    for doc_id, text in sorted(docs):
        ws = text.split(" ") if text else []
        tok_per_doc[doc_id] = max(len(ws) - 2, 0)
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            sh = f"{a} {b} {c}"
            if sh not in first_doc or doc_id < first_doc[sh]:
                first_doc[sh] = doc_id
    pts = []
    for i in range(1, 17):
        thr = hi * i // 16
        ctok = sum(c for d, c in tok_per_doc.items() if d < thr)
        cvoc = sum(1 for d in first_doc.values() if d < thr)
        if ctok > 0 and cvoc > 0:
            pts.append((i, ctok, cvoc))
    imgs = [
        (i, ct, cv, math.floor(math.log(ct) * 1e6), math.floor(math.log(cv) * 1e6))
        for i, ct, cv in pts
    ]
    m = len(imgs)
    sx = sum(x for *_, x, _ in imgs)
    sy = sum(y for *_, y in imgs)
    sxy = sum(x * y for *_, x, y in imgs)
    sxx = sum(x * x for *_, x, _ in imgs)
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    k = math.exp((sy - beta * sx) / m / 1e6)
    by_ck = {r["ckpt"]: r for r in rows}
    assert set(by_ck) == {i for i, *_ in imgs}
    for i, ct, cv, _, _ in imgs:
        assert by_ck[i]["cum_tokens"] == ct
        assert by_ck[i]["cum_vocab"] == cv
        assert abs(by_ck[i]["beta"] - beta) <= 2e-6
        assert abs(by_ck[i]["k"] - k) <= max(2e-6, abs(k) * 1e-5)
    # shingle-space growth is sublinear but real on this corpus
    assert 0.0 < beta < 1.0
