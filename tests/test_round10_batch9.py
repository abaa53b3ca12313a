"""Differential / property twins for round-10 batch 9."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def _plane(i, j):
    c = 17 * (j + 1)
    return (((i + c) * 2654435761) % 1000003 % 97 - 48) / 48.0


def test_ann_recall_eval_twin(spark):
    """Recompute both rankings in pure Python with the pinned plane
    arithmetic and sequential-fold cosine."""
    embs = {
        v: e
        for v, e in _fetch(
            f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        )
    }

    def bucket(e):
        b = 0
        for j in range(8):
            d = 0.0
            for i, x in enumerate(e, start=1):
                d += float(x) * _plane(i, j)
            if d > 0:
                b += 1 << j
        return b

    def cos(a, b):
        num = na = nb = 0.0
        for x, y in zip(a, b):
            num += float(x) * float(y)
            na += float(x) * float(x)
            nb += float(y) * float(y)
        return num / (math.sqrt(na) * math.sqrt(nb))

    buckets = {v: bucket(e) for v, e in embs.items()}
    expect = {}
    for qid in range(10):
        scored = sorted(
            ((-cos(embs[qid], e), v) for v, e in embs.items() if v != qid),
        )
        brute = {v for _s, v in scored[:5]}
        cand = sorted(
            (
                (-cos(embs[qid], embs[v]), v)
                for v in embs
                if v != qid and buckets[v] == buckets[qid]
            ),
        )
        approx = {v for _s, v in cand[:5]}
        hits = len(brute & approx)
        expect[qid] = (len(brute), hits, 10**6 * hits // len(brute))
    rows = {
        r["q_id"]: (r["n_true"], r["n_hits"], r["recall_x1e6"])
        for r in all_queries()["sim_ann_recall_eval"](spark, SF).collect()
    }
    assert rows == expect
    # a query whose bucket holds no true neighbor legitimately scores 0;
    # the panel as a whole must still find something or the planes are broken
    assert any(v[2] > 0 for v in rows.values())


def test_adamic_adar_twin(spark):
    base = _fetch(
        f"SELECT DISTINCT l_orderkey, l_partkey"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    )
    per_ord = defaultdict(set)
    for o, p in base:
        per_ord[o].add(p)
    edges = set()
    for parts in per_ord.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    aa = Counter()
    common = Counter()
    for z, nz in nbrs.items():
        d = len(nz)
        if d < 2 or d > 64:
            continue
        w = math.floor(1e9 / math.log(d))
        ns = sorted(nz)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                aa[(ns[i], ns[j])] += w
                common[(ns[i], ns[j])] += 1
    pred = [
        (-s, p[0], p[1], common[p]) for p, s in aa.items() if p not in edges
    ]
    pred.sort()
    expect = [(p1, p2, c, -negs) for negs, p1, p2, c in pred[:20]]
    rows = [
        (r["pa"], r["pb"], r["n_common"], r["aa_x1e9"])
        for r in all_queries()["graph_adamic_adar"](spark, SF).collect()
    ]
    assert rows == expect


def test_sma_crossover_twin(spark):
    daily_rows = _fetch(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS rev
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1 ORDER BY 1
        """
    )
    days = [d for d, _ in daily_rows]
    revs = [r for _, r in daily_rows]
    sides = []
    for i in range(len(revs)):
        s5 = sum(revs[max(0, i - 4) : i + 1])
        n5 = min(i + 1, 5)
        s20 = sum(revs[max(0, i - 19) : i + 1])
        n20 = min(i + 1, 20)
        sides.append(
            1 if s5 * n20 > s20 * n5 else (-1 if s5 * n20 < s20 * n5 else 0)
        )
    expect = []
    for i in range(1, len(sides)):
        if sides[i] != 0 and sides[i - 1] != 0 and sides[i] != sides[i - 1]:
            expect.append(
                (
                    days[i].isoformat(),
                    "golden" if sides[i] > sides[i - 1] else "death",
                )
            )
    rows = [
        (r["day"], r["crossover"])
        for r in all_queries()["win_sma_crossover"](spark, SF).collect()
    ]
    assert rows == expect
    assert len(rows) > 0


def test_tile_contrast_twin(spark):
    """Replay the tile census locally THROUGH the real codec path."""
    import numpy as np

    from sdg_data_catalog_spark.operators.imagecodec import (
        png_decode,
        png_encode,
    )
    from sdg_data_catalog_spark.operators.multimodal import synthetic_image

    rows = {
        r["media_id"]: (r["n_tiles"], r["mean_contrast"], r["max_contrast"])
        for r in all_queries()["mm_tile_contrast"](spark, SF).collect()
    }
    assert len(rows) == 500
    for did in (0, 1, 7, 123, 499):
        img = png_decode(png_encode(synthetic_image(did, 24))).astype(np.int64)
        gray = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
        cs = []
        for ty in range(0, 24, 8):
            for tx in range(0, 24, 8):
                t = gray[ty : ty + 8, tx : tx + 8]
                cs.append(int(t.max()) - int(t.min()))
        assert rows[did] == (len(cs), sum(cs) // len(cs), max(cs))
