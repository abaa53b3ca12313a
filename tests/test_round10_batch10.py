"""Differential / property twins for round-10 batch 10."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _fetch(sql):
    con = duckdb.connect()
    rows = con.execute(sql).fetchall()
    con.close()
    return rows


def _ols_rss(X, y):
    """Least-squares RSS via numpy for the twin (float reference)."""
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    r = y - X @ beta
    return float(r @ r)


def test_granger_lite_twin(spark):
    """Replay the F statistic with numpy OLS (independent solver) and
    check the image to float tolerance; sufficient-statistic exactness
    is already pinned by the DuckDB oracle."""
    ev = _fetch(
        f"SELECT epoch_us(ts) // 86400000000 AS day,"
        f" SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS c,"
        f" SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS p"
        f" FROM read_parquet('{SF}/events.parquet') GROUP BY 1 ORDER BY 1"
    )
    days = {d: (c, p) for d, c, p in ev}
    rows = {
        r["direction"]: (r["n"], r["f_x1e6"], r["predictive"])
        for r in all_queries()["ts_granger_lite"](spark, SF).collect()
    }
    for x_i, y_i, direction in ((0, 1, "click->purchase"), (1, 0, "purchase->click")):
        pairs = [
            (days[d][y_i], days[d - 1][y_i], days[d - 1][x_i])
            for d in days
            if d - 1 in days
        ]
        y = np.array([p[0] for p in pairs], dtype=float)
        yl = np.array([p[1] for p in pairs], dtype=float)
        xl = np.array([p[2] for p in pairs], dtype=float)
        n = len(pairs)
        rss_r = _ols_rss(np.column_stack([np.ones(n), yl]), y)
        rss_u = _ols_rss(np.column_stack([np.ones(n), yl, xl]), y)
        f = (rss_r - rss_u) * (n - 3) / rss_u
        got_n, got_f, got_v = rows[direction]
        assert got_n == n
        assert abs(got_f - math.floor(1e6 * f)) <= 2000  # solver-path slack
        assert got_v == (got_f > 3_841_458)


def test_partition_advisor_twin(spark):
    docs = _fetch(
        f"SELECT source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    )
    per = defaultdict(lambda: [0, 0])
    for src, nc in docs:
        per[src][0] += 1
        per[src][1] += nc
    all_chars = sum(v[1] for v in per.values())
    ns = len(per)
    tgt = 128 * 1024 * 1024
    rows = {
        r["source"]: (
            r["n_docs"], r["total_chars"], r["rec_partitions"], r["skew_flag"],
        )
        for r in all_queries()["plan_partition_advisor"](spark, SF).collect()
    }
    assert set(rows) == set(per)
    for src, (nd, tc) in per.items():
        assert rows[src] == (nd, tc, (tc + tgt - 1) // tgt, tc * ns > 2 * all_chars)
    assert all(v[2] >= 1 for v in rows.values())


def test_pq_distortion_twin(spark):
    """Replay the per-vector distortion through the same normalization
    and codebook build, then check the label rollup."""
    embs = _fetch(
        f"SELECT vec_id, embedding, label"
        f" FROM read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    )

    def norm(e):
        v = np.asarray(e, dtype=np.float64)
        return v / math.sqrt(float((v * v).sum()))

    unit = {vid: norm(e) for vid, e, _l in embs}
    books = np.zeros((16, 16, 4))
    for vid in range(16):
        for s in range(16):
            books[s][vid] = unit[vid][s * 4 : (s + 1) * 4]
    per_label = defaultdict(list)
    for vid, _e, label in embs:
        x = unit[vid]
        total = 0.0
        for s in range(16):
            seg = x[s * 4 : (s + 1) * 4]
            d2 = ((books[s] - seg) ** 2).sum(axis=1)
            total += float(d2.min())
        per_label[label].append(math.floor(1e9 * total))
    rows = {
        r["label"]: (r["n_vecs"], r["sum_dist_x1e9"], r["mean_dist_x1e9"])
        for r in all_queries()["emb_pq_distortion"](spark, SF).collect()
    }
    assert set(rows) == set(per_label)
    for label, imgs in per_label.items():
        assert rows[label] == (len(imgs), sum(imgs), sum(imgs) // len(imgs))
    # vectors 0..15 ARE codewords in one subspace slice each, so the
    # space is not degenerate: some distortion must be strictly positive
    assert any(v[1] > 0 for v in rows.values())


def test_filter_overlap_twin(spark):
    docs = _fetch(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    )
    fps = Counter()
    flags = {}
    for did, text in docs:
        w = text.split(" ")
        q_fail = len(w) < 20 or 5 * len(set(w)) < len(w)
        fp = " ".join(sorted(set(text.lower().split(" "))))
        fps[fp] += 1
        flags[did] = (q_fail, fp)
    cm = Counter()
    for q_fail, fp in flags.values():
        dup = fps[fp] > 1
        cm[(q_fail, dup)] += 1
    both, q_only = cm[(True, True)], cm[(True, False)]
    dup_only, neither = cm[(False, True)], cm[(False, False)]
    phi = (both * neither - q_only * dup_only) / math.sqrt(
        (both + q_only) * (both + dup_only) * (neither + q_only) * (neither + dup_only)
    )
    row = all_queries()["curation_filter_overlap"](spark, SF).collect()[0]
    assert (row["both_fail"], row["q_only"], row["dup_only"], row["neither"]) == (
        both, q_only, dup_only, neither,
    )
    assert abs(row["phi"] - round(phi, 6)) <= 1e-6
    denom = both + q_only + dup_only
    assert row["overlap_jaccard_x1e6"] == (
        10**6 * both // denom if denom else 0
    )
