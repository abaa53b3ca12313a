"""Differential / property twins for round-11 batch 2: every statistic
recomputed independently (numpy / pure Python over the raw parquet via
DuckDB reads — NOT the oracle SQL) and compared against the registered
Spark query's output."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import numpy as np

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def _rows(sql):
    con = duckdb.connect()
    out = con.execute(sql).fetchall()
    con.close()
    return out


def _docs():
    return _rows(
        f"SELECT doc_id, text, lang, source, n_chars FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )


def test_anova_oneway_matches_numpy(spark):
    rows = _docs()
    by_src = {}
    for _, _, _, src, n_chars in rows:
        by_src.setdefault(src, []).append(n_chars)
    groups = [np.array(v, dtype=float) for v in by_src.values()]
    allv = np.concatenate(groups)
    ssb = sum(len(g) * (g.mean() - allv.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))
    got = all_queries()["agg_anova_oneway"](spark, SF).collect()[0]
    assert got["k"] == k and got["n"] == n
    # the engine carries SSB as a floor'd micro-image; allow that quantum
    assert abs(got["f_stat"] - f_ref) < 1e-3
    assert abs(got["eta_sq"] - ssb / (ssb + ssw)) < 1e-3


def test_wasserstein_matches_numpy(spark):
    rows = _docs()
    by_src = {}
    for _, _, _, src, n_chars in rows:
        by_src.setdefault(src, []).append(n_chars)
    allv = sorted(v for vs in by_src.values() for v in vs)
    got = {r["source"]: r["w1"] for r in all_queries()["agg_wasserstein_1d"](spark, SF).collect()}
    for src, vs in by_src.items():
        rest = sorted(v for s2, v2 in by_src.items() for v in v2 if s2 != src)
        grid = sorted(set(allv))
        ca = np.searchsorted(sorted(vs), grid, side="right")
        cb = np.searchsorted(rest, grid, side="right")
        gaps = np.diff(np.array(grid, dtype=float))
        w1 = float(
            np.sum(np.abs(ca[:-1] / len(vs) - cb[:-1] / len(rest)) * gaps)
        )
        assert abs(got[src] - w1) < 1e-5, src


def test_kl_divergence_matches_python(spark):
    rows = _docs()
    src_counts: dict[str, Counter] = {}
    corpus = Counter()
    for _, text, _, src, _ in rows:
        toks = text.split(" ")
        src_counts.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    n = sum(corpus.values())
    v = len(corpus)
    got = {r["source"]: r for r in all_queries()["lm_kl_divergence"](spark, SF).collect()}
    for src, cnt in src_counts.items():
        ns = sum(cnt.values())
        # same floor'd per-word image the engine commits to
        s = sum(
            c * math.floor(1e6 * math.log((c * (n + v)) / (ns * (corpus[w] + 1))))
            for w, c in cnt.items()
        )
        assert got[src]["kl_sum_x1e6"] == s, src
        assert got[src]["n_tokens"] == ns and got[src]["vocab"] == len(cnt)


def test_holm_monotone_and_vs_bh(spark):
    qs = all_queries()
    holm = qs["agg_holm_bonferroni"](spark, SF).collect()
    bh = {r["event_type"]: r for r in qs["agg_bh_fdr"](spark, SF).collect()}
    # identical underlying family
    for r in holm:
        assert abs(r["p_value"] - bh[r["event_type"]]["p_value"]) < 1e-12
    # adjusted p non-decreasing in rank, capped at 1
    adj = [r["holm_adj_p"] for r in sorted(holm, key=lambda r: r["rank"])]
    assert all(a <= b + 1e-12 for a, b in zip(adj, adj[1:]))
    assert all(0 <= a <= 1 for a in adj)
    # Holm (FWER) discoveries are a subset of BH (FDR) discoveries
    for r in holm:
        if r["discovery"]:
            assert bh[r["event_type"]]["discovery"] == 1
    # step-down contiguity: discoveries are exactly ranks 1..t
    flags = [r["discovery"] for r in sorted(holm, key=lambda r: r["rank"])]
    assert flags == sorted(flags, reverse=True)


def test_pr_at_k_matches_numpy(spark):
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    vecs = {i: np.array(e, dtype=np.float64) for i, e, _ in emb}
    labs = {i: l for i, _, l in emb}
    got = {(r["q_id"], r["k"]): r for r in all_queries()["eval_pr_at_k"](spark, SF).collect()}
    for q in range(10):
        qv = vecs[q]
        scored = sorted(
            (
                (-float(qv @ vecs[c]) / (np.linalg.norm(qv) * np.linalg.norm(vecs[c])), c)
                for c in vecs
                if c != q
            ),
        )[:10]
        rel = [1 if labs[c] == labs[q] else 0 for _, c in scored]
        hits = np.cumsum(rel)
        r_total = sum(1 for c in labs if c != q and labs[c] == labs[q])
        ap = sum(rel[i] * hits[i] / (i + 1) for i in range(10)) / min(r_total, 10)
        for k in (1, 5, 10):
            row = got[(q, k)]
            assert row["hits"] == hits[k - 1], (q, k)
            assert abs(row["precision_at_k"] - hits[k - 1] / k) < 1e-6
            assert abs(row["recall_at_k"] - hits[k - 1] / r_total) < 1e-6
            assert abs(row["ap_at_10"] - ap) < 1e-6


def test_poisson_rate_counts_and_z(spark):
    rows = _rows(
        f"SELECT event_type, ts FROM read_parquet('{SF}/events.parquet')"
    )
    import datetime

    split = datetime.datetime(2024, 1, 16)
    c1, c2 = Counter(), Counter()
    for et, ts in rows:
        (c1 if ts < split else c2)[et] += 1
    got = {r["event_type"]: r for r in all_queries()["agg_poisson_rate_test"](spark, SF).collect()}
    for et, r in got.items():
        assert r["n1"] == c1[et] and r["n2"] == c2[et]
        z = (c1[et] - c2[et]) / math.sqrt(c1[et] + c2[et])
        assert abs(r["z"] - z) < 1e-5
        assert 0 <= r["p_value"] <= 1.0 + 1e-9


def test_percentile_exact_matches_numpy(spark):
    rows = _docs()
    by_src = {}
    for _, _, _, src, n_chars in rows:
        by_src.setdefault(src, []).append(n_chars)
    got = {r["source"]: r for r in all_queries()["agg_percentile_exact"](spark, SF).collect()}
    for src, vs in by_src.items():
        arr = np.array(sorted(vs), dtype=float)
        for col, p in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p90", 0.9)):
            ref = float(np.quantile(arr, p))  # numpy 'linear' = (n-1)p convention
            assert abs(got[src][col] - ref) < 1e-6, (src, col)


def test_propensity_weights_exact(spark):
    rows = _docs()
    strata = {}
    for doc_id, _, lang, _, n_chars in rows:
        b = min(n_chars // 150, 3)
        st = strata.setdefault((lang, b), [0, 0, 0, 0])  # n, n_sel, cs, ca
        st[0] += 1
        st[3] += n_chars
        if doc_id % 7 == 0:
            st[1] += 1
            st[2] += n_chars
    got = {(r["lang"], r["bucket"]): r for r in all_queries()["curation_propensity_weights"](spark, SF).collect()}
    assert set(got) == set(strata)
    for key, (n, n_sel, cs, ca) in strata.items():
        r = got[key]
        assert r["n"] == n and r["n_sel"] == n_sel
        assert r["weight_x1e6"] == (1000000 * n // n_sel if n_sel else 0)
        assert r["mean_sel_x1e6"] == (1000000 * cs // n_sel if n_sel else 0)
        assert r["mean_all_x1e6"] == 1000000 * ca // n
