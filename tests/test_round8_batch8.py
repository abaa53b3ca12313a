"""Differential twins for the round-8 batch-8 operators."""

from __future__ import annotations

import math

import duckdb
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"

_PRED = {"view": 100, "click": 200, "signup": 300, "purchase": 400}


def _ranked_lists(spark):
    """Recompute the two candidate rankings exactly as the query does,
    via the registered rank_rrf columns (same lists by contract)."""
    qs = all_queries()
    rows = qs["rank_borda_fusion"](spark, SF).collect()
    return rows


def test_tau_and_rho_consistency(spark):
    """tau and rho are computed from the SAME shared candidate set; both
    must land in [-1, 1], agree in SIGN, and satisfy n_shared
    consistency. Exact pairwise recount of tau from the registered
    borda rank columns over the shared top-20 window is not possible
    (the statistic runs over ALL shared candidates), so the invariant
    checks are structural + the oracle carries the exact verification."""
    qs = all_queries()
    [tau_row] = qs["rank_kendall_tau"](spark, SF).collect()
    [rho_row] = qs["agg_spearman_rho"](spark, SF).collect()
    assert tau_row["n_shared"] == rho_row["n_shared"] > 0
    npairs = tau_row["n_shared"] * (tau_row["n_shared"] - 1) // 2
    assert tau_row["n_concordant"] + tau_row["n_discordant"] <= npairs
    assert -1.0 <= tau_row["kendall_tau"] <= 1.0
    assert -1.0 <= rho_row["spearman_rho"] <= 1.0
    if abs(tau_row["kendall_tau"]) > 0.05 and abs(rho_row["spearman_rho"]) > 0.05:
        assert (tau_row["kendall_tau"] > 0) == (rho_row["spearman_rho"] > 0)
    # the classic inequality region for monotone-related lists:
    # |3*tau - 2*rho| <= 1 (Durbin-Stuart / Daniels 1950)
    assert abs(3 * tau_row["kendall_tau"] - 2 * rho_row["spearman_rho"]) <= 1.0 + 1e-6


def test_kendall_tau_twin(spark):
    """Full pairwise recount on the raw data (sf0.001 is small enough
    to enumerate every shared-candidate pair in Python)."""
    qs = all_queries()
    [tau_row] = qs["rank_kendall_tau"](spark, SF).collect()
    con = duckdb.connect()
    base = con.execute(
        f"""SELECT d.doc_id,
                   len(list_filter(string_split_regex(lower(d.text), '[^a-z]+'),
                                   t -> t = 'data')) AS lex_tf
            FROM read_parquet('{SF}/documents.parquet') d
            JOIN read_parquet('{SF}/embeddings.parquet') e
              ON e.vec_id = d.doc_id"""
    ).fetchall()
    con.close()
    # semantic scores need the shared query vector — recompute via the
    # module constant to stay bit-faithful
    from sdg_data_catalog_spark.queries.data_selection import _QVEC

    con = duckdb.connect()
    embs = dict(
        con.execute(
            f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
        ).fetchall()
    )
    con.close()
    scored = []
    for doc_id, lex_tf in base:
        sem = sum(float(x) * w for x, w in zip(embs[doc_id], _QVEC))
        scored.append((doc_id, lex_tf, sem))
    lex_sorted = sorted(scored, key=lambda r: (-r[1], r[0]))[:1000]
    sem_sorted = sorted(scored, key=lambda r: (-r[2], r[0]))[:1000]
    lex_rank = {r[0]: i + 1 for i, r in enumerate(lex_sorted)}
    sem_rank = {r[0]: i + 1 for i, r in enumerate(sem_sorted)}
    shared = [d for d in lex_rank if d in sem_rank]
    nc = nd = 0
    for i in range(len(shared)):
        for j in range(i + 1, len(shared)):
            a, b = shared[i], shared[j]
            p = (lex_rank[a] - lex_rank[b]) * (sem_rank[a] - sem_rank[b])
            nc += p > 0
            nd += p < 0
    npairs = len(shared) * (len(shared) - 1) // 2
    assert tau_row["n_shared"] == len(shared)
    assert tau_row["n_concordant"] == nc
    assert tau_row["n_discordant"] == nd
    assert tau_row["kendall_tau"] == pytest.approx(
        math.floor((nc - nd) / npairs * 1e6) / 1e6, abs=2e-6
    )


def test_kappa_twin(spark):
    qs = all_queries()
    [row] = qs["agg_cohens_kappa"](spark, SF).collect()
    con = duckdb.connect()
    ev = con.execute(
        f"SELECT event_type, value FROM read_parquet('{SF}/events.parquet')"
    ).fetchall()
    con.close()

    def pred(v):
        for cls, thr in _PRED.items():
            if v < thr:
                return cls
        return "error"

    grid: dict[tuple[str, str], int] = {}
    for actual, v in ev:
        key = (actual, pred(v))
        grid[key] = grid.get(key, 0) + 1
    nt = sum(grid.values())
    agree = sum(n for (a, p), n in grid.items() if a == p)
    na: dict[str, int] = {}
    np_: dict[str, int] = {}
    for (a, p), n in grid.items():
        na[a] = na.get(a, 0) + n
        np_[p] = np_.get(p, 0) + n
    chance = sum(na.get(c, 0) * np_.get(c, 0) for c in set(na) | set(np_))
    po, pe = agree / nt, chance / (nt * nt)
    assert row["n_total"] == nt
    assert row["n_agree"] == agree
    assert row["kappa"] == pytest.approx(
        math.floor((po - pe) / (1 - pe) * 1e6) / 1e6, abs=2e-6
    )
    # kappa <= observed accuracy, and chance-corrected
    assert row["kappa"] <= row["p_observed"] + 1e-9
