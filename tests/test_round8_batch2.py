"""Differential twins for the round-8 batch-2 operators."""

from __future__ import annotations

import hashlib
import math

import duckdb
import numpy as np
import pytest

from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.queries.round8_batch2 import _B, _POIS_CDF

SF = "/root/testdata/sf0.001"


def _h8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_emb_centroid_drift_twin(spark):
    qs = all_queries()
    got = {
        r["label"]: (r["n_a"], r["n_b"], r["centroid_shift_sq"])
        for r in qs["emb_centroid_drift"](spark, SF).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    halves: dict[int, dict[int, list[np.ndarray]]] = {}
    for vec_id, label, emb in rows:
        h = _h8(str(vec_id)) % 2
        q = np.array(
            [math.floor(float(np.float64(v)) * 1000 + 0.5) for v in emb],
            dtype=object,
        )
        halves.setdefault(label, {0: [], 1: []})[h].append(q)
    for label, hs in halves.items():
        na, nb = len(hs[0]), len(hs[1])
        if na == 0 or nb == 0:
            assert label not in got
            continue
        sa = np.sum(hs[0], axis=0)
        sb = np.sum(hs[1], axis=0)
        diff = nb * sa - na * sb
        num = int((diff * diff).sum())
        shift = math.floor(num / (na * nb * na * nb) / 1e6 * 1e6) / 1e6
        gna, gnb, gshift = got[label]
        assert (gna, gnb) == (na, nb)
        assert gshift == pytest.approx(shift, abs=2e-6)


def test_bootstrap_ci_twin(spark):
    qs = all_queries()
    got = {
        r["source"]: (r["n_docs"], r["mean_chars"], r["ci_lo"], r["ci_hi"])
        for r in qs["agg_bootstrap_ci"](spark, SF).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    con.close()

    def pois_w(u: float) -> int:
        for k, p in enumerate(_POIS_CDF):
            if u < p:
                return k
        return 8

    by_src: dict[str, list[tuple[int, int]]] = {}
    for doc_id, source, n_chars in rows:
        by_src.setdefault(source, []).append((doc_id, n_chars))
    for source, docs in by_src.items():
        means = []
        for b in range(_B):
            wx = w = 0
            for doc_id, n_chars in docs:
                u = ((_h8(f"{doc_id}#{b}") % 1000000) + 0.5) / 1000000.0
                k = pois_w(u)
                wx += k * n_chars
                w += k
            if w > 0:
                means.append(wx / w)
        means.sort()

        def q(p: float) -> float:
            idx = p * (len(means) - 1)
            lo, frac = int(math.floor(idx)), idx - math.floor(idx)
            hi = min(lo + 1, len(means) - 1)
            return (1 - frac) * means[lo] + frac * means[hi]

        n = len(docs)
        mean = sum(c for _, c in docs) / n
        gn, gm, glo, ghi = got[source]
        assert gn == n
        assert gm == pytest.approx(math.floor(mean * 1e6) / 1e6, abs=2e-6)
        assert glo == pytest.approx(math.floor(q(0.025) * 1e6) / 1e6, abs=2e-6)
        assert ghi == pytest.approx(math.floor(q(0.975) * 1e6) / 1e6, abs=2e-6)
        # the interval surrounds the point estimate
        assert glo <= gm <= ghi


def test_asof_fwd_tolerance_twin(spark):
    qs = all_queries()
    got = {
        r["event_id"]: (r["next_purchase_us"], r["matched"])
        for r in qs["join_asof_fwd_tolerance"](spark, SF).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
            FROM read_parquet('{SF}/events.parquet')
            WHERE event_type IN ('signup', 'purchase')"""
    ).fetchall()
    con.close()
    tol = 7 * 24 * 3600 * 1_000_000
    purchases: dict[int, list[int]] = {}
    for _, user_id, et, ts_us in rows:
        if et == "purchase":
            purchases.setdefault(user_id, []).append(ts_us)
    n_signups = 0
    for event_id, user_id, et, ts_us in rows:
        if et != "signup":
            continue
        n_signups += 1
        future = [p for p in purchases.get(user_id, []) if ts_us <= p <= ts_us + tol]
        expect = min(future) if future else None
        assert got[event_id] == (expect, expect is not None), event_id
    assert len(got) == n_signups
