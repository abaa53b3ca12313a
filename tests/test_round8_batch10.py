"""Differential twins for the round-8 batch-10 operators."""

from __future__ import annotations

import math

import duckdb

from sdg_data_catalog_spark.queries.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_rank_mrr_twin(spark):
    """Brute-force MRR: sort every anchor's candidates in Python on the
    same (floor(cos*1e12) DESC, cand_id ASC) key and locate the first
    same-label hit."""
    qs = all_queries()
    rows = {r["anchor_id"]: r for r in qs["rank_mrr"](spark, SF).collect()}
    con = duckdb.connect()
    embs = con.execute(
        f"SELECT vec_id, embedding, label FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    unit = {}
    for vid, e, lab in embs:
        nrm = math.sqrt(sum(float(x) * float(x) for x in e))
        unit[vid] = ([float(x) / nrm for x in e], lab)
    anchors = {v: unit[v] for v in unit if v < 32}
    cands = {v: unit[v] for v in unit if v >= 32}
    for aid, (au, alab) in anchors.items():
        keyed = []
        for cid, (cu, clab) in cands.items():
            cos = 0.0
            for x, y in zip(au, cu):
                cos += x * y
            keyed.append((math.floor(cos * 1e12), cid, clab))
        keyed.sort(key=lambda t: (-t[0], t[1]))
        pos_rank = next(
            i + 1 for i, (_, _, clab) in enumerate(keyed) if clab == alab
        )
        assert rows[aid]["pos_rank"] == pos_rank
        assert abs(rows[aid]["reciprocal_rank"] - round(1.0 / pos_rank, 6)) < 1e-9
        assert rows[aid]["a_label"] == alab


def test_cliffs_delta_twin(spark):
    """Exact pairwise recount of delta = (#greater - #less)/(n1*n2) per
    event type vs rest (sf0.001 is small enough to enumerate via
    sorted-merge counts)."""
    from collections import Counter

    qs = all_queries()
    rows = {r["event_type"]: r for r in qs["agg_cliffs_delta"](spark, SF).collect()}
    con = duckdb.connect()
    data = con.execute(
        f"""SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchall()
    con.close()
    all_counts = Counter(img for _, img in data)
    sorted_vals = sorted(all_counts)
    # prefix counts over the pooled distinct values
    prefix = {}
    run = 0
    for v in sorted_vals:
        prefix[v] = run
        run += all_counts[v]
    n = len(data)
    by_type: dict[str, Counter] = {}
    for et, img in data:
        by_type.setdefault(et, Counter())[img] += 1
    for et, cnts in by_type.items():
        n1 = sum(cnts.values())
        n2 = n - n1
        greater = less = 0
        for v, c in cnts.items():
            below_all = prefix[v]
            above_all = n - prefix[v] - all_counts[v]
            # counts within the same group at strictly lower/higher values
            below_own = sum(c2 for v2, c2 in cnts.items() if v2 < v)
            above_own = n1 - below_own - c
            greater += c * (below_all - below_own)
            less += c * (above_all - above_own)
        delta = (greater - less) / (n1 * n2)
        assert rows[et]["n1"] == n1
        assert rows[et]["n2"] == n2
        assert abs(rows[et]["delta"] - delta) <= 2e-6
        mag = (
            "negligible"
            if abs(rows[et]["delta"]) < 0.147
            else "small"
            if abs(rows[et]["delta"]) < 0.33
            else "medium"
            if abs(rows[et]["delta"]) < 0.474
            else "large"
        )
        assert rows[et]["magnitude"] == mag


def test_brier_ece_twin(spark):
    """Recount Brier/ECE from the raw classifier image in Python."""
    qs = all_queries()
    [row] = qs["agg_brier_ece"](spark, SF).collect()
    con = duckdb.connect()
    data = con.execute(
        f"SELECT embedding, label FROM read_parquet('{SF}/embeddings.parquet')"
    ).fetchall()
    con.close()
    w = [((((i + 17) * 2654435761) % 1000003) % 97 - 48) / 48.0 for i in range(1, 65)]
    import numpy as np

    bins: dict[int, list[int]] = {}
    sq_total = 0
    nn = 0
    for e, lab in data:
        logit = float(np.array([float(x) for x in e]) @ np.array(w))
        p = 1.0 / (1.0 + math.exp(-logit))
        m = math.floor(p * 1e6)
        y = lab % 2
        b = min(m // 100000, 9)
        sm, sy = bins.get(b, (0, 0))
        bins[b] = (sm + m, sy + y)
        sq_total += (m - y * 1000000) ** 2
        nn += 1
    brier = sq_total / (1e12 * nn)
    ece = sum(abs(sm - sy * 1000000) for sm, sy in bins.values()) / (1e6 * nn)
    assert row["n"] == nn
    assert abs(row["brier"] - brier) <= 2e-6
    assert abs(row["ece"] - ece) <= 2e-6


def test_mrr_consistency_with_triplet_mining(spark):
    """Cross-op invariant: an anchor's positive from emb_triplet_mining
    is its FIRST same-label candidate, so pos_rank in rank_mrr must
    point at a candidate with cosine >= that positive's — i.e. the
    reciprocal rank is 1/(1 + #better-than-best-positive)."""
    qs = all_queries()
    mrr = {r["anchor_id"]: r for r in qs["rank_mrr"](spark, SF).collect()}
    trip = {r["anchor_id"]: r for r in qs["emb_triplet_mining"](spark, SF).collect()}
    assert set(mrr) == set(trip)
    for aid, t in trip.items():
        # the mined positive IS the first relevant hit; rank >= 1 always
        assert mrr[aid]["pos_rank"] >= 1
        # and if the hard negative beats the positive, rank must be > 1
        if t["neg_cos"] > t["pos_cos"]:
            assert mrr[aid]["pos_rank"] > 1
