"""r15 optimization kernels: the direct-form cosine Arrow kernel that
replaced the interpreted HOF chain in knn_bruteforce / ivf_topk
(sim_knn_bruteforce, eval_pr_at_k, sim_ann_ivf_topk) must be
BIT-identical to the sequential left fold the SQL oracles pin —
dot(q,c) / (norm(q)·norm(c)), each sum the (((0+t1)+t2)+…) chain —
AND rank-identical through the (cos DESC, id ASC) window, including
exact cosine ties.

Compared with == on raw doubles, not approx; the retired expression
form is kept as knn_bruteforce_expr and diffed directly.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sdg_data_catalog_spark.operators.similarity import (
    ivf_assign,
    ivf_centroids,
    ivf_topk,
    knn_bruteforce,
    knn_bruteforce_expr,
    raw_cos_topk_pairs,
)

_DIM = 16  # smaller than production DIM; the kernel is dim-agnostic


def _mk_emb(spark, n: int, ties: bool = False):
    rows = []
    for i in range(n):
        if ties and i >= n - 4:
            # exact duplicates of row 1 → exact cosine ties vs every
            # query, forcing the neighbor_id ASC tiebreak through both
            # the per-batch pre-filter and the global window
            xs = [((1 * 31 + d * 17) % 1000) / 499.5 - 1.0 for d in range(_DIM)]
        else:
            xs = [((i * 31 + d * 17) % 1000) / 499.5 - 1.0 for d in range(_DIM)]
        rows.append((i, i % 3, xs))
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )


def _fold_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _direct_cos(q: list[float], c: list[float]) -> float:
    return _fold_dot(q, c) / (
        math.sqrt(_fold_dot(q, q)) * math.sqrt(_fold_dot(c, c))
    )


def test_raw_cos_pairs_bit_identical_to_sequential_fold(spark):
    n, nq = 57, 5
    emb = _mk_emb(spark, n)
    raw = {r.vec_id: list(r.embedding) for r in emb.collect()}
    q_rows = [(i, raw[i], None) for i in range(nq)]
    got = {
        (r.q_id, r.neighbor_id): r.cos_sim
        for r in raw_cos_topk_pairs(emb, q_rows, k=n).collect()
    }
    # k=n → no pre-filtering: every non-self pair present, exact doubles
    assert len(got) == nq * (n - 1)
    for (qid, cid), cos in got.items():
        assert cos == _direct_cos(raw[qid], raw[cid]), (qid, cid)


def test_knn_bruteforce_matches_retired_expression_exactly(spark):
    emb = _mk_emb(spark, 61, ties=True).repartition(7)  # multi-batch path
    queries = emb.filter(F.col("vec_id") < 6)
    new = sorted(
        (r.q_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in knn_bruteforce(emb, queries, k=5).collect()
    )
    old = sorted(
        (r.q_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in knn_bruteforce_expr(emb, queries, k=5).collect()
    )
    assert new == old  # rows, ranks AND raw-rounded doubles identical


def test_knn_bruteforce_empty_queries_returns_empty_frame(spark):
    emb = _mk_emb(spark, 10)
    out = knn_bruteforce(emb, emb.filter(F.col("vec_id") < 0), k=5)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["q_id", "neighbor_id", "rank", "cos_sim"]


def test_raw_cos_pairs_rejects_zero_norm_candidates(spark):
    rows = [(0, 0, [0.0] * _DIM), (1, 0, [1.0] * _DIM)]
    emb = spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )
    q_rows = [(1, [1.0] * _DIM, None)]
    with pytest.raises(Exception, match="non-finite"):
        raw_cos_topk_pairs(emb, q_rows, k=5).collect()


def test_ivf_topk_matches_pure_python_reference(spark):
    n = 73
    emb = _mk_emb(spark, n, ties=True).repartition(5)
    cents = ivf_centroids(emb, 8)
    assigned = {
        int(r["vec_id"]): (list(r["embedding"]), int(r["cell_id"]))
        for r in ivf_assign(emb, 8, centroids=cents).collect()
    }
    expect = []
    for qid in range(10):
        q_emb, q_cell = assigned[qid]
        cand = [
            (cid, _direct_cos(q_emb, assigned[cid][0]))
            for cid in assigned
            if cid != qid and assigned[cid][1] == q_cell
        ]
        cand.sort(key=lambda t: (-t[1], t[0]))
        for rank, (cid, cos) in enumerate(cand[:5], start=1):
            expect.append((qid, cid, rank, round(cos, 6)))
    got = sorted(
        (r.q_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in ivf_topk(emb, k=5, n_cells=8).collect()
    )
    assert got == sorted(expect)


def test_ivf_topk_multiprobe_no_duplicate_pairs(spark):
    emb = _mk_emb(spark, 40)
    rows = ivf_topk(emb, k=5, n_cells=8, n_probe=3).collect()
    pairs = [(r.q_id, r.neighbor_id) for r in rows]
    assert len(pairs) == len(set(pairs))
