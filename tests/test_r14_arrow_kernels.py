"""r14 optimization kernels: the Arrow per-dimension folds that replaced
interpreted HOF chains must be BIT-identical to the sequential left fold
the SQL oracles pin.

Covers operators/similarity.py::unit_cos_pairs (rank_mrr /
emb_triplet_mining / agg_ndcg) and operators/iterative.py::_assign
(kmeans_fit and the three clustering-validity ops): each is recomputed
here with an explicit pure-Python left-to-right fold over float64 —
exactly the (((0+t1)+t2)+…) chain — and compared with == on raw doubles,
not approx.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sdg_data_catalog_spark.operators.iterative import _assign
from sdg_data_catalog_spark.operators.similarity import unit_cos_pairs

_DIM = 16  # smaller than production DIM; both kernels are dim-agnostic


def _mk_emb(spark, n: int):
    rows = [
        (
            i,
            i % 3,
            [((i * 31 + d * 17) % 1000) / 499.5 - 1.0 for d in range(_DIM)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )


def _unit(xs: list[float]) -> list[float]:
    acc = 0.0
    for x in xs:
        acc += x * x
    nrm = math.sqrt(acc)
    return [x / nrm for x in xs]


def _fold_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def test_unit_cos_pairs_bit_identical_to_sequential_fold(spark):
    n, anchors = 57, 5
    emb = _mk_emb(spark, n)
    got = {
        (r.anchor_id, r.cand_id): (r.a_label, r.c_label, r.cos)
        for r in unit_cos_pairs(emb, anchors).collect()
    }
    raw = {r.vec_id: (r.label, list(r.embedding)) for r in emb.collect()}
    units = {i: _unit(xs) for i, (_, xs) in raw.items()}
    expect = {
        (a, c): (raw[a][0], raw[c][0], _fold_dot(units[c], units[a]))
        for a in range(anchors)
        for c in range(anchors, n)
    }
    assert set(got) == set(expect)
    for k, (al, cl, cos) in expect.items():
        gal, gcl, gcos = got[k]
        assert (gal, gcl) == (al, cl), k
        assert gcos == cos, k  # exact doubles, not approx


def test_unit_cos_pairs_candidates_from_zero_includes_anchors(spark):
    emb = _mk_emb(spark, 12)
    rows = unit_cos_pairs(emb, 3, candidates_from=0).collect()
    # whole corpus scored, self-pairs included (callers filter them)
    assert len(rows) == 3 * 12


def test_kmeans_assign_bit_identical_to_sequential_fold(spark):
    n, k = 41, 4
    emb = _mk_emb(spark, n)
    cents = [
        [((c * 7 + d * 3) % 100) / 49.5 - 1.0 for d in range(_DIM)]
        for c in range(k)
    ]
    got = {
        r["vec_id"]: (r["cluster_id"], r["__sq"], list(r["__dists"]))
        for r in _assign(emb, cents, keep_dists=True).collect()
    }
    raw = {r.vec_id: list(r.embedding) for r in emb.collect()}
    for vid, xs in raw.items():
        d2 = []
        for c in cents:
            acc = 0.0
            for x, cv in zip(xs, c):
                diff = x - cv
                acc += diff * diff
            d2.append(acc)
        best = min(range(k), key=lambda i: (d2[i], i))  # first min on ties
        cid, sq, dists = got[vid]
        assert cid == best, vid
        assert sq == d2[best], vid  # exact doubles
        assert dists == d2, vid


def test_kmeans_assign_widens_float_input_exactly(spark):
    rows = [(0, [0.5, -1.25, 3.0] + [0.0] * 13), (1, [1.0] * 16)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[0.0] * 16, [1.0] * 16]
    out = {r.vec_id: r.cluster_id for r in _assign(emb, cents).collect()}
    assert out == {0: 0, 1: 1}
    # output embedding is array<double> (exact float32 widening)
    sch = dict((f.name, f.dataType.simpleString()) for f in _assign(emb, cents).schema)
    assert sch["embedding"] == "array<double>"


def test_unit_cos_pairs_matches_hof_fold_expression(spark):
    """The retired expression formulation (zip_with + aggregate over unit
    vectors) must agree with the Arrow kernel on raw doubles — the exact
    equivalence the r14 rewrite claims."""
    emb = _mk_emb(spark, 23)
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda y: y * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    unit = emb.select(
        "vec_id", F.transform("embedding", lambda x: x / nrm).alias("u")
    )
    q = unit.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("anchor_id"), F.col("u").alias("q_u")
    )
    c = unit.filter(F.col("vec_id") >= 4).select(
        F.col("vec_id").alias("cand_id"), F.col("u").alias("c_u")
    )
    cos = F.aggregate(
        F.zip_with("q_u", "c_u", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    hof = {
        (r.anchor_id, r.cand_id): r.cos
        for r in c.crossJoin(F.broadcast(q)).select("anchor_id", "cand_id", cos.alias("cos")).collect()
    }
    arrow = {
        (r.anchor_id, r.cand_id): r.cos
        for r in unit_cos_pairs(emb, 4).collect()
    }
    assert hof == arrow  # exact doubles across every pair
