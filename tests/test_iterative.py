"""Iterative operators (kmeans_assign, pagerank) against independent
references: a dense-numpy reimplementation of the same deterministic
algorithm, plus analytic invariants (rank mass conservation, dangling
redistribution, guard rails)."""

from __future__ import annotations

import numpy as np
import pytest

from sdg_data_catalog_spark.operators.iterative import kmeans_assign, pagerank


def _np_pagerank(edges: list[tuple[int, int]], damping: float, iters: int):
    """Dense power iteration twin of operators.iterative.pagerank."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        for s, d in edges:
            inflow[idx[d]] += rank[idx[s]] / outdeg[idx[s]]
        dangling = rank[outdeg == 0].sum()
        rank = (1 - damping) / n + damping * (dangling / n + inflow)
    return {node: rank[idx[node]] for node in nodes}


def test_pagerank_matches_numpy_reference(spark):
    # diamond with a dangling sink: 1→2, 1→3, 2→4, 3→4 (4 has no out-edges)
    edges = [(1, 2), (1, 3), (2, 4), (3, 4)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r.node: r.rank for r in pagerank(df, damping=0.85, iters=5).collect()}
    expect = _np_pagerank(edges, 0.85, 5)
    assert set(got) == set(expect)
    for node, r in expect.items():
        assert got[node] == pytest.approx(r, abs=1e-12), node
    # rank mass is conserved (dangling mass redistributed, not dropped)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_cycle_converges_uniform(spark):
    # a pure cycle has the uniform stationary distribution at every iteration
    edges = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r.node: r.rank for r in pagerank(df, iters=3).collect()}
    for node in (1, 2, 3):
        assert got[node] == pytest.approx(1 / 3, abs=1e-12)


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    out = pagerank(df, iters=2)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def _np_kmeans(vecs: np.ndarray, k: int, iters: int):
    """Twin of kmeans_assign's deterministic Lloyd's: init = first k rows
    (k lowest vec_ids), argmin ties to the lowest cluster id, empty
    clusters keep their centroid."""
    centroids = vecs[:k].astype(float).copy()
    # kmeans_fit pins each averaged component to a 1e-9 lattice (see
    # operators/iterative.py) — mirror it so the twin stays exact.
    for _ in range(iters):
        d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            if (assign == c).any():
                centroids[c] = vecs[assign == c].mean(axis=0).round(9)
    d = ((vecs[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d.min(axis=1)


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    blobs = np.vstack(
        [rng.normal(loc, 0.3, size=(20, 4)) for loc in (0.0, 5.0, 10.0)]
    ).round(4)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(blobs)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    got = {
        r.vec_id: (r.cluster_id, r.sq_dist)
        for r in kmeans_assign(df, k=3, iters=4).collect()
    }
    assign, sqd = _np_kmeans(blobs, k=3, iters=4)
    for i in range(len(blobs)):
        assert got[i][0] == assign[i], i
        assert got[i][1] == pytest.approx(round(float(sqd[i]), 6), abs=1e-4), i


def test_kmeans_k_exceeding_rows_raises(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="exceeds input row count"):
        kmeans_assign(df, k=5, iters=1)
