"""Iterative driver-coordinated algorithms: Lloyd's k-means over an
embedding column and PageRank over an edge table.

Both follow the same scale pattern: the per-iteration state is O(k) /
O(nodes') small (centroids, dangling mass), lives on the driver, and is
re-broadcast into pure-JVM expressions each round; the data-proportional
work (distance evaluation, contribution aggregation) stays declarative and
distributed. This mirrors how MLlib's own KMeans and GraphX's PageRank
schedule work, re-expressed on the DataFrame API so Catalyst/AQE plan each
round (reference analog: the catalog's scoring surface clusters/scores
driver-side in pandas, /root/reference/dataset_ner/ner_pipeline.py — the
same math, distributed).

Scale notes:
  - k-means collects exactly k*dim doubles per iteration (the new
    centroids) — independent of row count; assignment is one Arrow-batched
    numpy pass (per-dimension ordered accumulation, bit-identical to the
    sequential fold — see _assign), no shuffle; the centroid update is one
    partial-aggregated groupBy(cluster, pos).
  - PageRank shuffles once per iteration on dst (partial-aggregated sum)
    plus one broadcast join of the O(nodes) rank vector onto edges. Rank
    state never leaves the cluster; only the scalar dangling mass is
    collected. For a web-scale graph you'd pre-partition edges by src and
    checkpoint the rank lineage every few rounds (noted, not needed at
    test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(emb_col, centroid: list[float]):
    """Squared L2 distance to a literal centroid, fixed left-to-right
    summation order (deterministic; float elements cast to double first)."""
    cent = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(
            emb_col,
            cent,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(
    vecs: DataFrame, centroids: list[list[float]], keep_dists: bool = False
) -> DataFrame:
    """Add cluster_id = argmin squared distance and __sq the winning
    distance (plus the full k-distance array as __dists when
    keep_dists — lets validity metrics reuse the assignment pass
    instead of re-evaluating k distance expressions). One Arrow pass,
    zero shuffle.

    r14 (guide §4.2, the ivf_assign precedent): the former k
    interpreted-HOF distance expressions cost 16.6/14.9/18.6 s per
    validity op at the 100× replica (×4 assignment passes per fit), and
    the unrolled-expression alternative generated methods past
    HotSpot's JIT size limit (slower still — measured, see
    OPTIMIZATION_r14.md). Here distances accumulate per DIMENSION
    across the batch (vectorized across rows, ordered across dims) —
    bit-identical to the sequential left fold the oracles pin:
    (((0+(x₁−c₁)²)+(x₂−c₂)²)+…; numpy's += is a separate multiply then
    add, no FMA contraction. np.argmin takes the FIRST minimum on
    ties — exactly array_position's first-match / lowest-cluster-id
    rule. Input is pruned to (vec_id, embedding) — every call site
    passes exactly that — and the output embedding is array<double>
    (exact float32 widening; every consumer casts to double anyway)."""
    import numpy as np
    import pandas as pd

    cmat = np.asarray(
        [[float(v) for v in c] for c in centroids], dtype=np.float64
    )
    kk = len(centroids)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            n = len(pdf)
            d2 = np.empty((n, kk), dtype=np.float64)
            for c in range(kk):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(mat.shape[1]):  # ordered across dims
                    diff = mat[:, d] - cmat[c, d]
                    acc += diff * diff
                d2[:, c] = acc
            # No-NaN input contract (r15, ADVICE): np.argmin returns the
            # index of the FIRST NaN, while the retired array_min/
            # array_position expression (Spark SQL ordering) treats NaN
            # as greater than any double — a NaN embedding would silently
            # assign to the NaN-distance cluster here. Fail loud instead.
            if not np.isfinite(d2).all():
                raise ValueError(
                    "_assign: non-finite distance (NaN/Inf embedding) — "
                    "numpy argmin and Spark SQL order NaN differently"
                )
            best = np.argmin(d2, axis=1)  # first min on ties
            out = {
                "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                "embedding": [mat[i] for i in range(n)],
                "cluster_id": best.astype(np.int32),
                "__sq": d2[np.arange(n), best],
            }
            if keep_dists:
                out["__dists"] = [d2[i] for i in range(n)]
            yield pd.DataFrame(out)

    schema = "vec_id long, embedding array<double>, cluster_id int, __sq double"
    if keep_dists:
        schema += ", __dists array<double>"
    return vecs.select("vec_id", "embedding").mapInPandas(assign, schema)


def kmeans_fit(
    vecs: DataFrame, k: int, iters: int, keep_dists: bool = False
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means returning BOTH the final (vec_id, cluster_id,
    __sq) assignment frame and the fitted centroid list (k·dim driver
    floats) — the centroids feed the clustering-validity operators
    (silhouette, Davies-Bouldin) without re-running the loop.

    Input: (vec_id bigint, embedding array<float|double>).
    """
    init = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select("embedding")
        .collect()
    )
    if len(init) < k:
        raise ValueError(
            f"kmeans_fit: k={k} exceeds input row count {len(init)}"
        )
    centroids = [[float(x) for x in r.embedding] for r in init]
    for _ in range(iters):
        assigned = _assign(vecs, centroids).drop("__sq")
        # Pin each averaged component to a 1e-9 lattice: AVG is an
        # association-order-dependent float sum (partition layout on Spark,
        # scan order on any oracle engine), so downstream FLOOR(·1e6)
        # images must never consume the raw average — after rounding, both
        # engines run identical IEEE chains on identical inputs and every
        # floor/round boundary resolves identically. Mirrored in the
        # DuckDB oracle (_kmeans_oracle_round: ROUND(AVG(..), 9)).
        # Centroid update stays the posexplode → groupBy(cluster, pos)
        # shape: the "64 per-dimension AVG columns, k-row shuffle"
        # alternative was A/B'd r14 and REJECTED — 8.9/9.1/10.9 →
        # 10.1/10.3/12.2 s at the 100× replica across the three validity
        # ops; 64 element_at aggregate states per row cost more than the
        # exploded exchange they remove (map-side partial agg already
        # collapses it to k·dim rows per partition).
        new_rows = (
            assigned.select(
                "cluster_id", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 9).alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cluster.setdefault(r.cluster_id, {})[r.pos] = r.m
        centroids = [
            [by_cluster[c][p] for p in range(len(centroids[0]))]
            if c in by_cluster
            else centroids[c]  # empty cluster keeps its centroid
            for c in range(k)
        ]
    return _assign(vecs, centroids, keep_dists=keep_dists), centroids


def kmeans_assign(vecs: DataFrame, k: int, iters: int) -> DataFrame:
    """Lloyd's k-means: deterministic init (centroids = the k lowest
    vec_ids), `iters` rounds of assign + per-dimension mean, returning the
    final (vec_id, cluster_id, sq_dist) assignment.

    Input: (vec_id bigint, embedding array<float|double>).
    """
    assigned, _ = kmeans_fit(vecs, k, iters)
    return (
        assigned.withColumn("sq_dist", F.round(F.col("__sq"), 6))
        .select("vec_id", "cluster_id", "sq_dist")
    )


def pagerank(edges: DataFrame, damping: float = 0.85, iters: int = 5) -> DataFrame:
    """PageRank by power iteration over a directed edge table
    (src string/long, dst string/long). Dangling-node mass is
    redistributed uniformly each round.

    Returns (node, rank double, un-rounded). Node set = src ∪ dst.
    """
    spark = edges.sparkSession
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    ).cache()
    n = nodes.count()
    if n == 0:
        from pyspark.sql.types import DoubleType, StructField, StructType

        nodes.unpersist()
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("node", edges.schema["src"].dataType),
                    StructField("rank", DoubleType()),
                ]
            ),
        )
    # Loop invariants, computed once: per-src outdegree (cached — it feeds
    # both the contribution join and the dangling anti-join every round) and
    # edges joined with outdegree.
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).cache()
    e = edges.join(outdeg, "src").cache()
    e.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            e.join(F.broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # Dangling mass: rank not emitted because the node has no out-edges.
        dangling = (
            ranks.join(outdeg, ranks.node == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
            .collect()[0].d
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        # Materialize each round and cut lineage: without this the rank
        # lineage deepens every iteration and the broadcast + dangling
        # collect re-evaluate the whole prior chain — O(iters²) recompute.
        # Rebinding drops the prior round's checkpoint reference; its
        # blocks are released by the ContextCleaner on GC (unpersist on a
        # localCheckpointed Dataset is a CacheManager no-op).
        ranks = ranks.localCheckpoint(eager=True)
    # The final ranks are checkpointed — they no longer read the loop
    # invariants, so release those caches before handing the result back.
    for df in (e, outdeg, nodes):
        df.unpersist()
    return ranks


def kcore(edges: DataFrame, k: int, max_rounds: int = 50, require_fixpoint: bool = False) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete nodes
    of (undirected) degree < k until a fixpoint — the dense-subgraph
    extraction used for community cores and spam/botnet detection over
    interaction graphs.

    Scale pattern (matches pagerank above): each round is one degree
    aggregation plus one two-sided left-anti join of the live edge set
    against the deleted-node sliver; the edge frame is localCheckpointed
    per round so lineage stays flat. Work per round is proportional to
    the SURVIVING edges — peeling shrinks the frame monotonically, the
    opposite of a blowup. The fixpoint test (`bad.isEmpty`) is the only
    driver-side value; node sets never leave the cluster.

    Returns (node, degree) for the k-core members (degree = within-core
    undirected degree, ≥ k by construction).
    """
    # undirected simple graph: symmetrize + dedup; self-loops dropped
    simple = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        simple.unionByName(
            simple.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        bad = deg.filter(F.col("degree") < k).select("src").localCheckpoint(eager=True)
        if bad.isEmpty():
            return deg.select(F.col("src").alias("node"), "degree")
        und = (
            und.join(bad, "src", "left_anti")
            .join(bad.withColumnRenamed("src", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    # max_rounds exceeded. With require_fixpoint (set when an unrolled
    # fixed-depth oracle must match bit-for-bit) this is an error — a
    # non-fixpoint result would silently disagree with (or worse, only
    # coincidentally agree with) the oracle's unroll depth.
    if require_fixpoint:
        raise RuntimeError(
            f"kcore did not converge within {max_rounds} rounds; "
            "raise max_rounds (and the oracle unroll depth) together"
        )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.select(F.col("src").alias("node"), "degree")
