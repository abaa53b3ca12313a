"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a deterministic
random-hyperplane LSH bucketing as the scale path (candidates only within a
bucket — turns O(N^2) into O(N^2 / 2^planes) expected).

All math is built-in higher-order functions (zip_with/aggregate) — JVM-side,
no Python. Products are cast float→double BEFORE multiplying so results are
bit-identical to an external double-precision oracle.

Replaces/extends SURVEY.md §4.3 item 2 (embedding ANN top-k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIM = 64
N_PLANES = 8


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def knn_bruteforce(embeddings: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    queries is expected to be small (it is broadcast); candidates stream
    partition-parallel and rank via window top-k. Output:
    (q_id, neighbor_id, rank, cos_sim)."""
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cand = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    scored = (
        cand.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("q_emb"), F.col("c_emb")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def _plane_component(i: Column | int, j: int) -> Column:
    """Deterministic pseudo-random plane weight in [-1, 1]: pure int64
    arithmetic reproducible in any engine (no RNG, no stored planes)."""
    i_col = i if isinstance(i, Column) else F.lit(i)
    return ((((i_col + F.lit(17 * (j + 1))) * F.lit(2654435761)) % F.lit(1000003)) % F.lit(97) - F.lit(48)) / F.lit(48.0)


def plane_dot(emb: Column, j: int) -> Column:
    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.lit(DIM)),
            lambda i: F.element_at(emb, i).cast("double") * _plane_component(i, j),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_bucket(emb: Column, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket id in [0, 2^n_planes)."""
    bucket: Column = F.lit(0).cast("bigint")
    for j in range(n_planes):
        bucket = bucket + F.when(plane_dot(emb, j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(embeddings: DataFrame, k: int = 1, n_planes: int = N_PLANES) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to LSH-bucket
    collisions. The bucket equi-join shuffles on the bucket key only —
    this is what survives when N makes brute force quadratic."""
    with_bucket = embeddings.select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding"), n_planes).alias("bucket")
    )
    a = with_bucket.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "bucket"
    )
    b = with_bucket.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "bucket"
    )
    scored = a.join(b, "bucket").filter(F.col("q_id") != F.col("neighbor_id")).withColumn(
        "cos_sim", cosine(F.col("q_emb"), F.col("c_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            F.round("cos_sim", 6).alias("cos_sim"),
        )
    )


def cosine_neardup_pairs(embeddings: DataFrame, threshold: float) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold (exact all-pairs;
    swap in ann_lsh_topk bucketing when N^2 is unaffordable)."""
    a = embeddings.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )
