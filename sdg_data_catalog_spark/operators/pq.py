"""Product quantization (PQ) for approximate nearest-neighbor search.

The third rung of the ANN ladder (after `sim_ann_lsh_*` bucketing and
`sim_ann_ivf_topk` coarse quantization, operators/similarity.py): each
vector is split into `m` subspaces, each subspace is vector-quantized
against its own tiny codebook (k centroids), and the whole vector
collapses to `m` small codes — 64 floats become 8 bytes here, a 32×
compression that lets a 100 TB embedding corpus sit in memory as codes.
Query-time ADC (asymmetric distance computation) never decodes: per
query, an (m × k) lookup table of exact subspace distances is built
once, and every candidate's approximate distance is `m` table lookups +
a sum (Jégou, Douze, Schmid: "Product quantization for nearest neighbor
search", TPAMI 2011).

Spark mapping: codebooks are trained driver-side on a bounded sample
(the standard practice at any scale — PQ training needs thousands of
vectors, not the corpus) and broadcast; encoding and ADC scoring are
Arrow-batched mapInPandas over the distributed table, so the corpus
never funnels through the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def train_codebooks(
    sample: np.ndarray, m: int = 8, k: int = 16, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Per-subspace Lloyd's k-means on a training sample → (m, k, d/m)
    codebooks. Deterministic: seeded centroid init, ties broken by
    lowest index. Empty clusters re-seed to the farthest point (the
    standard fix, keeps k live centroids)."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        x = sample[:, s * dsub : (s + 1) * dsub]
        cent = x[rng.choice(n, size=k, replace=n < k)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
                else:
                    cent[c] = x[d2.min(axis=1).argmax()]
        books[s] = cent
    return books


def encode(df: DataFrame, vec_col: str, codebooks: np.ndarray) -> DataFrame:
    """Append `codes`: array<int> of length m — the PQ encoding of
    `vec_col`, computed in Arrow batches with the broadcast codebooks."""
    m, k, dsub = codebooks.shape
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)
    cols = df.columns
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += ", codes array<int>"

    def _enc(batches):
        import pandas as pd

        books = bc.value
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy())
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                x = vecs[:, s * dsub : (s + 1) * dsub]
                d2 = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            out = pdf[cols].copy()
            out["codes"] = list(codes)
            yield out

    return df.mapInPandas(_enc, schema)


def adc_topk(
    encoded: DataFrame,
    id_col: str,
    queries: list[tuple[int, np.ndarray]],
    codebooks: np.ndarray,
    topk: int = 10,
) -> DataFrame:
    """Approximate top-k per query via ADC over the encoded corpus.
    One (m × k) exact-subspace-distance LUT per query is broadcast; each
    Arrow batch scores its rows with m gathers + a sum, and a
    hash-partitioned window keeps the k best per query — no distance
    ever touches the raw vectors, and nothing corpus-sized reaches the
    driver."""
    m, k, dsub = codebooks.shape
    spark = encoded.sparkSession
    luts = {}
    for qid, q in queries:
        lut = np.empty((m, k), dtype=np.float64)
        for s in range(m):
            qs = q[s * dsub : (s + 1) * dsub]
            lut[s] = ((codebooks[s] - qs[None, :]) ** 2).sum(axis=1)
        luts[int(qid)] = lut
    bc = spark.sparkContext.broadcast(luts)

    def _score(batches):
        import pandas as pd

        tables = bc.value
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy())
            frames = []
            for qid, lut in tables.items():
                # Strictly sequential accumulation over subspaces (s = 0..m-1)
                # so the float sum order matches a SQL fold bit-for-bit
                # (numpy's .sum uses 8-way unrolled partials for n >= 8,
                # which would drift in the last ulp vs a sequential fold).
                adc = lut[0, codes[:, 0]].copy()
                for s in range(1, m):
                    adc += lut[s, codes[:, s]]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            id_col: pdf[id_col].to_numpy(),
                            "adc_dist": adc,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    scored = encoded.select(id_col, "codes").mapInPandas(
        _score, f"query_id long, {id_col} long, adc_dist double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .select("query_id", id_col, F.round("adc_dist", 6).alias("adc_dist"), "rnk")
    )
