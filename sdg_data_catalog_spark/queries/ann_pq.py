"""Product-quantization ANN registration (rows-only by declared design:
the per-subspace k-means codebooks are iterative float optimization, not
SQL-expressible — same rationale as `sim_ann_ivf_topk`; correctness is
carried by the recall/self-retrieval differential tests in
tests/test_ann_pq.py against the oracle-checked `sim_knn_bruteforce`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import pq
from sdg_data_catalog_spark.queries.registry import register

N_QUERIES = 10
TOPK = 10


def _normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings L2-normalized map-side, so PQ's L2 ADC ranks like the
    cosine the brute-force baseline uses (||a-b||² = 2-2·cos on unit
    vectors)."""
    emb = table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)
    )
    unit = F.transform("embedding", lambda x: x / norm)
    return emb.select("vec_id", unit.alias("embedding"))


N_CELLS = 16
N_PROBE = 4


@register("sim_ann_ivfpq_topk")
def sim_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production composition this module's docstrings
    promise: the IVF coarse quantizer (operators/similarity.py) prunes
    the candidate set to the query's `n_probe` nearest cells, and PQ
    codes of the RESIDUAL (x − centroid) are scored with per-(query,
    cell) ADC lookup tables — residual encoding is what makes IVF-PQ
    beat flat PQ (residuals concentrate near zero, so the same 16×16
    codebook spends its resolution where the data is; Jégou et al.
    TPAMI 2011, §IV). Shape at 100 TB: candidates move through ONE
    equi-join on cell_id (never a cross join), codes are 32× smaller
    than vectors, and the only broadcast state is 16 centroids + the
    query LUTs."""
    import pandas as pd

    from sdg_data_catalog_spark.operators import similarity as sim

    unit = _normalized(spark, sf_dir)
    cents_df = sim.ivf_centroids(unit, N_CELLS)
    cents = {
        int(r.cell_id): np.asarray(r.centroid, dtype=np.float64)
        for r in cents_df.collect()  # N_CELLS rows — bounded by design
    }
    assigned = sim.ivf_assign(unit, N_CELLS, centroids=cents_df)
    sample_rows = assigned.limit(2000).collect()
    residuals = np.stack(
        [
            np.asarray(r.embedding, dtype=np.float64) - cents[int(r.cell_id)]
            for r in sample_rows
        ]
    )
    books = pq.train_codebooks(residuals, m=16, k=16, iters=10, seed=42)
    m, k, dsub = books.shape
    sc = spark.sparkContext
    bc_cents, bc_books = sc.broadcast(cents), sc.broadcast(books)

    def _enc(batches):
        for pdf in batches:
            vecs = np.stack(pdf["embedding"].to_numpy())
            cell = pdf["cell_id"].to_numpy()
            res = vecs - np.stack([bc_cents.value[int(c)] for c in cell])
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                x = res[:, s * dsub : (s + 1) * dsub]
                d2 = ((x[:, None, :] - bc_books.value[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell_id": cell,
                    "codes": list(codes),
                }
            )

    encoded = assigned.mapInPandas(_enc, "vec_id long, cell_id long, codes array<int>")

    q_assigned = sim.ivf_assign(
        unit.filter(F.col("vec_id") < N_QUERIES),
        N_CELLS,
        n_probe=N_PROBE,
        centroids=cents_df,
    ).collect()  # N_QUERIES × N_PROBE rows — bounded
    luts: dict[tuple[int, int], np.ndarray] = {}
    probes = []
    for r in q_assigned:
        qid, cell = int(r.vec_id), int(r.cell_id)
        res = np.asarray(r.embedding, dtype=np.float64) - cents[cell]
        lut = np.empty((m, k), dtype=np.float64)
        for s in range(m):
            lut[s] = ((books[s] - res[s * dsub : (s + 1) * dsub][None, :]) ** 2).sum(
                axis=1
            )
        luts[(qid, cell)] = lut
        probes.append((qid, cell))
    bc_luts = sc.broadcast(luts)
    probe_df = spark.createDataFrame(probes, "query_id long, cell_id long")

    def _score(batches):
        rows = np.arange(m)
        for pdf in batches:
            out = []
            for (qid, cell), grp in pdf.groupby(["query_id", "cell_id"]):
                lut = bc_luts.value[(int(qid), int(cell))]
                codes = np.stack(grp["codes"].to_numpy())
                adc = lut[rows[None, :], codes].sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": int(qid),
                            "vec_id": grp["vec_id"].to_numpy(),
                            "adc_dist": adc,
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    from pyspark.sql.window import Window

    scored = (
        encoded.join(F.broadcast(probe_df), "cell_id")
        .select("query_id", "cell_id", "vec_id", "codes")
        .mapInPandas(_score, "query_id long, vec_id long, adc_dist double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK)
        .select("query_id", "vec_id", F.round("adc_dist", 6).alias("adc_dist"), "rnk")
    )


@register("sim_ann_pq_topk")
def sim_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 for the first 10 vectors via product quantization
    (operators/pq.py): codebooks trained on a bounded driver-side sample
    (standard PQ practice at any corpus size), corpus encoded to m=16
    codes of 4 dims × 16 centroids in Arrow batches, queries answered
    with broadcast ADC lookup tables + a hash-partitioned top-k window.
    At 100 TB the encoded corpus is 32× smaller than the vectors and the
    scoring pass is table lookups, not float dot products — the rung
    between `sim_ann_ivf_topk` (prunes candidates) and exact rescoring;
    production systems compose the two (IVF-PQ)."""
    unit = _normalized(spark, sf_dir)
    sample = np.stack(
        [r.embedding for r in unit.limit(2000).collect()]
    ).astype(np.float64)
    books = pq.train_codebooks(sample, m=16, k=16, iters=10, seed=42)
    encoded = pq.encode(unit, "embedding", books)
    queries = [
        (int(r.vec_id), np.asarray(r.embedding, dtype=np.float64))
        for r in unit.filter(F.col("vec_id") < N_QUERIES).collect()
    ]
    return pq.adc_topk(encoded, "vec_id", queries, books, topk=TOPK)


def _rerank_weights() -> tuple[list[float], list[float]]:
    """Deterministic first-stage query vector q and folded bilinear row
    t_j = Σ_i q_i·W_ij, both from pure integer arithmetic (the
    udf_bert_classify weight pattern) — reproducible bit-for-bit in any
    engine, no RNG, no stored artifacts."""
    def w(i: int, j: int) -> float:
        return (((i * 64 + j + 101) * 2654435761) % 1000003 % 97 - 48) / 48.0

    q = [(((i + 29) * 2654435761) % 1000003 % 97 - 48) / 48.0 for i in range(64)]
    t = [sum(q[i] * w(i, j) for i in range(64)) for j in range(64)]
    return q, t


_RERANK_Q, _RERANK_T = _rerank_weights()
_Q_SQL = "[" + ", ".join(repr(x) for x in _RERANK_Q) + "]"
_T_SQL = "[" + ", ".join(repr(x) for x in _RERANK_T) + "]"


@register(
    "sim_rerank_bilinear",
    oracle=f"""
    WITH scored AS (
        SELECT vec_id,
               list_sum(list_transform(range(1, 65),
                   i -> CAST(embedding[i] AS DOUBLE) * ({_Q_SQL})[i])) AS s1,
               list_sum(list_transform(range(1, 65),
                   i -> CAST(embedding[i] AS DOUBLE) * ({_T_SQL})[i])) AS s2
        FROM embeddings
    ),
    top AS (
        SELECT vec_id, s1, s2 FROM scored
        ORDER BY s1 DESC, vec_id ASC LIMIT 20
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY s2 DESC, vec_id ASC) AS INTEGER)
             AS rerank,
           vec_id,
           ROUND(s1, 6) AS stage1_score,
           ROUND(s2, 6) AS stage2_score
    FROM top
    """,
)
def sim_rerank_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: cheap first-stage dot-product recall (top-20
    by q·d — TakeOrderedAndProject over a map-side codegen'd fold, the
    same scan any ANN index would feed) re-ranked by an expensive
    bilinear cross-scorer qᵀW d — the retrieve-then-rerank shape of
    every production search/RAG stack. The bilinear form folds to a
    single precomputed vector t (tⱼ = Σᵢ qᵢWᵢⱼ), so reranking is another
    64-dim dot — computed for ALL rows map-side here because the fold is
    that cheap; with a real cross-encoder the second stage would run
    only on the 20 survivors via mapInPandas (the bound that makes
    reranking affordable at 100 TB). Fixed integer-derived weights make
    both stages hash-checkable — rank order included."""
    emb = table(spark, sf_dir, "embeddings")
    q_lit = F.array(*[F.lit(x) for x in _RERANK_Q])
    t_lit = F.array(*[F.lit(x) for x in _RERANK_T])

    def dot(vec, lit):
        return F.aggregate(
            F.zip_with(vec, lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = emb.select(
        "vec_id",
        dot(F.col("embedding"), q_lit).alias("s1"),
        dot(F.col("embedding"), t_lit).alias("s2"),
    )
    top = scored.orderBy(F.col("s1").desc(), F.col("vec_id").asc()).limit(20)
    w = Window.orderBy(F.col("s2").desc(), F.col("vec_id").asc())
    return top.select(
        F.row_number().over(w).cast("int").alias("rerank"),
        "vec_id",
        F.round("s1", 6).alias("stage1_score"),
        F.round("s2", 6).alias("stage2_score"),
    )
