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
