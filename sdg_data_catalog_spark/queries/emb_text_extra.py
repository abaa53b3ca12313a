"""Lexical-diversity scoring and distributed PCA projection.

`text_ttr` rounds out the text-quality family (SURVEY §2.11) with the
type-token and hapax ratios — the lexical-diversity signals that catch
keyword-stuffed or template-generated documents `text_repetition_score`
misses. `emb_pca_project` is the learned counterpart of
`emb_random_projection` (JL): variance-optimal dimensionality reduction
with the covariance accumulated DISTRIBUTED (per-batch outer-product
partials) and only the 64×64 Gram matrix eigendecomposed driver-side —
the split every large-scale PCA uses.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import similarity as S
from sdg_data_catalog_spark.queries.registry import register


@register(
    "text_ttr",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE doc_id % 20 = 0
    ),
    wc AS (
      SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS ttr,
           ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio
    FROM wc
    GROUP BY doc_id
    """,
)
def text_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio + hapax ratio per document: distinct-words /
    total-words and once-only-words / distinct-words — low TTR flags
    keyword stuffing and template spam; a hapax ratio near 1 on a long
    document flags gibberish. One explode + two doc_id-partitioned
    aggregations (the per-(doc, word) count collapses map-side); the
    doc_id % 20 subsample bounds the driver comparison, the operator
    itself is corpus-wide."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    wc = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    return wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)) / F.sum("c").cast("double"), 6).alias("ttr"),
        F.round(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("hapax_ratio"),
    )


N_COMPONENTS = 8


@register("emb_pca_project")
def emb_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection 64 → 8 dims (rows-only by declared design:
    eigendecomposition is iterative float linear algebra; correctness is
    carried by the numpy differential twin in tests/test_emb_text.py —
    subspace agreement up to per-component sign, descending explained
    variance). The distributed split: each Arrow batch emits ONE partial
    (count, per-dim sum, flattened X'X outer-product sum); the driver
    folds the handful of partials (one per partition, never per row),
    eigendecomposes the 64×64 covariance, and broadcasts the top-8
    components for a map-side projection pass. At 100 TB the collected
    state stays (partitions × 4 KB) while both data passes remain fully
    parallel — the standard big-data PCA decomposition."""
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = 64

    def _partials(batches):
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0)],
                    "xx": [(x.T @ x).ravel()],
                }
            )

    parts = emb.mapInPandas(
        _partials, "n long, s array<double>, xx array<double>"
    ).collect()
    n = sum(p.n for p in parts)
    s = np.sum([np.asarray(p.s) for p in parts], axis=0)
    xx = np.sum([np.asarray(p.xx) for p in parts], axis=0).reshape(dim, dim)
    mean = s / n
    cov = xx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:N_COMPONENTS]
    comps = vecs[:, order].T  # (k, dim)
    bc = spark.sparkContext.broadcast((mean, comps))

    def _project(batches):
        m, w = bc.value
        for pdf in batches:
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            proj = np.round((x - m) @ w.T, 6)
            out = {"vec_id": pdf["vec_id"].to_numpy()}
            # Scalar columns, not array<double>: the external canonicalizer
            # sorts every output column with pandas (list cells are
            # unhashable and crash it) — same canon-safety rule as
            # ranking.py's ','-joined vectors.
            for j in range(N_COMPONENTS):
                out[f"proj_{j}"] = proj[:, j]
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(
        f"proj_{j} double" for j in range(N_COMPONENTS)
    )
    return emb.mapInPandas(_project, schema)


# Deterministic MMR query vector (integer-derived — no corpus-mean
# aggregate, whose float partial-agg order is schedule-dependent).
_MMR_QVEC = [(((i + 43) * 2654435761) % 1000003 % 97 - 48) / 48.0 for i in range(64)]
_MMR_QVEC_SQL = "[" + ", ".join(repr(x) for x in _MMR_QVEC) + "]"


def _mmr_oracle(k: int = 10, pool: int = 50) -> str:
    """Generate the MMR oracle: the greedy argmax loop is inherently
    sequential in k, so it is UNROLLED into k chained CTEs (s1..sk), each
    selecting the next pick given the previous chosen set — pure ANSI SQL,
    no recursion, bit-identical to the Python fold greedy because every
    cosine is the same sequential fold and MAX/comparisons are order-free."""
    lam = "CAST(0.7 AS DOUBLE)"
    one_m_lam = f"(CAST(1 AS DOUBLE) - {lam})"
    parts = [f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
rel AS MATERIALIZED (
  SELECT vec_id, emb,
         list_sum(list_transform(range(1, 65),
             i -> emb[i] * ({_MMR_QVEC_SQL})[i]))
           / (sqrt(list_sum(list_transform(emb, y -> y*y)))
              * sqrt(list_sum(list_transform(
                    CAST({_MMR_QVEC_SQL} AS DOUBLE[]), y -> y*y)))) AS rel
  FROM e
),
pool AS MATERIALIZED (SELECT vec_id, emb, rel FROM rel
         ORDER BY rel DESC, vec_id ASC LIMIT {pool}),
sims AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         list_sum(list_transform(range(1, 65), i -> a.emb[i] * b.emb[i]))
           / (sqrt(list_sum(list_transform(a.emb, y -> y*y)))
              * sqrt(list_sum(list_transform(b.emb, y -> y*y)))) AS sim
  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id
),
s1 AS MATERIALIZED (SELECT vec_id, rel, {lam} * rel AS score FROM pool
       ORDER BY {lam} * rel DESC, vec_id ASC LIMIT 1),
c1 AS MATERIALIZED (SELECT vec_id FROM s1)"""]
    for step in range(2, k + 1):
        prev = step - 1
        parts.append(f""",
s{step} AS MATERIALIZED (
  SELECT p.vec_id, p.rel,
         {lam} * p.rel - {one_m_lam} * MAX(s.sim) AS score
  FROM pool p JOIN sims s ON s.ia = p.vec_id
       AND s.ib IN (SELECT vec_id FROM c{prev})
  WHERE p.vec_id NOT IN (SELECT vec_id FROM c{prev})
  GROUP BY p.vec_id, p.rel
  ORDER BY score DESC, p.vec_id ASC LIMIT 1
),
c{step} AS MATERIALIZED (SELECT vec_id FROM c{prev} UNION ALL SELECT vec_id FROM s{step})""")
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, vec_id, rel, score FROM s{i}" for i in range(1, k + 1)
    )
    parts.append(f"""
SELECT CAST(rank AS INTEGER) AS rank, vec_id,
       ROUND(rel, 6) AS relevance, ROUND(score, 6) AS mmr_score
FROM ({union})""")
    return "".join(parts)


@register("rank_mmr", oracle=_mmr_oracle())
def rank_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-10 exemplar selection
    over the embeddings table (operators/similarity.py::mmr_select_exact,
    Carbonell & Goldstein SIGIR'98) — relevant-but-non-redundant picks for
    eval-set curation and few-shot example selection; the redundancy term
    is what plain sim_knn top-k lacks. Retrieval (fixed-query relevance +
    top-50 pool via TakeOrderedAndProject) is distributed; only the ≤50-row
    pool reaches the driver for the inherently-sequential greedy loop.
    Promoted from rows-only in round 5: with the query vector pinned to an
    integer-derived literal and every cosine a sequential fold, the greedy
    is reproducible in ANSI SQL by unrolling its k steps into chained CTEs
    (_mmr_oracle) — the selection, scores, and ranks all hash-match.
    tests/test_phash_mmr.py keeps the independent differential twin plus
    the diversity invariant (MMR's chosen set has lower pairwise-cosine
    mass than relevance-only top-k)."""
    emb = table(spark, sf_dir, "embeddings")
    return S.mmr_select_exact(emb, _MMR_QVEC, k=10, pool=50, lam=0.7)
