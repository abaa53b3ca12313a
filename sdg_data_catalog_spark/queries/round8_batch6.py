"""Round-8 operator batch 6: Borda rank fusion, Q-Q drift points, and
market-concentration HHI.

- `rank_borda_fusion`: Borda-count fusion of the same lexical+semantic
  rankings `rank_rrf` fuses — the positional-points alternative (score
  = sum of C+1-rank over lists) that weighs HEAD agreement linearly
  where RRF's 1/(k+rank) compresses it; shipping both lets a retrieval
  stack A/B the two standard parameter-free fusions on identical
  candidate lists.
- `dq_qq_points`: deciles of one source's length distribution against
  the pooled rest — the quantile-quantile drift readout that SHOWS
  where a distribution diverges (dq_drift_ks reduces to one statistic;
  the Q-Q points are what a curator plots to see which tail moved).
- `agg_concentration_hhi`: Herfindahl-Hirschman concentration of token
  mass across sources — the dataset-card diversity number (HHI 1/n =
  perfectly even, 1 = single-source corpus) beside the per-source Gini
  (agg_gini_concentration measures within-source skew; HHI measures
  between-source dominance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.data_selection import _dot64, _QVEC, _QVEC_SQL
from sdg_data_catalog_spark.queries.registry import register

_BORDA_C = 1000


@register(
    "rank_borda_fusion",
    oracle=f"""
    WITH joined AS (
      SELECT d.doc_id,
             len(list_filter(string_split_regex(lower(d.text), '[^a-z]+'),
                             t -> t = 'data')) AS lex_tf,
             list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * ({_QVEC_SQL})[i])) AS sem
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    lex AS (
      SELECT doc_id, rn AS lex_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY lex_tf DESC, doc_id ASC) AS rn
        FROM joined) WHERE rn <= {_BORDA_C}
    ),
    sem AS (
      SELECT doc_id, rn AS sem_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY sem DESC, doc_id ASC) AS rn
        FROM joined) WHERE rn <= {_BORDA_C}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.lex_rank, sem.sem_rank,
             COALESCE({_BORDA_C} + 1 - lex.lex_rank, 0)
               + COALESCE({_BORDA_C} + 1 - sem.sem_rank, 0) AS borda
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id,
           CAST(lex_rank AS INTEGER) AS lex_rank,
           CAST(sem_rank AS INTEGER) AS sem_rank,
           CAST(borda AS BIGINT) AS borda
    FROM fused
    ORDER BY borda DESC, doc_id ASC
    LIMIT 20
    """,
)
def rank_borda_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda-count fusion over the SAME two truncated candidate lists as
    `rank_rrf` (lexical term-frequency + fixed-query-vector dot
    product, top-C={_BORDA_C} each): borda(d) = sum over lists of
    (C + 1 - rank), absent ranks scoring 0 — the classic positional
    voting rule (Borda 1784; standard in metasearch since Aslam &
    Montague 2001). The score is a pure INTEGER, so fusion order can
    never ulp-diverge between engines — structurally safer than any
    float-scored fusion. Plan shape identical to rank_rrf: each list
    cut by TakeOrderedAndProject (never a corpus-wide window), ranks
    assigned on the <= C survivors in one bounded single-partition
    window, full outer join to fuse."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    toks = F.split(F.lower("text"), "[^a-z]+")
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        F.size(F.filter(toks, lambda t: t == F.lit("data"))).alias("lex_tf"),
        _dot64(F.col("embedding"), _QVEC).alias("sem"),
    )

    def _toplist(score_col: str, rank_name: str) -> DataFrame:
        top = (
            joined.select("doc_id", score_col)
            .orderBy(F.desc(score_col), F.asc("doc_id"))
            .limit(_BORDA_C)
            .coalesce(1)
        )
        w = Window.partitionBy(F.spark_partition_id()).orderBy(
            F.desc(score_col), F.asc("doc_id")
        )
        return top.select(
            "doc_id", F.row_number().over(w).cast("int").alias(rank_name)
        )

    lex = _toplist("lex_tf", "lex_rank")
    sem = _toplist("sem", "sem_rank")
    fused = lex.join(sem, "doc_id", "full_outer")
    borda = F.coalesce(_BORDA_C + 1 - F.col("lex_rank"), F.lit(0)) + F.coalesce(
        _BORDA_C + 1 - F.col("sem_rank"), F.lit(0)
    )
    return (
        fused.select(
            "doc_id", "lex_rank", "sem_rank", borda.cast("bigint").alias("borda")
        )
        .orderBy(F.desc("borda"), F.asc("doc_id"))
        .limit(20)
    )


_QQ_SRC = "src0"
_QQ_PCTS = tuple(round(p / 10, 1) for p in range(1, 10))  # deciles 0.1..0.9


@register(
    "dq_qq_points",
    oracle=f"""
    WITH q AS (
      SELECT
        {", ".join(f"quantile_cont(CASE WHEN source = '{_QQ_SRC}' THEN CAST(n_chars AS DOUBLE) END, {p}) AS qa{i}, quantile_cont(CASE WHEN source <> '{_QQ_SRC}' THEN CAST(n_chars AS DOUBLE) END, {p}) AS qb{i}" for i, p in enumerate(_QQ_PCTS))}
      FROM documents
    )
    {" UNION ALL ".join(f"SELECT CAST({p} AS DOUBLE) AS p, ROUND(qa{i}, 6) AS q_source, ROUND(qb{i}, 6) AS q_rest, ROUND(qa{i} - qb{i}, 6) AS gap FROM q" for i, p in enumerate(_QQ_PCTS))}
    """,
)
def dq_qq_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile drift points: the nine deciles of one source's
    document-length distribution ({_QQ_SRC}) against the pooled rest —
    the distribution-shape readout behind a Q-Q plot. dq_drift_ks
    collapses drift to one sup-statistic; these points show WHERE the
    distributions diverge (a heavy-tail gap at p=0.9 with equal medians
    means long-doc contamination, not wholesale shift). Exactness:
    interpolated percentiles over integer lengths (Spark `percentile`
    == DuckDB `quantile_cont`, the proven equivalence), identical
    subtraction, ROUND 6dp. One corpus pass: both sides' percentiles
    come from a single conditional aggregation."""
    docs = table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("double")
    agg = docs.agg(
        *[
            F.percentile(F.when(F.col("source") == _QQ_SRC, x), F.lit(p)).alias(
                f"qa{i}"
            )
            for i, p in enumerate(_QQ_PCTS)
        ],
        *[
            F.percentile(F.when(F.col("source") != _QQ_SRC, x), F.lit(p)).alias(
                f"qb{i}"
            )
            for i, p in enumerate(_QQ_PCTS)
        ],
    )
    pts = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"),
                F.round(F.col(f"qa{i}"), 6).alias("q_source"),
                F.round(F.col(f"qb{i}"), 6).alias("q_rest"),
                F.round(F.col(f"qa{i}") - F.col(f"qb{i}"), 6).alias("gap"),
            )
            for i, p in enumerate(_QQ_PCTS)
        ]
    )
    return agg.select(F.explode(pts).alias("r")).select(
        "r.p", "r.q_source", "r.q_rest", "r.gap"
    )


@register(
    "agg_concentration_hhi",
    oracle="""
    WITH g AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w FROM documents
      GROUP BY source
    ),
    t AS (SELECT SUM(w) AS wt, CAST(COUNT(*) AS BIGINT) AS n FROM g)
    SELECT n AS n_sources,
           FLOOR(CAST(SUM(CAST(w AS HUGEINT) * w) AS DOUBLE)
                 / (CAST(wt AS DOUBLE) * wt) * 1e6) / 1e6 AS hhi,
           FLOOR(1.0 / n * 1e6) / 1e6 AS hhi_uniform,
           FLOOR((CAST(SUM(CAST(w AS HUGEINT) * w) AS DOUBLE)
                  / (CAST(wt AS DOUBLE) * wt) - 1.0 / n)
                 / (1.0 - 1.0 / n) * 1e6) / 1e6 AS hhi_normalized
    FROM g, t GROUP BY n, wt
    """,
)
def agg_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of character mass across
    sources: HHI = sum_s (w_s / W)^2 — the between-source dominance
    number a dataset card reports (1/n = perfectly even mix, 1 = one
    source is the corpus), with the n-adjusted normalization
    (HHI - 1/n)/(1 - 1/n) in [0,1]. Complements
    `agg_gini_concentration` (within-source doc-length skew) and
    `agg_entropy_by_group`: HHI is the square-law measure antitrust and
    data-mixing work quote, and its sensitivity to the LARGEST shares
    is exactly what a "one crawl dominates my corpus" check wants.

    Exactness: integer weight sums; sum of squares in decimal/HUGEINT
    (w_s^2 overflows int64 past ~3e9 chars per source); one identical
    double expression per output, floored 1e-6. One combinable corpus
    pass to |sources| rows."""
    docs = table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(F.sum("n_chars").cast("bigint").alias("w"))
    agg = g.agg(
        F.sum(F.col("w").cast("decimal(19,0)") * F.col("w").cast("decimal(19,0)")).alias("sq"),
        F.sum("w").alias("wt"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    hhi = F.col("sq").cast("double") / (F.col("wt").cast("double") * F.col("wt"))
    return agg.select(
        F.col("n").alias("n_sources"),
        (F.floor(hhi * 1e6) / 1e6).alias("hhi"),
        (F.floor(1.0 / F.col("n") * 1e6) / 1e6).alias("hhi_uniform"),
        (
            F.floor((hhi - 1.0 / F.col("n")) / (1.0 - 1.0 / F.col("n")) * 1e6)
            / 1e6
        ).alias("hhi_normalized"),
    )
