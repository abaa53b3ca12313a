"""Round-8 operator batch 8: rank-agreement and rater-agreement
statistics.

- `rank_kendall_tau`: Kendall tau-b between the lexical and semantic
  candidate rankings (the rank_rrf/rank_borda_fusion inputs) — the
  fusion DIAGNOSTIC: fusing two rankings only helps when they disagree
  some (tau well below 1) but not completely (tau near 0 on relevant
  docs means one retriever is noise).
- `agg_spearman_rho`: Spearman rank correlation over the same shared
  candidates — the cheaper rank-agreement number (exact integer d^2
  sums) reported beside tau-b.
- `agg_cohens_kappa`: Cohen's kappa between the threshold classifier
  (the agg_prf _PRED_CASE rule) and the actual event labels — accuracy
  CORRECTED FOR CHANCE agreement, the number inter-annotator and
  weak-labeling audits quote instead of raw accuracy.

All three are exact-integer dataflows until one final double division.
The pair enumeration in tau is bounded BY CONSTRUCTION (top-C candidate
lists, C=1000 -> <= C(C-1)/2 pairs regardless of corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.data_selection import _dot64, _QVEC, _QVEC_SQL
from sdg_data_catalog_spark.queries.registry import register

_TAU_C = 1000

_LISTS_SQL = f"""
    joined AS (
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
        FROM joined) WHERE rn <= {_TAU_C}
    ),
    sem AS (
      SELECT doc_id, rn AS sem_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY sem DESC, doc_id ASC) AS rn
        FROM joined) WHERE rn <= {_TAU_C}
    ),
    shared AS (
      SELECT lex.doc_id, lex_rank, sem_rank
      FROM lex JOIN sem ON sem.doc_id = lex.doc_id
    )
"""


@register(
    "rank_kendall_tau",
    oracle=f"""
    WITH {_LISTS_SQL},
    pairs AS (
      SELECT CASE WHEN (a.lex_rank - b.lex_rank) * (a.sem_rank - b.sem_rank) > 0
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.lex_rank - b.lex_rank) * (a.sem_rank - b.sem_rank) < 0
                  THEN 1 ELSE 0 END AS disc
      FROM shared a JOIN shared b ON a.doc_id < b.doc_id
    ),
    s AS (
      SELECT CAST(SUM(conc) AS BIGINT) AS nc, CAST(SUM(disc) AS BIGINT) AS nd,
             CAST(COUNT(*) AS BIGINT) AS np,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM shared) AS n
      FROM pairs
    )
    SELECT n AS n_shared, nc AS n_concordant, nd AS n_discordant,
           FLOOR(CAST(nc - nd AS DOUBLE) / np * 1e6) / 1e6 AS kendall_tau
    FROM s
    """,
)
def rank_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau over the shared candidates of the lexical and
    semantic top-{_TAU_C} rankings (both ranks are UNIQUE by
    construction — doc_id tie-break — so tau-a == tau-b here):
    tau = (concordant - discordant) / all-pairs. This is the number
    that justifies fusion: tau near 1 means the second retriever adds
    nothing; near 0, one of them is noise for this query; in between
    is where RRF/Borda earn their keep (Croft's rank-fusion folklore,
    measured instead of assumed).

    Scale shape: candidate lists are cut by TakeOrderedAndProject
    (never a corpus-wide window), and the pair join runs on the <= C
    SHARED candidates — <= C(C-1)/2 pairs at ANY corpus size, bounded
    by construction. Counts integer; one final double division."""
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
            .limit(_TAU_C)
            .coalesce(1)
        )
        w = Window.partitionBy(F.spark_partition_id()).orderBy(
            F.desc(score_col), F.asc("doc_id")
        )
        return top.select(
            "doc_id", F.row_number().over(w).cast("int").alias(rank_name)
        )

    shared = (
        _toplist("lex_tf", "lex_rank")
        .join(_toplist("sem", "sem_rank"), "doc_id")
        .localCheckpoint(eager=True)  # <= C rows; pair join + count consume it
    )
    a, b = shared.alias("a"), shared.alias("b")
    prod = (F.col("a.lex_rank") - F.col("b.lex_rank")) * (
        F.col("a.sem_rank") - F.col("b.sem_rank")
    )
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.when(prod > 0, 1).otherwise(0).alias("conc"),
        F.when(prod < 0, 1).otherwise(0).alias("disc"),
    )
    n = shared.count()  # bounded <= C by construction
    s = pairs.agg(
        F.sum("conc").cast("bigint").alias("nc"),
        F.sum("disc").cast("bigint").alias("nd"),
        F.count(F.lit(1)).cast("bigint").alias("np"),
    )
    return s.select(
        F.lit(n).cast("bigint").alias("n_shared"),
        F.col("nc").alias("n_concordant"),
        F.col("nd").alias("n_discordant"),
        (
            F.floor((F.col("nc") - F.col("nd")).cast("double") / F.col("np") * 1e6)
            / 1e6
        ).alias("kendall_tau"),
    )


@register(
    "agg_spearman_rho",
    oracle=f"""
    WITH {_LISTS_SQL},
    rr AS (
      SELECT ROW_NUMBER() OVER (ORDER BY lex_rank) AS ra,
             ROW_NUMBER() OVER (ORDER BY sem_rank) AS rb
      FROM shared
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS d2
      FROM rr
    )
    SELECT n AS n_shared, d2 AS sum_d_sq,
           FLOOR((1.0 - 6.0 * d2 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * n - 1)))
                 * 1e6) / 1e6 AS spearman_rho
    FROM s
    """,
)
def agg_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation over the same shared candidate set as
    rank_kendall_tau, after re-ranking each list WITHIN the
    intersection (the standard treatment — global ranks of dropped
    candidates must not leak into the statistic):
    rho = 1 - 6*sum(d^2) / (n(n^2-1)). Ranks are unique, so no tie
    correction applies; sum(d^2) is an exact integer, making rho one
    identical double expression on both engines. Kendall counts pair
    inversions (robust, O(C^2) bounded here); Spearman is the O(C log C)
    moment form — reporting both is standard practice."""
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
            .limit(_TAU_C)
            .coalesce(1)
        )
        w = Window.partitionBy(F.spark_partition_id()).orderBy(
            F.desc(score_col), F.asc("doc_id")
        )
        return top.select(
            "doc_id", F.row_number().over(w).cast("int").alias(rank_name)
        )

    shared = (
        _toplist("lex_tf", "lex_rank")
        .join(_toplist("sem", "sem_rank"), "doc_id")
        .coalesce(1)  # <= C rows by construction
    )
    wa = Window.partitionBy(F.spark_partition_id()).orderBy("lex_rank")
    wb = Window.partitionBy(F.spark_partition_id()).orderBy("sem_rank")
    rr = shared.select(
        F.row_number().over(wa).alias("ra"), F.row_number().over(wb).alias("rb")
    )
    d2 = F.sum(
        ((F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))).cast("bigint")
    )
    s = rr.agg(F.count(F.lit(1)).cast("bigint").alias("n"), d2.alias("d2"))
    rho = 1.0 - 6.0 * F.col("d2") / (
        F.col("n").cast("double") * (F.col("n").cast("double") * F.col("n") - 1)
    )
    return s.select(
        F.col("n").alias("n_shared"),
        F.col("d2").alias("sum_d_sq"),
        (F.floor(rho * 1e6) / 1e6).alias("spearman_rho"),
    )


_PRED_CASE = """CASE WHEN value < 100 THEN 'view' WHEN value < 200 THEN 'click'
                WHEN value < 300 THEN 'signup' WHEN value < 400 THEN 'purchase'
                ELSE 'error' END"""


@register(
    "agg_cohens_kappa",
    oracle=f"""
    WITH grid AS (
      SELECT event_type AS actual, {_PRED_CASE} AS pred,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY actual, pred
    ),
    na AS (SELECT actual AS cls, SUM(n) AS n_a FROM grid GROUP BY actual),
    np AS (SELECT pred AS cls, SUM(n) AS n_p FROM grid GROUP BY pred),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nt,
             CAST(SUM(CASE WHEN actual = pred THEN n ELSE 0 END) AS BIGINT)
               AS agree
      FROM grid
    ),
    ch AS (
      SELECT SUM(CAST(COALESCE(n_a, 0) AS HUGEINT) * COALESCE(n_p, 0))
               AS chance
      FROM na FULL OUTER JOIN np USING (cls)
    )
    SELECT t.nt AS n_total, t.agree AS n_agree,
           FLOOR(CAST(t.agree AS DOUBLE) / t.nt * 1e6) / 1e6 AS p_observed,
           FLOOR(CAST(ch.chance AS DOUBLE) / (CAST(t.nt AS DOUBLE) * t.nt)
                 * 1e6) / 1e6 AS p_chance,
           FLOOR((CAST(t.agree AS DOUBLE) / t.nt
                  - CAST(ch.chance AS DOUBLE) / (CAST(t.nt AS DOUBLE) * t.nt))
                 / (1.0 - CAST(ch.chance AS DOUBLE)
                          / (CAST(t.nt AS DOUBLE) * t.nt))
                 * 1e6) / 1e6 AS kappa
    FROM t, ch
    """,
)
def agg_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the value-threshold classifier (agg_prf's
    rule) and the actual event labels: kappa = (p_o - p_e)/(1 - p_e)
    with chance agreement p_e = sum_c p_actual(c) * p_pred(c) — raw
    accuracy corrected for what label imbalance alone would produce
    (Cohen 1960; the standard inter-annotator/weak-label agreement
    number — a 90%-majority class makes 90% accuracy trivial, and
    kappa ~ 0 exposes it).

    Plan (agg_prf template): ONE corpus pass builds the |classes|^2
    confusion grid (checkpointed — marginals and totals consume it);
    the chance term sums n_a*n_p in decimal/HUGEINT (overflows int64
    past ~3e9-row classes); kappa is one identical double expression,
    floored 1e-6."""
    ev = table(spark, sf_dir, "events")
    grid = (
        ev.select(
            F.col("event_type").alias("actual"), F.expr(_PRED_CASE).alias("pred")
        )
        .groupBy("actual", "pred")
        .agg(F.count("*").cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    na = grid.groupBy(F.col("actual").alias("cls")).agg(F.sum("n").alias("n_a"))
    np_ = grid.groupBy(F.col("pred").alias("cls")).agg(F.sum("n").alias("n_p"))
    t = grid.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(F.when(F.col("actual") == F.col("pred"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    ch = (
        na.join(np_, "cls", "full_outer")
        .agg(
            F.sum(
                F.coalesce(F.col("n_a"), F.lit(0)).cast("decimal(19,0)")
                * F.coalesce(F.col("n_p"), F.lit(0)).cast("decimal(19,0)")
            ).alias("chance")
        )
    )
    po = F.col("agree").cast("double") / F.col("nt")
    pe = F.col("chance").cast("double") / (F.col("nt").cast("double") * F.col("nt"))
    return t.crossJoin(F.broadcast(ch)).select(
        F.col("nt").alias("n_total"),
        F.col("agree").alias("n_agree"),
        (F.floor(po * 1e6) / 1e6).alias("p_observed"),
        (F.floor(pe * 1e6) / 1e6).alias("p_chance"),
        (F.floor((po - pe) / (1.0 - pe) * 1e6) / 1e6).alias("kappa"),
    )
