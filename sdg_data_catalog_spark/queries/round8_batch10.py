"""Round-8 operator batch 10: retrieval / effect-size / calibration
scalars.

- ``rank_mrr`` — Mean-Reciprocal-Rank ingredients per anchor query: the
  rank of the first same-label candidate in each anchor's cosine
  ranking. THE first-relevant-hit retrieval metric (navigational
  queries, dedup-candidate verification, RAG context ranking) — NDCG
  and AP grade the whole list; MRR grades the first hit.
- ``agg_cliffs_delta`` — Cliff's delta effect size per event type vs
  the pooled rest: the nonparametric "how big is the difference"
  companion to agg_mann_whitney's "is there a difference" (a
  significant U on 10^7 rows can be a trivially small effect — the
  delta is what decides whether anyone should care).
- ``agg_brier_ece`` — Brier score + Expected Calibration Error of the
  deterministic classifier head against the embeddings labels: the two
  scalar calibration numbers quoted next to agg_calibration_bins'
  reliability diagram.

Determinism: MRR ranks compare (floor(cos·10¹²), −cand_id) integer
structs (the emb_triplet_mining convention); delta is exact-integer
2U/(n1·n2)−1 from the MWU rank-sum machinery; Brier/ECE reduce to sums
of exact int64 images of FLOOR(p·10⁶) — no float association order
anywhere.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_N_ANCHORS = 32

_UNIT_SQL = """
unit AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(x AS DOUBLE)
                / sqrt(list_sum(list_transform(embedding,
                        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
  FROM embeddings
)
"""

_COS_QC = """list_sum(list_transform(range(1, 65),
    i -> q.u[i] * c.u[i]))"""


@register(
    "rank_mrr",
    oracle=f"""
    WITH {_UNIT_SQL},
    pairs AS (
      SELECT q.vec_id AS anchor_id, q.label AS a_label,
             c.vec_id AS cand_id,
             (c.label = q.label) AS same_label,
             CAST(FLOOR(({_COS_QC}) * 1e12) AS BIGINT) AS k
      FROM unit q JOIN unit c
        ON q.vec_id < {_N_ANCHORS} AND c.vec_id >= {_N_ANCHORS}
    ),
    ranked AS (
      SELECT anchor_id, a_label, same_label,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY k DESC, cand_id ASC) AS rk
      FROM pairs
    )
    SELECT anchor_id, CAST(MAX(a_label) AS BIGINT) AS a_label,
           CAST(MIN(CASE WHEN same_label THEN rk END) AS BIGINT) AS pos_rank,
           ROUND(1.0 / MIN(CASE WHEN same_label THEN rk END), 6)
             AS reciprocal_rank
    FROM ranked GROUP BY anchor_id ORDER BY anchor_id
    """,
)
def rank_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first same-label candidate per anchor
    (vec_id < 32 anchors vs the rest, the emb_triplet_mining split) —
    averaging the reciprocal_rank column IS the corpus MRR. The oracle
    ranks with a per-anchor window; the Spark side never sorts: the
    first relevant hit is the lexical MAX of (k, −cand_id) structs over
    same-label candidates (one partially-aggregated groupBy), and its
    rank is 1 + the count of candidates of ANY label strictly above it
    (a second conditional aggregate against the 32-row broadcast best
    table). Two bounded corpus passes, no corpus-sized window, no
    quadratic blow-up — the candidate side streams map-side against
    broadcast anchors both times. Cosine keys are exact
    (floor(cos·10¹²), −cand_id) integers, so ties and ranks are
    bit-reproducible across engines."""
    from sdg_data_catalog_spark.operators import similarity as S

    emb = table(spark, sf_dir, "embeddings")

    # r14 (guide §4.2): the per-pair normalize+cosine now runs through
    # the Arrow-batched per-dimension fold (S.unit_cos_pairs — bit-
    # identical to the interpreted HOF chain it replaces; 106.4 → 4.2 s (min-of-3)
    # at the 100× replica, see OPTIMIZATION_r14.md for the rejected
    # unrolled-expression middle step). Everything from k on is the
    # unchanged exact-integer machinery.
    def pairs() -> DataFrame:
        return S.unit_cos_pairs(emb, _N_ANCHORS).select(
            "anchor_id",
            "a_label",
            "cand_id",
            (F.col("c_label") == F.col("a_label")).alias("same_label"),
            F.floor(F.col("cos") * 1e12).cast("long").alias("k"),
        )

    pick = F.struct(F.col("k"), (-F.col("cand_id")).alias("nc"))
    best = (
        pairs()
        .filter(F.col("same_label"))
        .groupBy("anchor_id")
        .agg(F.max(pick).alias("b"))
        .select("anchor_id", F.col("b.k").alias("bk"), F.col("b.nc").alias("bnc"))
        .localCheckpoint(eager=True)  # ≤ 32 rows; broadcast into the count pass
    )
    above = (F.col("k") > F.col("bk")) | (
        (F.col("k") == F.col("bk")) & (-F.col("cand_id") > F.col("bnc"))
    )
    counted = (
        pairs()
        .join(F.broadcast(best), "anchor_id")
        .groupBy("anchor_id")
        .agg(
            F.max("a_label").cast("bigint").alias("a_label"),
            (F.sum(F.when(above, 1).otherwise(0)) + 1).cast("bigint").alias("pos_rank"),
        )
    )
    return counted.select(
        "anchor_id",
        "a_label",
        "pos_rank",
        F.round(1.0 / F.col("pos_rank"), 6).alias("reciprocal_rank"),
    ).orderBy("anchor_id")


@register(
    "agg_cliffs_delta",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    pv AS (SELECT img, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM v GROUP BY img, event_type),
    vals AS (SELECT img, CAST(SUM(cnt) AS BIGINT) AS tot FROM pv GROUP BY img),
    pref AS (
      SELECT img, tot,
             CAST(SUM(tot) OVER (ORDER BY img ROWS UNBOUNDED PRECEDING)
                  - tot AS BIGINT) AS prefix
      FROM vals
    ),
    n_all AS (SELECT CAST(SUM(tot) AS BIGINT) AS n FROM vals),
    g AS (
      SELECT p.event_type,
             CAST(SUM(p.cnt) AS BIGINT) AS n1,
             CAST(SUM(p.cnt * (2 * f.prefix + f.tot + 1)) AS BIGINT) AS r2
      FROM pv p JOIN pref f ON p.img = f.img
      GROUP BY p.event_type
    ),
    d AS (
      SELECT g.event_type, g.n1, a.n - g.n1 AS n2,
             ROUND(CAST(g.r2 - g.n1 * (g.n1 + 1) - g.n1 * (a.n - g.n1)
                        AS DOUBLE) / (CAST(g.n1 AS DOUBLE) * (a.n - g.n1)),
                   6) AS delta
      FROM g CROSS JOIN n_all a
    )
    SELECT event_type, n1, n2, delta,
           CASE WHEN abs(delta) < 0.147 THEN 'negligible'
                WHEN abs(delta) < 0.33  THEN 'small'
                WHEN abs(delta) < 0.474 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM d ORDER BY event_type
    """,
)
def agg_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta of each event type's value distribution against the
    pooled rest: δ = P(X>Y) − P(X<Y) = 2U/(n₁n₂) − 1, the ordinal
    effect size that accompanies a Mann-Whitney verdict (with midrank
    U, ties contribute ½ each, which is exactly Cliff's strict-compare
    definition). 2U = 2R₁ − n₁(n₁+1) stays exact int64 from the SAME
    distinct-value prefix-sum machinery as agg_mann_whitney — never a
    quadratic pair comparison, never a corpus ORDER BY window. The
    magnitude bucket uses Romano et al.'s conventional cutoffs applied
    to the ROUNDed delta, so the label can't flip on a sub-1e-6
    cross-engine difference."""
    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1e6).cast("long").alias("img")
    )
    from pyspark import StorageLevel

    pv = (
        ev.groupBy("img", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # distinct-value-grained; totals AND the rank-sum join consume it
    )
    vals = pv.groupBy("img").agg(F.sum("cnt").cast("bigint").alias("tot"))
    pref = running_total(vals, "img", F.col("tot"), "run").select(
        "img", "tot", (F.col("run") - F.col("tot")).alias("prefix")
    )
    n_all = vals.agg(F.sum("tot").cast("bigint").alias("n"))
    g = (
        pv.join(pref, "img")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n1"),
            F.sum(F.col("cnt") * (2 * F.col("prefix") + F.col("tot") + 1))
            .cast("bigint")
            .alias("r2"),
        )
    )
    delta = F.round(
        (
            F.col("r2")
            - F.col("n1") * (F.col("n1") + 1)
            - F.col("n1") * (F.col("n") - F.col("n1"))
        ).cast("double")
        / (F.col("n1").cast("double") * (F.col("n") - F.col("n1"))),
        6,
    )
    d = g.crossJoin(F.broadcast(n_all)).select(
        "event_type",
        "n1",
        (F.col("n") - F.col("n1")).cast("bigint").alias("n2"),
        delta.alias("delta"),
    )
    mag = (
        F.when(F.abs(F.col("delta")) < 0.147, "negligible")
        .when(F.abs(F.col("delta")) < 0.33, "small")
        .when(F.abs(F.col("delta")) < 0.474, "medium")
        .otherwise("large")
    )
    return d.select(
        "event_type", "n1", "n2", "delta", mag.alias("magnitude")
    ).orderBy("event_type")


_BERT_P_SQL = """1.0 / (1.0 + exp(-list_sum(list_transform(range(1, 65),
    i -> CAST(embedding[i] AS DOUBLE)
         * ((((i + 17) * 2654435761) % 1000003 % 97 - 48) / 48.0)))))"""


@register(
    "agg_brier_ece",
    oracle=f"""
    WITH scored AS (
        SELECT CAST(FLOOR(({_BERT_P_SQL}) * 1e6) AS BIGINT) AS m,
               CAST(label % 2 AS BIGINT) AS y
        FROM embeddings
    ),
    bins AS (
        SELECT LEAST(m // 100000, 9) AS bin,
               CAST(COUNT(*) AS BIGINT) AS nb,
               CAST(SUM(m) AS BIGINT) AS sm,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM((m - y * 1000000) * (m - y * 1000000)) AS BIGINT) AS sq
        FROM scored GROUP BY 1
    )
    SELECT CAST(SUM(nb) AS BIGINT) AS n,
           ROUND(CAST(SUM(sq) AS DOUBLE) / (1e12 * SUM(nb)), 6) AS brier,
           ROUND(CAST(SUM(abs(sm - sy * 1000000)) AS DOUBLE)
                 / (1e6 * SUM(nb)), 6) AS ece
    FROM bins
    """,
)
def agg_brier_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score and Expected Calibration Error of the deterministic
    classifier head (udf_bert_classify's scoring path) against the
    embeddings labels — the two scalars a model card quotes beside the
    agg_calibration_bins reliability diagram. Both are computed ON the
    FLOOR(p·10⁶) integer image: Brier = Σ(m − 10⁶y)²/(10¹²N) and
    ECE = Σ_bins |Σm − 10⁶Σy| / (10⁶N) over the same deciles as
    agg_calibration_bins — exact int64 sums end to end (the per-row
    squared term is ≤ 10¹², safe to ~9·10⁶ rows per partial sum in
    int64 — Spark widens sum(bigint) internally, DuckDB runs HUGEINT),
    with floats appearing only in the two final divisions. ONE corpus
    pass into ≤10 bins; the scalars re-aggregate the bin table."""
    from sdg_data_catalog_spark.operators import scoring as SC

    emb = table(spark, sf_dir, "embeddings")
    scored = SC.classify_embeddings(emb).join(
        emb.select("vec_id", (F.col("label") % 2).cast("bigint").alias("y")),
        "vec_id",
    )
    m = F.floor(F.col("p_positive") * 1e6).cast("bigint")
    bins = (
        scored.select(m.alias("m"), "y")
        .groupBy(F.least(F.expr("m DIV 100000"), F.lit(9)).alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nb"),
            F.sum("m").cast("bigint").alias("sm"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(
                (F.col("m") - F.col("y") * 1000000)
                * (F.col("m") - F.col("y") * 1000000)
            )
            .cast("bigint")
            .alias("sq"),
        )
    )
    return bins.agg(
        F.sum("nb").cast("bigint").alias("n"),
        F.round(F.sum("sq").cast("double") / (1e12 * F.sum("nb")), 6).alias("brier"),
        F.round(
            F.sum(F.abs(F.col("sm") - F.col("sy") * 1000000)).cast("double")
            / (1e6 * F.sum("nb")),
            6,
        ).alias("ece"),
    )
