"""Round-10 operator batch 13: parametric survival fit, k-NN label
evaluation, langid confusion rollup, and activity-streak census.

- ``agg_weibull_fit`` — parametric Weibull fit of the signup→purchase
  survival clock via the linearized hazard: ln H(t) = k·ln t − k·ln λ,
  OLS over the Nelson-Aalen cumulative-hazard curve (the same clock and
  FLOOR(10⁹·d/n) hazard-term images as agg_nelson_aalen, so the two
  ops reconcile). Shape k > 1 means the purchase hazard RISES with
  account age — the parametric readout the nonparametric curves can't
  give. Regression moments are exact integer sums of FLOOR(10⁶·ln)
  images; k and λ are one identical double expression each.
- ``ml_knn_label_eval`` — leave-self-out 5-NN label prediction for the
  32-vector panel against the full corpus: fold-exact cosine, (cos
  DESC, vec_id) neighbor order, majority vote with (count DESC, label
  ASC) tie-break — classifier evaluation whose every vote is inside the
  hash check. The panel×corpus shape is the honest way exact k-NN eval
  is affordable at scale.
- ``eval_langid_confusion`` — the evaluation rollup of the DEPLOYED
  text_langid heuristic: (actual, predicted) confusion census plus
  per-actual-language recall as an exact integer DIV image. Certifies
  the production langid path end-to-end (zh has no marker profile, so
  its rows document the heuristic's known blind spot honestly).
- ``win_streak_census`` — longest consecutive-active-day streak per
  user via gaps-and-islands (day − per-user dense rank is constant
  within a streak), rolled into a streak-length histogram. Every window
  partitions by user_id — bounded per key at any corpus size.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000

_SURV_SQL = f"""
    ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    signup AS (
      SELECT user_id, MIN(ts_us) AS t0 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    subj AS (
      SELECT s.user_id,
             CASE WHEN MIN(CASE WHEN e.event_type = 'purchase'
                                     AND e.ts_us > s.t0
                                THEN e.ts_us END) IS NOT NULL
                  THEN (MIN(CASE WHEN e.event_type = 'purchase'
                                      AND e.ts_us > s.t0
                                 THEN e.ts_us END) - s.t0) // {_DAY_US}
                  ELSE (MAX(e.ts_us) - s.t0) // {_DAY_US} END AS day,
             CASE WHEN MIN(CASE WHEN e.event_type = 'purchase'
                                     AND e.ts_us > s.t0
                                THEN e.ts_us END) IS NOT NULL
                  THEN 1 ELSE 0 END AS died
      FROM signup s JOIN ev e ON e.user_id = s.user_id
      GROUP BY s.user_id, s.t0
    ),
    risk AS (
      SELECT day,
             CAST(SUM(died) AS BIGINT) AS d,
             CAST(SUM(COUNT(*)) OVER (ORDER BY day DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n
      FROM subj GROUP BY day
    ),
    hazard AS (
      SELECT day,
             CAST(SUM(CASE WHEN d > 0
                  THEN CAST(FLOOR(1e9 * CAST(d AS DOUBLE) / n) AS BIGINT)
                  ELSE 0 END) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS h_x1e9
      FROM risk
    ),
    pts AS (
      SELECT CAST(FLOOR(1000000 * ln(CAST(day AS DOUBLE))) AS BIGINT) AS x,
             CAST(FLOOR(1000000 * ln(CAST(h_x1e9 AS DOUBLE) / 1e9))
                  AS BIGINT) AS y
      FROM hazard WHERE day >= 1 AND h_x1e9 > 0
    )
"""


@register(
    "agg_weibull_fit",
    oracle=f"""
    WITH {_SURV_SQL},
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx,
             CAST(SUM(x * y) AS HUGEINT) AS sxy
      FROM pts
    )
    SELECT n,
           CAST(FLOOR(1e6 * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                AS BIGINT) AS k_x1e6,
           CAST(FLOOR(1e6 * exp(
                -(CAST(sy AS DOUBLE) / n
                  - (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE) / n)
                / (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                   / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                / 1e6
           )) AS BIGINT) AS lambda_days_x1e6,
           CAST(FLOOR(1e6 * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                AS BIGINT) > 1000000 AS hazard_rising
    FROM m
    """,
)
def agg_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull(k, λ) fit of the signup→purchase clock by OLS on the
    linearized Nelson-Aalen hazard (ln H = k·ln t − k·ln λ): the same
    subject table, descending-risk census, and FLOOR(10⁹·d/n) hazard
    images as agg_nelson_aalen (curve-level reconciliation is pinned in
    tests), then exact integer sums of FLOOR(10⁶·ln) point images and
    closed-form slope/intercept as identical double expressions. k > 1
    ⇒ rising hazard (the aging signal); λ is the 63.2% characteristic
    life in days. Corpus-sized work: the per-user subject aggregation;
    every regression input lives on the bounded day census."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
    )
    first_p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("t0")),
            F.col("ts_us"),
        )
    )
    subj = (
        signup.join(ev, "user_id")
        .groupBy("user_id", "t0")
        .agg(first_p.alias("fp"), F.max("ts_us").alias("last"))
        .select(
            F.when(
                F.col("fp").isNotNull(),
                F.expr(f"(fp - t0) DIV {_DAY_US}"),
            )
            .otherwise(F.expr(f"(last - t0) DIV {_DAY_US}"))
            .alias("day"),
            F.when(F.col("fp").isNotNull(), 1).otherwise(0).alias("died"),
        )
    )
    census = (
        subj.groupBy("day")
        .agg(
            F.sum("died").cast("bigint").alias("d"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    w_desc = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy(F.col("day").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = census.select(
        "day", "d", F.sum("c").over(w_desc).cast("bigint").alias("n")
    )
    term = F.when(
        F.col("d") > 0,
        F.floor(1e9 * F.col("d").cast("double") / F.col("n")).cast("bigint"),
    ).otherwise(F.lit(0))
    w_asc = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hazard = risk.select(
        "day", F.sum(term).over(w_asc).cast("bigint").alias("h_x1e9")
    )
    pts = hazard.filter((F.col("day") >= 1) & (F.col("h_x1e9") > 0)).select(
        F.floor(1_000_000 * F.log(F.col("day").cast("double")))
        .cast("bigint")
        .alias("x"),
        F.floor(1_000_000 * F.log(F.col("h_x1e9").cast("double") / 1e9))
        .cast("bigint")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    slope = (
        "CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)"
        " / CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)"
    )
    return m.select(
        "n",
        F.expr(f"CAST(FLOOR(1e6 * {slope}) AS BIGINT)").alias("k_x1e6"),
        F.expr(
            f"CAST(FLOOR(1e6 * exp("
            f"-(CAST(sy AS DOUBLE) / n - ({slope}) * CAST(sx AS DOUBLE) / n)"
            f" / ({slope}) / 1e6"
            f")) AS BIGINT)"
        ).alias("lambda_days_x1e6"),
        (F.expr(f"CAST(FLOOR(1e6 * {slope}) AS BIGINT)") > 1_000_000).alias(
            "hazard_rising"
        ),
    )


def _knn_oracle() -> str:
    from sdg_data_catalog_spark.queries.dedup_similarity import _COS_SQL

    return f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb, label AS true_label
               FROM embeddings WHERE vec_id < 32),
    c AS (SELECT vec_id, embedding AS c_emb, label FROM embeddings),
    nn AS (
        SELECT q_id, true_label, label FROM (
            SELECT q.q_id, q.true_label, c.label,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id
                       ORDER BY {_COS_SQL} DESC, c.vec_id ASC) AS rank
            FROM q CROSS JOIN c WHERE c.vec_id <> q.q_id
        ) WHERE rank <= 5
    ),
    votes AS (
        SELECT q_id, true_label, label, COUNT(*) AS v
        FROM nn GROUP BY q_id, true_label, label
    ),
    pred AS (
        SELECT q_id, true_label, label AS predicted, v FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                        ORDER BY v DESC, label ASC) AS rk
            FROM votes
        ) WHERE rk = 1
    )
    SELECT q_id, CAST(true_label AS INTEGER) AS true_label,
           CAST(predicted AS INTEGER) AS predicted,
           CAST(v AS BIGINT) AS n_votes,
           true_label = predicted AS is_correct
    FROM pred ORDER BY q_id
    """


@register("ml_knn_label_eval", oracle=_knn_oracle())
def ml_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-self-out 5-NN label prediction for the 32-vector panel:
    fold-exact cosine against the whole corpus, (cos DESC, vec_id)
    neighbor ranking, majority vote with the (count DESC, label ASC)
    tie-break — the k-NN classifier evaluation with every neighbor and
    every vote inside the external hash check. Panel×corpus candidate
    generation (the affordable exact shape); the rank window partitions
    by query."""
    from sdg_data_catalog_spark.operators import similarity as S

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("true_label"),
    )
    c = emb.select("vec_id", F.col("embedding").alias("c_emb"), "label")
    cos = S.cosine(F.col("q_emb"), F.col("c_emb"))
    rank_w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    nn = (
        q.crossJoin(c)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "true_label", "vec_id", "label", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= 5)
    )
    votes = nn.groupBy("q_id", "true_label", "label").agg(
        F.count(F.lit(1)).alias("v")
    )
    rk = F.row_number().over(
        Window.partitionBy("q_id").orderBy(F.col("v").desc(), F.col("label"))
    )
    return (
        votes.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "q_id",
            F.col("true_label").cast("int").alias("true_label"),
            F.col("label").cast("int").alias("predicted"),
            F.col("v").cast("bigint").alias("n_votes"),
            (F.col("true_label") == F.col("label")).alias("is_correct"),
        )
        .orderBy("q_id")
    )


def _langid_confusion_oracle() -> str:
    from sdg_data_catalog_spark.queries.text import (
        _LANG_PROFILES,
        _profile_sql,
    )

    return f"""
    WITH scored AS (
      SELECT lang,
             {_profile_sql(_LANG_PROFILES['en'])} AS s_en,
             {_profile_sql(_LANG_PROFILES['fr'])} AS s_fr,
             {_profile_sql(_LANG_PROFILES['de'])} AS s_de,
             {_profile_sql(_LANG_PROFILES['es'])} AS s_es
      FROM documents),
    pred AS (
      SELECT lang AS actual,
             CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                  WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                  WHEN s_de >= s_es THEN 'de'
                  ELSE 'es' END AS predicted
      FROM scored),
    cm AS (
      SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY actual, predicted
    ),
    tot AS (
      SELECT actual, CAST(SUM(n) AS BIGINT) AS n_actual FROM cm GROUP BY actual
    )
    SELECT cm.actual, cm.predicted, cm.n,
           CAST(1000000 * cm.n // tot.n_actual AS BIGINT)
             AS share_of_actual_x1e6
    FROM cm JOIN tot ON tot.actual = cm.actual
    ORDER BY cm.actual, cm.predicted
    """


@register("eval_langid_confusion", oracle=_langid_confusion_oracle())
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion rollup of the deployed text_langid marker heuristic:
    (actual, predicted) census with each cell's share of its actual
    language as an exact integer DIV image — the evaluation view that
    certifies the production langid path and documents its known blind
    spot (zh has no marker profile, so its mass lands on the argmax
    fallback). Same scoring expressions as text_langid (imported, not
    re-derived), one grouped pass, bounded 5×4 output."""
    from sdg_data_catalog_spark.queries.text import _LANG_PROFILES

    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def _score(prof):
        return F.size(F.filter(toks, lambda x: x.isin(*prof)))

    scores = {lg: _score(prof) for lg, prof in _LANG_PROFILES.items()}
    s_en, s_fr, s_de, s_es = (
        scores["en"], scores["fr"], scores["de"], scores["es"],
    )
    pred = (
        F.when((s_en >= s_fr) & (s_en >= s_de) & (s_en >= s_es), "en")
        .when((s_fr >= s_de) & (s_fr >= s_es), "fr")
        .when(s_de >= s_es, "de")
        .otherwise("es")
    )
    cm = (
        docs.select(F.col("lang").alias("actual"), pred.alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = cm.groupBy("actual").agg(F.sum("n").cast("bigint").alias("n_actual"))
    return (
        cm.join(tot, "actual")
        .select(
            "actual",
            "predicted",
            "n",
            F.expr("CAST(1000000 * n DIV n_actual AS BIGINT)").alias(
                "share_of_actual_x1e6"
            ),
        )
        .orderBy("actual", "predicted")
    )


@register(
    "win_streak_census",
    oracle=f"""
    WITH active AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // {_DAY_US} AS day
        FROM events
    ),
    isl AS (
        SELECT user_id, day,
               day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                 AS grp
        FROM active
    ),
    streaks AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
        FROM isl GROUP BY user_id, grp
    ),
    longest AS (
        SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak
        FROM streaks GROUP BY user_id
    )
    SELECT max_streak AS streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM longest GROUP BY max_streak ORDER BY streak_days
    """,
)
def win_streak_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user (gaps-and-islands:
    day − per-user row_number is constant within a run of consecutive
    days), rolled into the streak-length histogram — the engagement
    metric behind every 'N-day streak' feature. Every window partitions
    by user_id (bounded per key); the histogram output is |distinct
    streak lengths| rows at any corpus size."""
    ev = table(spark, sf_dir, "events")
    active = ev.select(
        "user_id",
        F.expr(
            f"CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US} AS BIGINT)"
        ).alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = active.withColumn("grp", F.col("day") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("len").cast("bigint").alias("max_streak")
    )
    return (
        longest.groupBy(F.col("max_streak").alias("streak_days"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("streak_days")
    )
