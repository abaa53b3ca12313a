"""Round-8 operator batch 12: robust trend, multi-rater agreement, and
off-policy evaluation.

- ``ts_theil_sen`` — Theil-Sen robust trend per daily event series: the
  median of all pairwise slopes. OLS (ts_forecast_ols) moves with one
  bad day; Theil-Sen tolerates ~29% contamination — the slope an
  ingest-volume alert should actually page on.
- ``agg_fleiss_kappa`` — Fleiss' kappa across THREE deterministic
  raters (the threshold classifier at 0/+50/−50 shifts) labeling every
  event: the multi-rater generalization of agg_cohens_kappa, the
  number weak-supervision and annotation pipelines quote for panel
  agreement.
- ``eval_ips_snips`` — inverse-propensity-scored (IPS) and
  self-normalized (SNIPS) off-policy value estimates of a target
  policy from logged event data: the counterfactual "what would the
  new policy have earned?" readout computed WITHOUT an experiment —
  the estimator every recommender/bandit team runs before an A/B test
  earns its traffic.

Determinism: Theil-Sen medians select integer-image order statistics
(FLOOR(dy·10⁶/dx) per pair over bounded day windows); Fleiss' counts
are exact integers with one final double expression; IPS/SNIPS reduce
to per-action integer reward sums divided by exact action counts.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000

_DAILY_SQL = f"""
daily AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
)
"""


@register(
    "ts_theil_sen",
    oracle=f"""
    WITH {_DAILY_SQL},
    pairs AS (
      SELECT a.event_type,
             CAST(FLOOR(CAST((b.y - a.y) AS DOUBLE) * 1e6 / (b.day - a.day))
                  AS BIGINT) AS s_img
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day > a.day
    ),
    ranked AS (
      SELECT event_type, s_img,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY s_img) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS np
      FROM pairs
    ),
    med AS (
      SELECT event_type, CAST(MAX(np) AS BIGINT) AS n_pairs,
             MAX(CASE WHEN rk = (np + 1) // 2 THEN s_img END) AS lo,
             MAX(CASE WHEN rk = np // 2 + 1 THEN s_img END) AS hi
      FROM ranked GROUP BY event_type
    ),
    nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM daily GROUP BY event_type)
    SELECT m.event_type, nd.n_days, m.n_pairs,
           ROUND((m.lo + m.hi) / 2.0 / 1e6, 6) AS theil_sen_slope
    FROM med m JOIN nd ON nd.event_type = m.event_type
    ORDER BY m.event_type
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope per event-type daily series: the median of the
    C(n,2) pairwise slopes (dy/dx over day pairs) — the robust trend
    estimator (breakdown point 29%) that one anomalous ingest day
    cannot drag, unlike ts_forecast_ols' least squares. Slopes compare
    as FLOOR(dy·10⁶/dx) int64 images, the median is the average of the
    two middle order statistics (exact integers; one final /2e6), and
    the pair join runs on the bounded per-series DAY table — the
    observation window, never corpus rows, so C(n,2) stays tiny at any
    corpus scale. The day census materializes once (checkpoint) and the
    pair self-join + day counts consume it."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)  # bounded; pair join + day count consume it
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.floor(
            (F.col("b.y") - F.col("a.y")).cast("double")
            * 1e6
            / (F.col("b.day") - F.col("a.day"))
        )
        .cast("bigint")
        .alias("s_img"),
    )
    w = Window.partitionBy("event_type").orderBy("s_img")
    ranked = pairs.select(
        "event_type",
        "s_img",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("np"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        F.max(F.expr("CASE WHEN rk = (np + 1) DIV 2 THEN s_img END")).alias("lo"),
        F.max(F.expr("CASE WHEN rk = np DIV 2 + 1 THEN s_img END")).alias("hi"),
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        med.join(nd, "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            F.round((F.col("lo") + F.col("hi")) / 2.0 / 1e6, 6).alias(
                "theil_sen_slope"
            ),
        )
        .orderBy("event_type")
    )


_RATER = """CASE WHEN value < 100 + {s} THEN 'view'
            WHEN value < 200 + {s} THEN 'click'
            WHEN value < 300 + {s} THEN 'signup'
            WHEN value < 400 + {s} THEN 'purchase'
            ELSE 'error' END"""

_CATS = ("view", "click", "signup", "purchase", "error")


@register(
    "agg_fleiss_kappa",
    oracle=f"""
    WITH rated AS (
      SELECT {_RATER.format(s=0)} AS r1,
             {_RATER.format(s=50)} AS r2,
             {_RATER.format(s=-50)} AS r3
      FROM events
    ),
    peri AS (
      SELECT {' + '.join(
          "(CASE WHEN r1 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r2 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r3 = '" + c + "' THEN 1 ELSE 0 END)"
          + " * (CASE WHEN r1 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r2 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r3 = '" + c + "' THEN 1 ELSE 0 END)"
          for c in _CATS)} AS ssq,
        {', '.join(
          "CASE WHEN r1 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r2 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r3 = '" + c + "' THEN 1 ELSE 0 END AS n_" + c
          for c in _CATS)}
      FROM rated
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ssq) AS BIGINT) AS sum_ssq,
             {', '.join('CAST(SUM(n_' + c + ') AS BIGINT) AS s_' + c
                        for c in _CATS)}
      FROM peri
    )
    SELECT n, sum_ssq,
           ROUND(CAST(sum_ssq - 3 * n AS DOUBLE) / (6.0 * n), 6) AS p_bar,
           ROUND(({' + '.join(
               'CAST(s_' + c + ' AS DOUBLE) * s_' + c for c in _CATS)})
                 / (9.0 * CAST(n AS DOUBLE) * n), 6) AS p_e,
           ROUND((CAST(sum_ssq - 3 * n AS DOUBLE) / (6.0 * n)
                  - ({' + '.join(
                      'CAST(s_' + c + ' AS DOUBLE) * s_' + c
                      for c in _CATS)})
                    / (9.0 * CAST(n AS DOUBLE) * n))
                 / (1.0 - ({' + '.join(
                      'CAST(s_' + c + ' AS DOUBLE) * s_' + c
                      for c in _CATS)})
                    / (9.0 * CAST(n AS DOUBLE) * n)), 6) AS fleiss_kappa
    FROM s
    """,
)
def agg_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa for a 3-rater panel (the threshold classifier at
    shifts 0/+50/−50) labeling every event into 5 categories — the
    standard multi-rater chance-corrected agreement (Cohen's kappa only
    handles 2 raters). Per item with r=3 raters, P_i = (Σ_j n_ij² − r)
    / (r(r−1)), so P̄ = (Σ_items Σ_j n_ij² − 3N)/(6N); chance agreement
    P̄_e = Σ_j p_j² with p_j the pooled category share (9N² total
    assignments squared). ONE corpus pass computes each row's per-
    category rater counts and partial-aggregates the 6 sums — exact
    integers end to end, with kappa one identical double expression,
    ROUND 1e-6."""
    ev = table(spark, sf_dir, "events")
    rated = ev.select(
        F.expr(_RATER.format(s=0)).alias("r1"),
        F.expr(_RATER.format(s=50)).alias("r2"),
        F.expr(_RATER.format(s=-50)).alias("r3"),
    )
    nij = {
        c: sum(
            F.when(F.col(r) == c, 1).otherwise(0) for r in ("r1", "r2", "r3")
        )
        for c in _CATS
    }
    ssq = sum(nij[c] * nij[c] for c in _CATS)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(ssq).cast("bigint").alias("sum_ssq"),
    ] + [F.sum(nij[c]).cast("bigint").alias(f"s_{c}") for c in _CATS]
    s = rated.agg(*aggs)
    p_bar = (F.col("sum_ssq") - 3 * F.col("n")).cast("double") / (6.0 * F.col("n"))
    p_e = sum(
        F.col(f"s_{c}").cast("double") * F.col(f"s_{c}") for c in _CATS
    ) / (9.0 * F.col("n").cast("double") * F.col("n"))
    return s.select(
        "n",
        "sum_ssq",
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round((p_bar - p_e) / (1.0 - p_e), 6).alias("fleiss_kappa"),
    )


@register(
    "eval_ips_snips",
    oracle="""
    WITH logged AS (
      SELECT event_type AS action, user_id,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS r_micro,
             CASE user_id % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                  WHEN 2 THEN 'signup' WHEN 3 THEN 'purchase'
                  ELSE 'error' END AS pi_action
      FROM events
    ),
    act AS (
      SELECT action, CAST(COUNT(*) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN action = pi_action THEN 1 ELSE 0 END)
                  AS BIGINT) AS m_a,
             CAST(SUM(CASE WHEN action = pi_action THEN r_micro ELSE 0 END)
                  AS BIGINT) AS sr_a
      FROM logged GROUP BY action
    ),
    est AS (
      SELECT CAST(SUM(n_a) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(CAST(sr_a AS DOUBLE) / n_a) AS BIGINT))
                  AS BIGINT) AS wq,
             CAST(SUM(CAST(FLOOR(CAST(m_a AS DOUBLE) * 1e9 / n_a) AS BIGINT))
                  AS BIGINT) AS mq
      FROM act
    )
    SELECT n,
           ROUND(wq / 1e6, 6) AS ips_value,
           ROUND(CAST(wq AS DOUBLE) * 1e3 / mq, 6) AS snips_value,
           ROUND(mq / 1e9, 6) AS sum_weights_norm
    FROM est
    """,
)
def eval_ips_snips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation of a deterministic target policy π(user) =
    type-by-(user_id mod 5) from logged event traffic: with logging
    propensities estimated empirically per action (p̂(a) = n_a/N), the
    importance weight of a logged row is 1[a=π(x)]/p̂(a) = N/n_a, so
    IPS  V̂ = (1/N)·Σ r·w = Σ_a (matched-reward sum)_a / n_a and
    SNIPS V̂ = Σ w·r / Σ w — the self-normalized variant that trades a
    little bias for much lower variance when π disagrees often with
    the log. THE pre-A/B counterfactual readout (Horvitz-Thompson '52,
    Swaminathan-Joachims '15).

    Plan: ONE corpus pass partial-aggregates per-action (count, matched
    count, matched micro-reward sum); the estimators fold the ≤5-row
    action table. The per-action quotients are FLOORED integer images
    (micro-reward units; milli-weight at 1e9 scale) summed exactly, so
    no cross-engine float association order survives; the flooring
    slack is ≤1 unit per action, documented. sum_weights_norm (Σw/N)
    near 1 certifies the propensity model; far from 1 flags support
    mismatch. sr_a stays exact in double to ~9·10¹⁵ micro-reward per
    action (~10⁹ rows at this reward scale) — decimal past that."""
    ev = table(spark, sf_dir, "events")
    pi_action = F.expr(
        """CASE user_id % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
           WHEN 2 THEN 'signup' WHEN 3 THEN 'purchase' ELSE 'error' END"""
    )
    logged = ev.select(
        F.col("event_type").alias("action"),
        F.floor(F.col("value") * 1e6).cast("bigint").alias("r_micro"),
        (F.col("event_type") == pi_action).alias("matched"),
    )
    act = logged.groupBy("action").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("matched"), 1).otherwise(0)).cast("bigint").alias("m_a"),
        F.sum(F.when(F.col("matched"), F.col("r_micro")).otherwise(0))
        .cast("bigint")
        .alias("sr_a"),
    )
    est = act.agg(
        F.sum("n_a").cast("bigint").alias("n"),
        F.sum(
            F.floor(F.col("sr_a").cast("double") / F.col("n_a")).cast("bigint")
        )
        .cast("bigint")
        .alias("wq"),
        F.sum(
            F.floor(F.col("m_a").cast("double") * 1e9 / F.col("n_a")).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("mq"),
    )
    return est.select(
        "n",
        F.round(F.col("wq") / 1e6, 6).alias("ips_value"),
        F.round(F.col("wq").cast("double") * 1e3 / F.col("mq"), 6).alias(
            "snips_value"
        ),
        F.round(F.col("mq") / 1e9, 6).alias("sum_weights_norm"),
    )
