"""Round-8 operator batch 27: paired nonparametric testing and
sequential-test replay.

- ``agg_wilcoxon_signed_rank`` — the Wilcoxon signed-rank test on
  paired per-user activity (first half vs second half of the
  observation window): the PAIRED twin of agg_mann_whitney — pairing
  removes between-user variance, which an unpaired rank test wastes.
  Completes the classical nonparametric battery.
- ``agg_sprt_replay`` — Wald's Sequential Probability Ratio Test
  replayed over the daily purchase-share stream (H₀: p=0.20 vs
  H₁: p=0.25, α=β=0.05): the cumulative log-likelihood-ratio walk with
  its decision boundaries and the day the experiment WOULD have
  stopped — the "how much earlier could we have called it?" readout
  that motivates sequential testing over fixed-horizon tests.

Determinism: signed ranks ride doubled midrank images over the
|difference| census (exact integers; Σ(t³−t) in decimal); the SPRT
walk uses FLOOR(ln-ratio·10⁹) integer literal weights so every
cumulative LLR is an exact integer and boundary crossings are integer
comparisons.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000


@register(
    "agg_wilcoxon_signed_rank",
    oracle=f"""
    WITH v AS (
      SELECT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
    ),
    mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS m FROM v),
    per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN day >= m THEN 1 ELSE 0 END)
                  - SUM(CASE WHEN day < m THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM v CROSS JOIN mid GROUP BY user_id
    ),
    nz AS (SELECT d, ABS(d) AS ad FROM per_user WHERE d <> 0),
    cen AS (SELECT ad, CAST(COUNT(*) AS BIGINT) AS t,
                   CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS t_pos
            FROM nz GROUP BY ad),
    pref AS (
      SELECT ad, t, t_pos,
             CAST(SUM(t) OVER (ORDER BY ad ROWS UNBOUNDED PRECEDING) - t
                  AS BIGINT) AS prefix
      FROM cen
    ),
    s AS (
      SELECT CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(t_pos * (2 * prefix + t + 1)) AS BIGINT) AS w2,
             CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS DECIMAL(38,0))
               AS ties
      FROM pref
    )
    SELECT n AS n_pairs,
           ROUND(w2 / 2.0, 6) AS w_plus,
           ROUND((w2 / 2.0 - CAST(n AS DOUBLE) * (n + 1) / 4)
                 / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
                        - CAST(ties AS DOUBLE) / 48), 6) AS z
    FROM s
    """,
)
def agg_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of whether per-user activity shifted
    between the two halves of the observation window: each user is a
    PAIR (first-half count, second-half count); zero differences drop
    (the standard treatment); |d| midranks come from one prefix-sum
    pass over the |difference| census, and W⁺ = Σ ranks of positive
    differences with the tie-corrected normal z. Pairing is the point:
    between-user volume variance (huge) cancels inside each pair,
    where agg_mann_whitney on the pooled halves would drown the shift
    in it. 2·W⁺ = Σ t_pos·(2·prefix+t+1) stays exact int64 (the MWU
    rank-sum convention); Σ(t³−t) accumulates in decimal; z is one
    identical double chain, ROUND 1e-6. The census walk is bounded by
    DISTINCT |d| values — activity-delta-range-sized, far below user
    count."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    mid = ev.agg(F.expr("(MIN(day) + MAX(day) + 1) DIV 2").alias("m"))
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.when(F.col("day") >= F.col("m"), 1).otherwise(0))
                - F.sum(F.when(F.col("day") < F.col("m"), 1).otherwise(0))
            )
            .cast("bigint")
            .alias("d")
        )
        .filter(F.col("d") != 0)
    )
    cen = (
        per_user.groupBy(F.abs("d").alias("ad"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("t"),
            F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("t_pos"),
        )
        .coalesce(1)  # |distinct |d|| rows — delta-range-sized
    )
    w_pref = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("ad")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = cen.select(
        "ad",
        "t",
        "t_pos",
        (F.sum("t").over(w_pref) - F.col("t")).cast("bigint").alias("prefix"),
    )
    s = pref.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.col("t_pos") * (2 * F.col("prefix") + F.col("t") + 1))
        .cast("bigint")
        .alias("w2"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        )
        .cast("decimal(38,0)")
        .alias("ties"),
    )
    nd = F.col("n").cast("double")
    z = (F.col("w2") / 2.0 - nd * (F.col("n") + 1) / 4) / F.sqrt(
        nd * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24
        - F.col("ties").cast("double") / 48
    )
    return s.select(
        F.col("n").alias("n_pairs"),
        F.round(F.col("w2") / 2.0, 6).alias("w_plus"),
        F.round(z, 6).alias("z"),
    )


_P0, _P1 = 0.20, 0.25
_L1 = math.floor(math.log(_P1 / _P0) * 1e9)  # per-success LLR, nano
_L0 = math.floor(math.log((1 - _P1) / (1 - _P0)) * 1e9)  # per-failure LLR
_ALPHA = 0.05
_UPPER = math.floor(math.log((1 - _ALPHA) / _ALPHA) * 1e9)
_LOWER = math.floor(math.log(_ALPHA / (1 - _ALPHA)) * 1e9)


@register(
    "agg_sprt_replay",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ),
    walk AS (
      SELECT day, x, n,
             CAST(SUM(x * CAST({_L1} AS BIGINT)
                      + (n - x) * CAST({_L0} AS BIGINT))
                  OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum
      FROM daily
    ),
    flagged AS (
      SELECT day, x, n, cum,
             CASE WHEN cum >= {_UPPER} THEN 'accept_h1'
                  WHEN cum <= {_LOWER} THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM walk
    ),
    first_d AS (
      SELECT COALESCE(MIN(CASE WHEN decision <> 'continue' THEN day END), -1)
               AS first_decision_day
      FROM flagged
    )
    SELECT f.day AS day, f.x AS purchases, f.n AS events,
           ROUND(f.cum / 1e9, 6) AS cum_llr, f.decision,
           CAST(fd.first_decision_day AS BIGINT) AS first_decision_day
    FROM flagged f CROSS JOIN first_d fd ORDER BY f.day
    """,
)
def agg_sprt_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT replay on the daily purchase share — H₀: p=0.20 vs
    H₁: p=0.25 at α=β=0.05: the cumulative log-likelihood ratio
    Λ_t = Σ [x·ln(p₁/p₀) + (n−x)·ln((1−p₁)/(1−p₀))] walks between the
    boundaries ln(α/(1−α)) and ln((1−α)/α); the first crossing day is
    when a sequential test would have STOPPED — usually far before a
    fixed-horizon test's sample size, which is the whole argument for
    sequential experiment monitoring. Per-event LLR increments are
    FLOOR(ln·10⁹) integer LITERALS (computed once in Python, identical
    on both engines by construction), so every cumulative value is an
    exact integer and the boundary verdicts are integer comparisons —
    the walk cannot diverge across engines by even an ulp. The day
    table is bounded; the corpus contributes one counting pass."""
    ev = table(spark, sf_dir, "events").select(
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    daily = (
        ev.groupBy("day")
        .agg(
            F.sum("is_p").cast("bigint").alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .coalesce(1)  # bounded day table; one partition for the walk
        .localCheckpoint(eager=True)  # walk + first-decision consume it
    )
    w_cum = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = daily.select(
        "day",
        "x",
        "n",
        F.sum(
            F.col("x") * F.lit(_L1) + (F.col("n") - F.col("x")) * F.lit(_L0)
        )
        .over(w_cum)
        .cast("bigint")
        .alias("cum"),
    )
    decision = (
        F.when(F.col("cum") >= _UPPER, "accept_h1")
        .when(F.col("cum") <= _LOWER, "accept_h0")
        .otherwise("continue")
    )
    flagged = walk.select(
        "day", "x", "n", "cum", decision.alias("decision")
    ).localCheckpoint(eager=True)  # bounded; output + first-decision consume
    first_d = flagged.agg(
        F.coalesce(
            F.min(
                F.when(F.col("decision") != "continue", F.col("day"))
            ),
            F.lit(-1),
        )
        .cast("bigint")
        .alias("first_decision_day")
    )
    return (
        flagged.crossJoin(F.broadcast(first_d))
        .select(
            F.col("day").cast("bigint").alias("day"),
            F.col("x").alias("purchases"),
            F.col("n").alias("events"),
            F.round(F.col("cum") / 1e9, 6).alias("cum_llr"),
            "decision",
            "first_decision_day",
        )
        .orderBy("day")
    )
