"""Round-7 batch 8: survival analysis and decision-stump training.

- ``agg_survival_km`` — Kaplan-Meier survival curve for time from first
  signup to first purchase, with users who never purchase right-censored
  at their last observed event: the retention/conversion-lifetime
  estimator, computed on the day-grain distinct-duration table (bounded
  by the observation window, never row-proportional after the per-user
  fold).
- ``ml_split_stump`` — train a decision stump as a dataflow: the best
  value-threshold split for predicting purchase events, scored by
  weighted Gini impurity over a fixed d·10^b candidate grid. One
  partially-aggregated pass buckets the corpus; cumulative class counts
  over the ordered (tiny) grid give every candidate's left/right
  contingency exactly; the argmin ties break to the smallest threshold.

Determinism: per-user folds reduce to integer microsecond/day images;
at-risk, death, and censor counts are exact integers; survival folds
log terms in ascending day order inside one bounded window (identical
frame order on both engines); Gini is one identical double expression
per candidate and the argmin compares packed (floor(gini·10⁹), θ/1000)
integers.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000


@register(
    "agg_survival_km",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    signup AS (
      SELECT user_id, MIN(ts_us) AS t0 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    death AS (
      SELECT e.user_id, MIN(e.ts_us) AS tp
      FROM ev e JOIN signup s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts_us > s.t0
      GROUP BY e.user_id
    ),
    last AS (
      SELECT e.user_id, MAX(e.ts_us) AS tl
      FROM ev e JOIN signup s ON e.user_id = s.user_id
      GROUP BY e.user_id
    ),
    subj AS (
      SELECT s.user_id,
             CASE WHEN d.tp IS NOT NULL
                  THEN (d.tp - s.t0) // {_DAY_US}
                  ELSE (l.tl - s.t0) // {_DAY_US} END AS day,
             CASE WHEN d.tp IS NOT NULL THEN 1 ELSE 0 END AS died
      FROM signup s
      JOIN last l ON s.user_id = l.user_id
      LEFT JOIN death d ON s.user_id = d.user_id
    ),
    per_day AS (
      SELECT day, CAST(SUM(died) AS BIGINT) AS n_death,
             CAST(SUM(1 - died) AS BIGINT) AS n_censored
      FROM subj GROUP BY day
    ),
    risk AS (
      SELECT day, n_death, n_censored,
             CAST((SELECT COUNT(*) FROM subj)
                  - COALESCE(SUM(n_death + n_censored)
                             OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM per_day
    )
    SELECT CAST(day AS BIGINT) AS day, n_risk, n_death, n_censored,
           CASE WHEN MAX(CASE WHEN n_death >= n_risk THEN 1 ELSE 0 END)
                     OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) = 1
                THEN 0.0
                ELSE ROUND(exp(SUM(CASE WHEN n_death > 0 AND n_death < n_risk
                                        THEN ln(1.0 - CAST(n_death AS DOUBLE)
                                                      / n_risk)
                                        ELSE 0.0 END)
                               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)),
                           6) END AS survival
    FROM risk ORDER BY day
    """,
)
def agg_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup→purchase conversion: each
    signed-up user contributes a death at their first post-signup
    purchase day or a right-censoring at their last observed day — the
    estimator marketing/retention teams use when conversions are still
    in flight. The corpus folds to one row per user (three
    partially-aggregated min/max passes joined on user_id), then to one
    row per DAY; at-risk counts and the log-survival fold run in bounded
    windows over that day table (observation-window-sized — ~weeks, not
    rows), ordered ascending on both engines so the float fold order is
    pinned. S(t) = Π_{{death days ≤ t}} (1 − d/n) surfaces ROUNDed at
    1e-6."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
        .localCheckpoint(eager=True)  # user-grained; joined once below
    )
    # ONE join + ONE conditional aggregate carries both the first
    # post-signup purchase (tp) and the last observed event (tl) — the
    # unfused form re-scanned events per statistic (8 scans in the plan)
    subj = (
        ev.join(signup, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("t0").alias("t0"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") > F.col("t0")),
                    F.col("ts_us"),
                )
            ).alias("tp"),
            F.max("ts_us").alias("tl"),
        )
        .select(
            F.when(
                F.col("tp").isNotNull(),
                F.expr(f"(tp - t0) DIV {_DAY_US}"),
            )
            .otherwise(F.expr(f"(tl - t0) DIV {_DAY_US}"))
            .alias("day"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("died"),
        )
    )
    per_day = (
        subj.groupBy("day")
        .agg(
            F.sum("died").cast("bigint").alias("n_death"),
            F.sum(1 - F.col("died")).cast("bigint").alias("n_censored"),
        )
        .coalesce(1)  # observation-window-sized; one partition for the folds
        .localCheckpoint(eager=True)  # two consumers (totals + risk walk)
    )
    # subject total from the day census — not a second pass over subj
    n_subj = per_day.agg(
        F.sum(F.col("n_death") + F.col("n_censored")).cast("bigint").alias("n_subj")
    )
    w_prev = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_day.crossJoin(F.broadcast(n_subj)).withColumn(
        "n_risk",
        (
            F.col("n_subj")
            - F.coalesce(
                F.sum(F.col("n_death") + F.col("n_censored")).over(w_prev),
                F.lit(0),
            )
        ).cast("bigint"),
    )
    # the day everyone at-risk dies sends S to an absorbing 0 — handled as
    # an explicit cumulative flag so the log fold never sees ln(0)
    logterm = F.when(
        (F.col("n_death") > 0) & (F.col("n_death") < F.col("n_risk")),
        F.log(1.0 - F.col("n_death").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    zeroed = F.max(
        F.when(F.col("n_death") >= F.col("n_risk"), 1).otherwise(0)
    ).over(w_cum)
    return risk.select(
        F.col("day").cast("bigint").alias("day"),
        "n_risk",
        "n_death",
        "n_censored",
        F.when(zeroed == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(logterm).over(w_cum)), 6))
        .alias("survival"),
    ).orderBy("day")


# candidate grid: d·10^b thresholds spanning the micro-unit value image
_STUMP_GRID = [d * 10**b for b in range(4, 9) for d in range(1, 10)]
_GRID_SQL = ", ".join(str(t) for t in _STUMP_GRID)


@register(
    "ml_split_stump",
    oracle=f"""
    WITH v AS (
      SELECT CAST(FLOOR(value * 1e6) AS BIGINT) AS img,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    grid AS (SELECT unnest([{_GRID_SQL}]) AS thr),
    agg AS (
      SELECT g.thr,
             CAST(SUM(CASE WHEN v.img < g.thr THEN 1 ELSE 0 END) AS BIGINT)
               AS nl,
             CAST(SUM(CASE WHEN v.img < g.thr THEN v.y ELSE 0 END) AS BIGINT)
               AS pl,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v.y) AS BIGINT) AS p
      FROM grid g CROSS JOIN v GROUP BY g.thr
    ),
    scored AS (
      SELECT thr, nl, pl, n - nl AS nr, p - pl AS pr,
             ROUND(CASE WHEN nl = 0 OR n - nl = 0 THEN 2.0 ELSE
               (nl * (1.0 - (CAST(pl AS DOUBLE)/nl)*(CAST(pl AS DOUBLE)/nl)
                          - (CAST(nl-pl AS DOUBLE)/nl)*(CAST(nl-pl AS DOUBLE)/nl))
                + (n-nl) * (1.0 - (CAST(p-pl AS DOUBLE)/(n-nl))*(CAST(p-pl AS DOUBLE)/(n-nl))
                                - (CAST((n-nl)-(p-pl) AS DOUBLE)/(n-nl))*(CAST((n-nl)-(p-pl) AS DOUBLE)/(n-nl))))
               / n END, 9) AS gini
      FROM agg
    ),
    best AS (
      SELECT MIN(CAST(FLOOR(gini * 1e9) AS BIGINT) * 1000000
                 + CAST(thr // 1000 AS BIGINT)) AS bk
      FROM scored
    )
    SELECT CAST(s.thr AS DOUBLE) / 1e6 AS threshold,
           s.nl AS n_left, s.pl AS pos_left, s.nr AS n_right,
           s.pr AS pos_right, s.gini,
           (CAST(FLOOR(s.gini * 1e9) AS BIGINT) * 1000000
            + CAST(s.thr // 1000 AS BIGINT)) = b.bk AS is_best
    FROM scored s CROSS JOIN best b
    ORDER BY s.thr
    """,
)
def ml_split_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training as a dataflow: score every threshold in a
    fixed d·10^b candidate grid (45 cut points spanning the micro-unit
    value image) by the weighted Gini impurity of the purchase/other
    split it induces, and flag the winner — the split-finding inner loop
    of tree ensembles, distributed. Here the grid is literal, so ONE
    pass conditionally aggregates all 45 contingency tables (the
    dedup_threshold_sweep shape: a broadcast grid crossJoin, partial
    aggregation does the heavy lifting; per-row work is 45 comparisons,
    no 45 scans). Gini per candidate is a single identical double
    expression over exact integer counts; the argmin compares packed
    (floor(gini·10¹²), θ/1000) integers so ties break to the smallest
    threshold on both engines. Degenerate splits (empty side) score the 2.0 sentinel (real Gini is <= 0.5, and the packed key floor(gini*1e9)*1e6 + theta/1000 must stay inside int64)."""
    ev = table(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 1e6).cast("long").alias("img"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    grid = spark.createDataFrame([(t,) for t in _STUMP_GRID], "thr long")
    agg = (
        ev.crossJoin(F.broadcast(grid))
        .groupBy("thr")
        .agg(
            F.sum(F.when(F.col("img") < F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("nl"),
            F.sum(F.when(F.col("img") < F.col("thr"), F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("pl"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("p"),
        )
    )
    scored = agg.selectExpr(
        "thr",
        "nl",
        "pl",
        "n - nl AS nr",
        "p - pl AS pr",
        """ROUND(CASE WHEN nl = 0 OR n - nl = 0 THEN 2.0 ELSE
             (nl * (1.0 - (CAST(pl AS DOUBLE)/nl)*(CAST(pl AS DOUBLE)/nl)
                        - (CAST(nl-pl AS DOUBLE)/nl)*(CAST(nl-pl AS DOUBLE)/nl))
              + (n-nl) * (1.0 - (CAST(p-pl AS DOUBLE)/(n-nl))*(CAST(p-pl AS DOUBLE)/(n-nl))
                              - (CAST((n-nl)-(p-pl) AS DOUBLE)/(n-nl))*(CAST((n-nl)-(p-pl) AS DOUBLE)/(n-nl))))
             / n END, 9) AS gini""",
    ).localCheckpoint(eager=True)  # 45 rows; two consumers (best + output)
    best = scored.agg(
        F.min(
            F.floor(F.col("gini") * 1e9).cast("long") * F.lit(1_000_000)
            + F.expr("CAST(thr DIV 1000 AS BIGINT)")
        ).alias("bk")
    )
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            (F.col("thr").cast("double") / 1e6).alias("threshold"),
            F.col("nl").alias("n_left"),
            F.col("pl").alias("pos_left"),
            F.col("nr").alias("n_right"),
            F.col("pr").alias("pos_right"),
            "gini",
            (
                F.floor(F.col("gini") * 1e9).cast("long") * F.lit(1_000_000)
                + F.expr("CAST(thr DIV 1000 AS BIGINT)")
                == F.col("bk")
            ).alias("is_best"),
        )
        .orderBy("threshold")
    )
