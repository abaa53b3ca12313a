"""Round-8 operator batch 22: rolling association, robust shift
estimation, and recency-weighted features.

- ``win_rolling_corr`` — 14-day rolling Pearson correlation between
  the view and click daily series: the co-movement monitor that a
  single whole-history correlation (ts_xcorr_lagged) averages away —
  a funnel decoupling shows up HERE first.
- ``agg_hodges_lehmann_shift`` — the Hodges-Lehmann estimator of the
  odd-vs-even-user daily-volume shift: the median of all pairwise
  differences, the robust "how much" in ORIGINAL units that
  agg_mann_whitney's rank verdict and agg_cliffs_delta's unitless
  effect size both lack.
- ``feat_decay_score`` — exponentially time-decayed engagement score
  per user (half-life 7 days): THE standard recency-weighted feature
  every ranking/churn model consumes, as a corpus-scale dataflow.

Determinism: rolling sums are window sums of exact integers (integer
addition commutes — no float window-combine hazard), with Pearson one
identical double chain per day; HL is two middle order statistics of
exact integer pairwise differences; decay terms are FLOOR(v·2^(−a/7)
·10⁶) images (identical IEEE exp2 chains) summed exactly per user.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000
_ROLL = 14


@register(
    "win_rolling_corr",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY day
    ),
    w AS (
      SELECT day,
             CAST(COUNT(*) OVER win AS BIGINT) AS n,
             CAST(SUM(x) OVER win AS BIGINT) AS sx,
             CAST(SUM(y) OVER win AS BIGINT) AS sy,
             CAST(SUM(x * y) OVER win AS BIGINT) AS sxy,
             CAST(SUM(x * x) OVER win AS BIGINT) AS sxx,
             CAST(SUM(y * y) OVER win AS BIGINT) AS syy
      FROM daily
      WINDOW win AS (ORDER BY day ROWS BETWEEN {_ROLL - 1} PRECEDING
                     AND CURRENT ROW)
    )
    SELECT CAST(day AS BIGINT) AS day, n AS n_window,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) <= 0
                THEN NULL
                ELSE ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)), 6)
                END AS rolling_r
    FROM w WHERE n = {_ROLL} ORDER BY day
    """,
)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson correlation between daily view and click
    volumes (complete windows only): per day, the five sufficient sums
    come from ONE ROWS-frame window over the bounded day table — window
    sums of exact integers, so no float-combine order can differ — and
    r is one identical double chain per day (NULL when a window has
    zero variance). The day table is observation-window-sized; the
    single-partition window walk (coalesce(1) + spark_partition_id) is
    bounded by days, never corpus rows. ts_xcorr_lagged answers "are
    the series coupled overall?"; this answers "when did they
    decouple?"."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    daily = (
        ev.groupBy(
            F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias(
                "day"
            )
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
        .coalesce(1)  # bounded day table; one partition for the walk
    )
    win = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(-(_ROLL - 1), Window.currentRow)
    )
    w = daily.select(
        "day",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n"),
        F.sum("x").over(win).cast("bigint").alias("sx"),
        F.sum("y").over(win).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).cast("bigint").alias("syy"),
    ).filter(F.col("n") == _ROLL)
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return w.select(
        F.col("day").cast("bigint").alias("day"),
        F.col("n").alias("n_window"),
        F.when(vx * vy <= 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                cov.cast("double")
                / F.sqrt(vx.cast("double") * vy.cast("double")),
                6,
            )
        )
        .alias("rolling_r"),
    ).orderBy("day")


@register(
    "agg_hodges_lehmann_shift",
    oracle=f"""
    WITH daily AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day,
             CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS odd_n,
             CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS even_n
      FROM events GROUP BY day
    ),
    pairs AS (
      SELECT a.odd_n - b.even_n AS d
      FROM daily a CROSS JOIN daily b
    ),
    ranked AS (
      SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS rk,
             COUNT(*) OVER () AS np
      FROM pairs
    )
    SELECT CAST(MAX(np) AS BIGINT) AS n_pairs,
           ROUND((MAX(CASE WHEN rk = (np + 1) // 2 THEN d END)
                  + MAX(CASE WHEN rk = np // 2 + 1 THEN d END)) / 2.0, 6)
             AS hl_shift
    FROM ranked
    """,
)
def agg_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann shift between the odd- and even-user cohorts'
    daily event volumes: the median of ALL pairwise differences
    (odd-day-count − even-day-count over every day pair) — the robust
    location shift in ORIGINAL units that the MWU verdict and Cliff's
    delta don't provide (a launch review needs "odd users do ~37 more
    events/day", not just "p < 0.05, delta small"). The pair grid is
    days² — bounded by the observation window at ANY corpus size — and
    the median is the average of the two middle order statistics of
    exact integer differences (the ts_theil_sen convention)."""
    ev = table(spark, sf_dir, "events").select(
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
        (F.col("user_id") % 2).alias("par"),
    )
    daily = (
        ev.groupBy("day")
        .agg(
            F.sum(F.when(F.col("par") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("odd_n"),
            F.sum(F.when(F.col("par") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("even_n"),
        )
        .localCheckpoint(eager=True)  # bounded; both pair sides consume it
    )
    a = daily.select(F.col("odd_n").alias("x"))
    b = daily.select(F.col("even_n").alias("y"))
    pairs = a.crossJoin(b).select((F.col("x") - F.col("y")).alias("d")).coalesce(
        1
    )
    w = Window.partitionBy(F.spark_partition_id()).orderBy("d")
    ranked = pairs.select(
        "d",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy(F.spark_partition_id()).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("np"),
    )
    return ranked.agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        F.round(
            (
                F.max(F.expr("CASE WHEN rk = (np + 1) DIV 2 THEN d END"))
                + F.max(F.expr("CASE WHEN rk = np DIV 2 + 1 THEN d END"))
            )
            / 2.0,
            6,
        ).alias("hl_shift"),
    )


_HALF_LIFE_DAYS = 7.0
_TOPK = 20


@register(
    "feat_decay_score",
    oracle=f"""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS t_max FROM events),
    terms AS (
      SELECT user_id,
             CAST(FLOOR(value * exp(-0.6931471805599453
                    * ((CAST(mx.t_max - epoch_us(ts) AS DOUBLE))
                       / {_DAY_US} / {_HALF_LIFE_DAYS})) * 1e6)
                  AS BIGINT) AS img
      FROM events CROSS JOIN mx
    ),
    scores AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(img) AS BIGINT) AS s_img
      FROM terms GROUP BY user_id
    )
    SELECT user_id, n_events,
           ROUND(s_img / 1e6, 6) AS decay_score
    FROM scores
    ORDER BY s_img DESC, user_id ASC LIMIT {_TOPK}
    """,
)
def feat_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user, half-life
    {_HALF_LIFE_DAYS:.0f} days from the corpus's last event:
    score = Σ value·2^(−age/half_life) — the recency-weighted feature
    churn/ranking models consume (yesterday's purchase outweighs last
    month's). Per-event decay terms are FLOOR(·10⁶) images of one
    identical IEEE chain (exp of an exact microsecond age — both
    engines compute e^(−ln2·age/h)), summed EXACTLY per user — a raw
    float sum over a user's events would be association-order-dependent
    across engines. One corpus pass, map-side against the broadcast
    1-row t_max; top-{_TOPK} by (score, user_id) is
    TakeOrderedAndProject."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    mx = ev.agg(F.max("ts_us").alias("t_max"))
    img = F.floor(
        F.col("value")
        * F.exp(
            F.lit(-0.6931471805599453)
            * (
                (F.col("t_max") - F.col("ts_us")).cast("double")
                / _DAY_US
                / _HALF_LIFE_DAYS
            )
        )
        * 1e6
    ).cast("bigint")
    scores = (
        ev.crossJoin(F.broadcast(mx))
        .select("user_id", img.alias("img"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("img").cast("bigint").alias("s_img"),
        )
    )
    return (
        scores.orderBy(F.desc("s_img"), F.asc("user_id"))
        .limit(_TOPK)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("s_img") / 1e6, 6).alias("decay_score"),
        )
    )
