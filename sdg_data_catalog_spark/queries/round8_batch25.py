"""Round-8 operator batch 25: portmanteau autocorrelation testing,
volatility bands, and behavioural entropy rate.

- ``agg_ljung_box`` — the Ljung-Box portmanteau test on the
  ts_forecast_ols residuals (lags 1..7): Durbin-Watson sees only lag 1;
  Ljung-Box catches the weekly echo a daily series hides at lag 7 —
  the standard "is anything left in the residuals?" gate.
- ``win_bollinger_bands`` — 14-day rolling mean ± 2σ envelope over
  daily volumes with breach flags: the volatility-aware monitoring
  band (a fixed threshold pages on every seasonal peak; Bollinger
  scales with local variance).
- ``agg_markov_entropy_rate`` — entropy rate of the per-user action
  Markov chain (the agg_markov_transitions matrix):
  H = −Σᵢ πᵢ Σⱼ Pᵢⱼ ln Pᵢⱼ — how predictable the NEXT action is given
  the current one; the single number that says whether sequence models
  have anything to learn from this event stream.

Determinism: residual autocorrelations ride FLOOR(e·10⁶) images with
decimal lag-product sums; band edges are identical double chains over
exact integer window sums, breach verdicts integer-safe; entropy terms
are FLOOR(·10⁹) images of exact transition-count ratios summed as
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
_LB_LAGS = 7

_DAILY_SQL = f"""
daily AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, day
)
"""

_RES_SQL = """
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(day) AS BIGINT) AS sd, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(day * y) AS BIGINT) AS sdy,
         CAST(SUM(day * day) AS BIGINT) AS sdd
  FROM daily GROUP BY event_type
),
res AS (
  SELECT d.event_type,
         ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day) AS rn,
         CAST(FLOOR((d.y
           - ((CAST(s.sy AS DOUBLE) / s.n)
              + (CAST(s.n * s.sdy - s.sd * s.sy AS DOUBLE)
                 / CAST(s.n * s.sdd - s.sd * s.sd AS DOUBLE))
                * (d.day - CAST(s.sd AS DOUBLE) / s.n))) * 1e6)
           AS BIGINT) AS e
  FROM daily d JOIN s ON s.event_type = d.event_type
)
"""


@register(
    "agg_ljung_box",
    oracle=f"""
    WITH {_DAILY_SQL},
    {_RES_SQL},
    den AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(e AS HUGEINT) * e) AS DECIMAL(38,0)) AS c0
      FROM res GROUP BY event_type
    ),
    lagk AS (
      SELECT a.event_type, (a.rn - b.rn) AS k,
             CAST(SUM(CAST(a.e AS HUGEINT) * b.e) AS DECIMAL(38,0)) AS ck
      FROM res a JOIN res b
        ON b.event_type = a.event_type
       AND a.rn - b.rn BETWEEN 1 AND {_LB_LAGS}
      GROUP BY a.event_type, a.rn - b.rn
    ),
    terms AS (
      SELECT l.event_type, d.n,
             CAST(SUM(CAST(FLOOR(
               (CAST(l.ck AS DOUBLE) / CAST(d.c0 AS DOUBLE))
               * (CAST(l.ck AS DOUBLE) / CAST(d.c0 AS DOUBLE))
               / (d.n - l.k) * 1e12) AS BIGINT)) AS BIGINT) AS t_img,
             CAST(COUNT(*) AS BIGINT) AS n_lags
      FROM lagk l JOIN den d ON d.event_type = l.event_type
      GROUP BY l.event_type, d.n
    )
    SELECT event_type, n AS n_days, n_lags,
           ROUND(CAST(n AS DOUBLE) * (n + 2) * t_img / 1e12, 6) AS lb_stat
    FROM terms ORDER BY event_type
    """,
)
def agg_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q over lags 1..{_LB_LAGS} of the OLS-trend residuals per
    event series: Q = n(n+2)·Σ_k ρ̂_k²/(n−k), ~χ²(lags) under white
    residuals — the multi-lag portmanteau that catches the weekly echo
    agg_durbin_watson's single lag misses. Residuals are FLOOR(e·10⁶)
    images (exact-moment OLS); lag covariances accumulate in decimal
    over the bounded day table via one self-join restricted to lag
    ≤ {_LB_LAGS}; per-lag terms are FLOOR(·10¹²) images of identical
    double chains summed as integers, so the lag-summation order cannot
    differ across engines."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("day").cast("bigint").alias("sd"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("day") * F.col("y")).cast("bigint").alias("sdy"),
        F.sum(F.col("day") * F.col("day")).cast("bigint").alias("sdd"),
    )
    slope = (
        F.col("n") * F.col("sdy") - F.col("sd") * F.col("sy")
    ).cast("double") / (
        F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    ).cast("double")
    fit = (F.col("sy").cast("double") / F.col("n")) + slope * (
        F.col("day") - F.col("sd").cast("double") / F.col("n")
    )
    w_day = Window.partitionBy("event_type").orderBy("day")
    res = (
        daily.join(F.broadcast(s), "event_type")
        .select(
            "event_type",
            F.row_number().over(w_day).alias("rn"),
            F.floor((F.col("y") - fit) * 1e6).cast("bigint").alias("e"),
        )
        .localCheckpoint(eager=True)  # bounded; self-join + c0 consume it
    )
    den = res.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("e").cast("decimal(19,0)") * F.col("e")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("c0"),
    )
    a, b = res.alias("a"), res.alias("b")
    lagk = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.rn") - F.col("b.rn")).between(1, _LB_LAGS),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            (F.col("a.rn") - F.col("b.rn")).alias("k"),
        )
        .agg(
            F.sum(
                (F.col("a.e").cast("decimal(19,0)") * F.col("b.e")).cast(
                    "decimal(38,0)"
                )
            )
            .cast("decimal(38,0)")
            .alias("ck")
        )
    )
    rho = F.col("ck").cast("double") / F.col("c0").cast("double")
    terms = (
        lagk.join(F.broadcast(den), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.sum(
                F.floor(rho * rho / (F.col("n") - F.col("k")) * 1e12).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("t_img"),
            F.count(F.lit(1)).cast("bigint").alias("n_lags"),
        )
    )
    return terms.select(
        "event_type",
        F.col("n").alias("n_days"),
        "n_lags",
        F.round(
            F.col("n").cast("double") * (F.col("n") + 2) * F.col("t_img") / 1e12,
            6,
        ).alias("lb_stat"),
    ).orderBy("event_type")


_BB_WIN = 14


@register(
    "win_bollinger_bands",
    oracle=f"""
    WITH {_DAILY_SQL},
    w AS (
      SELECT event_type, day, y,
             CAST(COUNT(*) OVER win AS BIGINT) AS n,
             CAST(SUM(y) OVER win AS BIGINT) AS s1,
             CAST(SUM(y * y) OVER win AS BIGINT) AS s2
      FROM daily
      WINDOW win AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN {_BB_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(day AS BIGINT) AS day, y,
           ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mid,
           ROUND(CAST(s1 AS DOUBLE) / n
                 - 2.0 * sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                              / (CAST(n AS DOUBLE) * n)), 6) AS lower,
           ROUND(CAST(s1 AS DOUBLE) / n
                 + 2.0 * sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                              / (CAST(n AS DOUBLE) * n)), 6) AS upper,
           CAST(CASE WHEN CAST(y AS DOUBLE)
                          > ROUND(CAST(s1 AS DOUBLE) / n
                            + 2.0 * sqrt((CAST(n AS DOUBLE) * s2
                                          - CAST(s1 AS DOUBLE) * s1)
                                         / (CAST(n AS DOUBLE) * n)), 6)
                     THEN 1
                     WHEN CAST(y AS DOUBLE)
                          < ROUND(CAST(s1 AS DOUBLE) / n
                            - 2.0 * sqrt((CAST(n AS DOUBLE) * s2
                                          - CAST(s1 AS DOUBLE) * s1)
                                         / (CAST(n AS DOUBLE) * n)), 6)
                     THEN -1 ELSE 0 END AS BIGINT) AS breach
    FROM w WHERE n = {_BB_WIN} ORDER BY event_type, day
    """,
)
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over each event type's daily volume: 14-day
    rolling mean ± 2 population standard deviations (complete windows
    only) with a breach flag (+1 above, −1 below) — the volatility-
    scaled alert envelope that a fixed z-threshold monitor lacks. All
    window sums are exact integers; band edges are one identical double
    chain per row, ROUNDed 1e-6 BEFORE the breach comparison so the
    verdict compares a pinned value on both engines (an integer y vs a
    rounded band cannot ulp-flip). The per-type window walks the
    bounded day table — observation-window-sized at any corpus."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_BB_WIN - 1), Window.currentRow)
    )
    w = daily.select(
        "event_type",
        "day",
        "y",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n"),
        F.sum("y").over(win).cast("bigint").alias("s1"),
        F.sum(F.col("y") * F.col("y")).over(win).cast("bigint").alias("s2"),
    ).filter(F.col("n") == _BB_WIN)
    mid = F.col("s1").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("n").cast("double") * F.col("s2")
            - F.col("s1").cast("double") * F.col("s1")
        )
        / (F.col("n").cast("double") * F.col("n"))
    )
    lower = F.round(mid - 2.0 * sd, 6)
    upper = F.round(mid + 2.0 * sd, 6)
    return w.select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        "y",
        F.round(mid, 6).alias("mid"),
        lower.alias("lower"),
        upper.alias("upper"),
        F.when(F.col("y").cast("double") > upper, 1)
        .when(F.col("y").cast("double") < lower, -1)
        .otherwise(0)
        .cast("bigint")
        .alias("breach"),
    ).orderBy("event_type", "day")


@register(
    "agg_markov_entropy_rate",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (
      SELECT event_type AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY src, dst
    ),
    row_t AS (SELECT src, CAST(SUM(c) AS BIGINT) AS rc FROM trans GROUP BY src),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM trans),
    terms AS (
      SELECT t.src,
             CAST(SUM(CAST(FLOOR(-(CAST(t.c AS DOUBLE) / r.rc)
                                 * ln(CAST(t.c AS DOUBLE) / r.rc) * 1e9)
                           AS BIGINT)) AS BIGINT) AS h_nano,
             MAX(r.rc) AS rc
      FROM trans t JOIN row_t r ON r.src = t.src
      GROUP BY t.src
    )
    SELECT (SELECT n FROM tot) AS n_transitions,
           CAST(COUNT(*) AS BIGINT) AS n_states,
           ROUND(CAST(SUM(CAST(FLOOR(CAST(rc AS DOUBLE)
                                     / (SELECT n FROM tot)
                                     * h_nano) AS BIGINT)) AS DOUBLE)
                 / 1e9, 6) AS entropy_rate_nats
    FROM terms
    """,
)
def agg_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user action Markov chain:
    H = Σᵢ π̂ᵢ · Hᵢ with Hᵢ = −Σⱼ Pᵢⱼ ln Pᵢⱼ and π̂ the empirical
    source-state occupancy — 0 nats means the next action is fully
    determined by the current one (sequence models trivially win);
    ln(k) means memoryless uniform (nothing to learn beyond the
    marginal). The number that sizes how much signal next-action
    prediction has. ONE shuffle on user_id builds the transition pairs
    (the agg_markov_transitions window); everything after is
    |states|²-sized. Per-row −p·ln p terms are FLOOR(·10⁹) images on
    exact count ratios; the π-weighted mixture floors each state's
    contribution before the exact integer total — no float association
    order anywhere."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    trans = (
        seq.groupBy(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .coalesce(1)
        .localCheckpoint(eager=True)  # |states|^2 rows; 3 consumers
    )
    row_t = trans.groupBy("src").agg(F.sum("c").cast("bigint").alias("rc"))
    tot = trans.agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("rc")
    terms = (
        trans.join(F.broadcast(row_t), "src")
        .groupBy("src")
        .agg(
            F.sum(F.floor(-p * F.log(p) * 1e9).cast("bigint"))
            .cast("bigint")
            .alias("h_nano"),
            F.max("rc").cast("bigint").alias("rc"),
        )
    )
    return (
        terms.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").cast("bigint").alias("n_transitions"),
            F.count(F.lit(1)).cast("bigint").alias("n_states"),
            F.round(
                F.sum(
                    F.floor(
                        F.col("rc").cast("double") / F.col("n") * F.col("h_nano")
                    ).cast("bigint")
                ).cast("double")
                / 1e9,
                6,
            ).alias("entropy_rate_nats"),
        )
    )
