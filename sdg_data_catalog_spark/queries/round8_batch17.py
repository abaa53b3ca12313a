"""Round-8 operator batch 17: trend testing, concurrency analytics, and
doubly-robust off-policy evaluation.

- ``agg_mann_kendall`` — the Mann-Kendall nonparametric trend TEST per
  daily event series: S = Σ_{i<j} sign(y_j − y_i) with the
  tie-corrected variance and continuity-corrected z. The hypothesis-
  test companion of ts_theil_sen (sen gives the slope magnitude; MK
  says whether a monotone trend exists at all) — the standard pairing
  in monitoring and environmental statistics.
- ``win_peak_concurrency`` — peak simultaneous open intervals via the
  classic sweep line: each signed-up user holds an interval from first
  signup to first purchase (or last event), +1/−1 boundary events,
  global running sum, max. "How many sessions were open at once" is
  the capacity-planning number interval tables exist to answer.
- ``eval_doubly_robust`` — the DR off-policy estimator combining the
  eval_ips_snips importance weights with a per-action mean-reward
  direct model: unbiased if EITHER the propensities or the reward
  model are right, and lower-variance than IPS alone
  (Dudík-Langford-Li '11). Completes the OPE family.

Determinism: MK's S and tie terms are exact integers (sign
comparisons over bounded day pairs); the sweep line packs
(ts, end-before-start) into one int64 key through the two-phase
running total; DR reduces to per-action exact integer sums with
floored-quotient images summed as integers.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000


@register(
    "agg_mann_kendall",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ),
    s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.y > a.y THEN 1
                           WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day > a.day
      GROUP BY a.event_type
    ),
    ties AS (
      SELECT event_type,
             CAST(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5))
                  AS DECIMAL(38,0)) AS tie_term
      FROM (SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, y)
      GROUP BY event_type
    ),
    nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM daily GROUP BY event_type)
    SELECT s.event_type, nd.n AS n_days, s.s,
           ROUND((CAST(nd.n AS DOUBLE) * (nd.n - 1) * (2 * nd.n + 5)
                  - CAST(t.tie_term AS DOUBLE)) / 18.0, 6) AS var_s,
           ROUND(CASE WHEN s.s > 0 THEN (s.s - 1)
                      WHEN s.s < 0 THEN (s.s + 1)
                      ELSE 0 END
                 / sqrt((CAST(nd.n AS DOUBLE) * (nd.n - 1) * (2 * nd.n + 5)
                         - CAST(t.tie_term AS DOUBLE)) / 18.0), 6) AS z
    FROM s JOIN ties t ON t.event_type = s.event_type
    JOIN nd ON nd.event_type = s.event_type
    ORDER BY s.event_type
    """,
)
def agg_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event-type daily series:
    S counts concordant-minus-discordant day pairs,
    Var(S) = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)]/18, and the
    continuity-corrected z = (S∓1)/√Var decides trend existence —
    the test to run BEFORE quoting ts_theil_sen's slope. S is an exact
    integer from sign comparisons over the bounded per-series day
    pairs (observation-window-sized, never corpus rows); the tie term
    accumulates in decimal (t³ overflows int64 for groups past 2·10⁶
    equal values); z is one identical double chain, ROUND 1e-6. The
    day census materializes once; the pair join, tie census, and day
    counts all consume it."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)  # pairs + ties + counts consume it
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.day") > F.col("a.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.y") > F.col("a.y"), 1)
                .when(F.col("b.y") < F.col("a.y"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t").cast("decimal(38,0)")
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            )
            .cast("decimal(38,0)")
            .alias("tie_term")
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    var_s = (
        F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term").cast("double")
    ) / 18.0
    s_cc = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
    )
    return (
        s.join(ties, "event_type")
        .join(nd, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            "s",
            F.round(var_s, 6).alias("var_s"),
            F.round(s_cc / F.sqrt(var_s), 6).alias("z"),
        )
        .orderBy("event_type")
    )


@register(
    "win_peak_concurrency",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    signup AS (
      SELECT user_id, MIN(ts_us) AS t0 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    iv AS (
      SELECT s.user_id, s.t0,
             COALESCE(MIN(CASE WHEN e.event_type = 'purchase'
                                    AND e.ts_us > s.t0
                               THEN e.ts_us END),
                      MAX(e.ts_us)) AS t1
      FROM signup s JOIN ev e ON e.user_id = s.user_id
      GROUP BY s.user_id, s.t0
    ),
    bounds AS (
      SELECT t0 * 2 + 1 AS key, 1 AS delta FROM iv WHERE t1 > t0
      UNION ALL
      SELECT t1 * 2 AS key, -1 AS delta FROM iv WHERE t1 > t0
    ),
    keyed AS (
      SELECT key, CAST(SUM(delta) AS BIGINT) AS delta
      FROM bounds GROUP BY key
    ),
    walk AS (
      SELECT key,
             CAST(SUM(delta) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS open
      FROM keyed
    ),
    mx AS (SELECT CAST(MAX(open) AS BIGINT) AS peak FROM walk)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM iv WHERE t1 > t0)
             AS n_intervals,
           mx.peak,
           CAST((SELECT MIN(key) FROM walk WHERE open = mx.peak) // 2
                AS BIGINT) AS peak_at_us
    FROM mx
    """,
)
def win_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open signup→purchase intervals (each signed-up
    user is "open" from first signup until first post-signup purchase,
    or last observed event) — the sweep-line maximum that sizes
    connection pools, support staffing, and stateful-stream memory.
    Boundary events pack into ONE int64 key (ts·2 + 1 for starts,
    ts·2 for ends — ends sort BEFORE starts at the same microsecond,
    so touching intervals never double-count); the global running sum
    is the two-phase running_total (range repartition + broadcast
    prefix offsets — the corpus-wide ORDER BY window this would
    naively need is the classic scale-killer), and the peak plus its
    first timestamp are one aggregate over the walk."""
    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
        .localCheckpoint(eager=True)
    )
    iv = (
        ev.join(signup, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("t0").alias("t0"),
            F.coalesce(
                F.min(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("ts_us") > F.col("t0")),
                        F.col("ts_us"),
                    )
                ),
                F.max("ts_us"),
            ).alias("t1"),
        )
        .filter(F.col("t1") > F.col("t0"))
        .localCheckpoint(eager=True)  # interval table; bounds + count consume
    )
    bounds = (
        iv.select((F.col("t0") * 2 + 1).alias("key"), F.lit(1).alias("delta"))
        .unionAll(
            iv.select((F.col("t1") * 2).alias("key"), F.lit(-1).alias("delta"))
        )
        .groupBy("key")
        .agg(F.sum("delta").cast("bigint").alias("delta"))
    )
    walk = running_total(bounds, "key", F.col("delta"), "open").localCheckpoint(
        eager=True
    )  # boundary-grained; peak + argmin both consume it
    mx = walk.agg(F.max("open").cast("bigint").alias("peak"))
    at = (
        walk.crossJoin(F.broadcast(mx))
        .filter(F.col("open") == F.col("peak"))
        .agg(F.expr("CAST(MIN(key) DIV 2 AS BIGINT)").alias("peak_at_us"))
    )
    n_iv = iv.agg(F.count(F.lit(1)).cast("bigint").alias("n_intervals"))
    return n_iv.crossJoin(F.broadcast(mx)).crossJoin(F.broadcast(at)).select(
        "n_intervals", "peak", "peak_at_us"
    )


@register(
    "eval_doubly_robust",
    oracle="""
    WITH logged AS (
      SELECT event_type AS action,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS r_micro,
             CASE user_id % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                  WHEN 2 THEN 'signup' WHEN 3 THEN 'purchase'
                  ELSE 'error' END AS pi_action
      FROM events
    ),
    act AS (
      SELECT action, CAST(COUNT(*) AS BIGINT) AS n_a,
             CAST(SUM(r_micro) AS BIGINT) AS tot_r,
             CAST(SUM(CASE WHEN action = pi_action THEN 1 ELSE 0 END)
                  AS BIGINT) AS m_a,
             CAST(SUM(CASE WHEN action = pi_action THEN r_micro ELSE 0 END)
                  AS BIGINT) AS sr_a
      FROM logged GROUP BY action
    ),
    pol AS (
      SELECT pi_action AS action, CAST(COUNT(*) AS BIGINT) AS n_pi
      FROM logged GROUP BY pi_action
    ),
    est AS (
      SELECT CAST(SUM(a.n_a) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(CAST(COALESCE(p.n_pi, 0) AS DOUBLE)
                                 * a.tot_r / a.n_a) AS BIGINT))
                  AS BIGINT) AS dm_sum,
             CAST(SUM(CAST(FLOOR(CAST(a.sr_a AS DOUBLE) / a.n_a) AS BIGINT))
                  AS BIGINT) AS ips_sum,
             CAST(SUM(CAST(FLOOR(CAST(a.m_a AS DOUBLE) * a.tot_r
                                 / (CAST(a.n_a AS DOUBLE) * a.n_a))
                           AS BIGINT)) AS BIGINT) AS corr_sum
      FROM act a LEFT JOIN pol p ON p.action = a.action
    )
    SELECT n,
           ROUND(CAST(dm_sum AS DOUBLE) / n / 1e6, 6) AS dm_value,
           ROUND(CAST(ips_sum AS DOUBLE) / 1e6, 6) AS ips_value,
           ROUND((CAST(dm_sum AS DOUBLE) / n
                  + CAST(ips_sum AS DOUBLE)
                  - CAST(corr_sum AS DOUBLE)) / 1e6, 6) AS dr_value
    FROM est
    """,
)
def eval_doubly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy value of the eval_ips_snips target
    policy: V̂_DR = (1/N)Σ[q̂(π(xᵢ)) + 1{{aᵢ=π}}·(rᵢ − q̂(aᵢ))/p̂(aᵢ)]
    with the per-action mean reward r̄_a as the direct model q̂ and
    empirical propensities p̂(a)=n_a/N. Unbiased if EITHER model is
    right; variance below IPS when rewards are predictable
    (Dudík-Langford-Li '11) — the estimator that decides launches when
    π rarely agrees with the log.

    Algebra keeps it one-pass: Σ q̂(π(xᵢ)) = Σ_a n_{{π=a}}·r̄_a needs
    only the policy-action histogram; the correction
    Σ matched (rᵢ − r̄_a)·N/n_a / N = Σ_a (sr_a − m_a·r̄_a)/n_a
    needs only the per-action (n, Σr, matched-n, matched-Σr) cells.
    Every quotient is a FLOOR image summed as integers (the
    eval_ips_snips convention — no ≤5-row float sum order); sr_a/tot_r
    stay exact in double to ~9·10¹⁵ micro-reward per action."""
    ev = table(spark, sf_dir, "events")
    pi_action = F.expr(
        """CASE user_id % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
           WHEN 2 THEN 'signup' WHEN 3 THEN 'purchase' ELSE 'error' END"""
    )
    logged = ev.select(
        F.col("event_type").alias("action"),
        F.floor(F.col("value") * 1e6).cast("bigint").alias("r_micro"),
        pi_action.alias("pi_action"),
    ).localCheckpoint(eager=True)  # one corpus pass; act + pol consume it
    act = logged.groupBy("action").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a"),
        F.sum("r_micro").cast("bigint").alias("tot_r"),
        F.sum(F.when(F.col("action") == F.col("pi_action"), 1).otherwise(0))
        .cast("bigint")
        .alias("m_a"),
        F.sum(
            F.when(
                F.col("action") == F.col("pi_action"), F.col("r_micro")
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("sr_a"),
    )
    pol = logged.groupBy(F.col("pi_action").alias("p_action")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pi")
    )
    joined = act.join(
        F.broadcast(pol), act.action == F.col("p_action"), "left"
    )
    dm_t = F.floor(
        F.coalesce(F.col("n_pi"), F.lit(0)).cast("double")
        * F.col("tot_r")
        / F.col("n_a")
    ).cast("bigint")
    ips_t = F.floor(F.col("sr_a").cast("double") / F.col("n_a")).cast("bigint")
    corr_t = F.floor(
        F.col("m_a").cast("double")
        * F.col("tot_r")
        / (F.col("n_a").cast("double") * F.col("n_a"))
    ).cast("bigint")
    est = joined.agg(
        F.sum("n_a").cast("bigint").alias("n"),
        F.sum(dm_t).cast("bigint").alias("dm_sum"),
        F.sum(ips_t).cast("bigint").alias("ips_sum"),
        F.sum(corr_t).cast("bigint").alias("corr_sum"),
    )
    return est.select(
        "n",
        F.round(F.col("dm_sum").cast("double") / F.col("n") / 1e6, 6).alias(
            "dm_value"
        ),
        F.round(F.col("ips_sum").cast("double") / 1e6, 6).alias("ips_value"),
        F.round(
            (
                F.col("dm_sum").cast("double") / F.col("n")
                + F.col("ips_sum")
                - F.col("corr_sum")
            )
            / 1e6,
            6,
        ).alias("dr_value"),
    )
