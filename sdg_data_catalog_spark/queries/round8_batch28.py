"""Round-8 operator batch 28: concordance effect size, drawdown risk,
and retention half-life.

- ``agg_kendall_w`` — Kendall's coefficient of concordance for the
  day-blocks × event-type Friedman design: W = χ²_F / (n(k−1)) ∈
  [0, 1] — the EFFECT SIZE behind agg_friedman_test's verdict (how
  strongly the daily traffic ranking agrees across days, not just
  whether it does).
- ``win_drawdown_max`` — maximum drawdown of each event type's
  cumulative daily volume balance vs its running peak: the risk
  number behind "how far below the best day-rate did ingestion sink,
  and when" — capacity/SLA post-mortems start here.
- ``agg_cohort_half_life`` — retention half-life per signup cohort:
  the first day-offset where a cohort's returning users drop below
  half of its day-0 size — the single number product reviews quote
  from the agg_retention_cohorts triangle.

Determinism: W reuses the Friedman doubled-midrank integer machinery;
drawdowns are exact integer running-max-minus-current walks over
bounded day tables; half-life is an integer threshold crossing on
exact distinct counts.

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
    "agg_kendall_w",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ),
    dense AS (
      SELECT t.event_type, d.day, COALESCE(x.y, 0) AS y
      FROM (SELECT DISTINCT event_type FROM daily) t
      CROSS JOIN (SELECT DISTINCT day FROM daily) d
      LEFT JOIN daily x
        ON x.event_type = t.event_type AND x.day = d.day
    ),
    ranked AS (
      SELECT event_type, day,
             CAST(2 * RANK() OVER (PARTITION BY day ORDER BY y)
                  + COUNT(*) OVER (PARTITION BY day, y) - 1 AS BIGINT)
               AS rank2
      FROM dense
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
      FROM dense
    ),
    rj AS (
      SELECT event_type, CAST(SUM(rank2) AS BIGINT) AS r2j,
             CAST(SUM(CAST(rank2 AS HUGEINT) * rank2) AS DECIMAL(38,0))
               AS sq2
      FROM ranked GROUP BY event_type
    ),
    s AS (
      SELECT d.n, d.k,
             CAST(SUM(CAST(r.r2j - d.n * (d.k + 1) AS HUGEINT)
                      * (r.r2j - d.n * (d.k + 1))) AS DECIMAL(38,0)) AS num4,
             CAST(SUM(r.sq2) AS DECIMAL(38,0)) AS a2x4
      FROM rj r CROSS JOIN dims d GROUP BY d.n, d.k
    )
    SELECT n AS n_blocks, k AS k_treatments,
           ROUND((k - 1) * CAST(num4 AS DOUBLE)
                 / (CAST(a2x4 AS DOUBLE)
                    - CAST(n AS DOUBLE) * k * (k + 1) * (k + 1)), 6)
             AS friedman_chi2,
           ROUND(CAST(num4 AS DOUBLE)
                 / (CAST(a2x4 AS DOUBLE)
                    - CAST(n AS DOUBLE) * k * (k + 1) * (k + 1))
                 / CAST(n AS DOUBLE), 6) AS kendall_w
    FROM s
    """,
)
def agg_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's W (coefficient of concordance) for the days × event-
    types ranking design: W = χ²_F / (n(k−1)) — 1 when every day ranks
    the event types identically, 0 when rankings are random. The
    tie-general Friedman statistic (the agg_friedman_test machinery:
    densified cells, doubled integer midranks, bounded per-day
    windows) divided by its ceiling — the effect size that tells a
    reviewer whether a significant Friedman verdict MEANS anything on
    10⁴ blocks. One corpus pass to the day census; all downstream
    arithmetic exact integers/decimals, ROUND 1e-6."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)
    )
    types = daily.select("event_type").distinct()
    days = daily.select("day").distinct()
    dense = (
        types.crossJoin(days)
        .join(daily, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("y", F.lit(0)).alias("y"))
    )
    w_rank = Window.partitionBy("day").orderBy("y")
    w_tie = Window.partitionBy("day", "y")
    ranked = dense.select(
        "event_type",
        (2 * F.rank().over(w_rank) + F.count(F.lit(1)).over(w_tie) - 1)
        .cast("bigint")
        .alias("rank2"),
    )
    dims = dense.agg(
        F.countDistinct("day").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("k"),
    )
    rj = ranked.groupBy("event_type").agg(
        F.sum("rank2").cast("bigint").alias("r2j"),
        F.sum((F.col("rank2") * F.col("rank2")).cast("decimal(38,0)")).alias(
            "sq2"
        ),
    )
    s = (
        rj.crossJoin(F.broadcast(dims))
        .groupBy("n", "k")
        .agg(
            F.sum(
                (
                    (F.col("r2j") - F.col("n") * (F.col("k") + 1)).cast(
                        "decimal(19,0)"
                    )
                    * (F.col("r2j") - F.col("n") * (F.col("k") + 1))
                ).cast("decimal(38,0)")
            ).alias("num4"),
            F.sum("sq2").cast("decimal(38,0)").alias("a2x4"),
        )
    )
    denom = F.col("a2x4").cast("double") - F.col("n").cast("double") * F.col(
        "k"
    ) * (F.col("k") + 1) * (F.col("k") + 1)
    chi2 = (F.col("k") - 1) * F.col("num4").cast("double") / denom
    return s.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.round(chi2, 6).alias("friedman_chi2"),
        F.round(
            F.col("num4").cast("double") / denom / F.col("n").cast("double"),
            6,
        ).alias("kendall_w"),
    )


@register(
    "win_drawdown_max",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ),
    walk AS (
      SELECT event_type, day, y,
             CAST(MAX(y) OVER (PARTITION BY event_type ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
      FROM daily
    ),
    dd AS (
      SELECT event_type, day, peak - y AS drawdown FROM walk
    )
    SELECT event_type,
           CAST(MAX(drawdown) AS BIGINT) AS max_drawdown,
           CAST(MIN(CASE WHEN drawdown = (SELECT MAX(d2.drawdown) FROM dd d2
                                          WHERE d2.event_type = dd.event_type)
                         THEN day END) AS BIGINT) AS at_day
    FROM dd GROUP BY event_type ORDER BY event_type
    """,
)
def win_drawdown_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each event type's daily volume against its
    running peak: max over days of (best-day-so-far − today), plus the
    FIRST day it occurred — the worst throughput sag relative to proven
    capacity, the number an SLA post-mortem opens with (an absolute
    minimum hides whether the system ever ran hotter before). The
    running peak is one per-type window over the bounded day table;
    drawdowns are exact integers; the argmax day ties break to the
    earliest on both engines (MIN over the equal-drawdown days)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    w_peak = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = daily.select(
        "event_type",
        "day",
        (F.max("y").over(w_peak) - F.col("y")).cast("bigint").alias("drawdown"),
    ).localCheckpoint(eager=True)  # bounded day table; max + argmax consume
    mx = dd.groupBy("event_type").agg(
        F.max("drawdown").cast("bigint").alias("max_drawdown")
    )
    return (
        dd.join(F.broadcast(mx), "event_type")
        .filter(F.col("drawdown") == F.col("max_drawdown"))
        .groupBy("event_type", "max_drawdown")
        .agg(F.min("day").cast("bigint").alias("at_day"))
        .select("event_type", "max_drawdown", "at_day")
        .orderBy("event_type")
    )


@register(
    "agg_cohort_half_life",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    grid AS (
      SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
             CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
                  AS BIGINT) AS day_offset,
             CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
      FROM events e JOIN first_seen f USING (user_id)
      GROUP BY f.cohort_day, day_offset
    ),
    base AS (
      SELECT cohort_day, n_users AS n0 FROM grid WHERE day_offset = 0
    ),
    maxd AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
    wgrid AS (
      SELECT g.cohort_day, g.day_offset, g.n_users,
             LEAD(g.day_offset) OVER (PARTITION BY g.cohort_day
                                      ORDER BY g.day_offset) AS nxt,
             CAST(date_diff('day', CAST(g.cohort_day AS DATE), m.max_day)
                  AS BIGINT) AS end_off
      FROM grid g CROSS JOIN maxd m
    ),
    cand AS (
      SELECT w.cohort_day, b.n0,
             MIN(CASE WHEN w.day_offset > 0 AND 2 * w.n_users < b.n0
                      THEN w.day_offset END) AS m_obs,
             MIN(CASE WHEN (w.nxt IS NULL AND w.day_offset < w.end_off)
                        OR w.nxt > w.day_offset + 1
                      THEN w.day_offset + 1 END) AS m_gap
      FROM wgrid w JOIN base b ON b.cohort_day = w.cohort_day
      GROUP BY w.cohort_day, b.n0
    )
    SELECT cohort_day, n0 AS cohort_size,
           CAST(CASE WHEN m_obs IS NULL THEN COALESCE(m_gap, -1)
                     WHEN m_gap IS NULL THEN m_obs
                     WHEN m_obs < m_gap THEN m_obs ELSE m_gap END
                AS BIGINT) AS half_life_days
    FROM cand ORDER BY cohort_day
    """,
)
def agg_cohort_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life per first-seen cohort: the first positive
    day-offset, INSIDE the observation window (cohort day … global max
    event day), on which fewer than half the cohort's users return
    (−1 = never halved inside the window) — the one-number summary a
    product review reads off the agg_retention_cohorts triangle (same
    cohort/day-offset conventions, so the two reconcile cell for cell).
    A day-offset with ZERO returners has no grid cell but is
    unambiguously below half, so the crossing is min(first observed
    offset with 2·returning < cohort_size, first GAP in the observed
    offsets) — the gap scan is one LEAD window over the days²-bounded
    grid plus the trailing gap against the window end, never a
    densified calendar (r8 ADVICE: previously only observed cells were
    scanned, so sparse cohorts reported a later half-life than the
    documented semantics). Exact distinct counts; integer threshold
    cross-product; both candidate minima are MINs over the grid, not a
    walk."""
    ev = table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    grid = (
        ev.join(first_seen, "user_id")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
        .localCheckpoint(eager=True)  # days²-bounded; base + crossing consume
    )
    base = grid.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_users").alias("n0")
    )
    maxd = ev.agg(F.max("d").alias("max_day"))
    w = Window.partitionBy("cohort_day").orderBy("day_offset")
    wgrid = (
        grid.crossJoin(F.broadcast(maxd))
        .withColumn("nxt", F.lead("day_offset").over(w))
        .withColumn(
            "end_off",
            F.datediff("max_day", F.to_date("cohort_day")).cast("long"),
        )
    )
    cand = (
        wgrid.join(F.broadcast(base), "cohort_day")
        .groupBy("cohort_day", "n0")
        .agg(
            F.min(
                F.when(
                    (F.col("day_offset") > 0)
                    & (2 * F.col("n_users") < F.col("n0")),
                    F.col("day_offset"),
                )
            ).alias("m_obs"),
            F.min(
                F.when(
                    (
                        F.col("nxt").isNull()
                        & (F.col("day_offset") < F.col("end_off"))
                    )
                    | (F.col("nxt") > F.col("day_offset") + 1),
                    F.col("day_offset") + 1,
                )
            ).alias("m_gap"),
        )
    )
    half = (
        F.when(F.col("m_obs").isNull(), F.coalesce(F.col("m_gap"), F.lit(-1)))
        .when(F.col("m_gap").isNull(), F.col("m_obs"))
        .when(F.col("m_obs") < F.col("m_gap"), F.col("m_obs"))
        .otherwise(F.col("m_gap"))
    )
    return cand.select(
        "cohort_day",
        F.col("n0").alias("cohort_size"),
        half.cast("bigint").alias("half_life_days"),
    ).orderBy("cohort_day")
