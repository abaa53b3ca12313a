"""Round-7 time-series operator batch: forecasting and robust smoothing.

Three operators on the per-day event series that a monitoring/curation
engine needs beyond the existing EWMA/MAD/CUSUM set: closed-form OLS
trend forecasting (`ts_forecast_ols`), exact rolling-median smoothing
(`ts_rolling_median` — the robust alternative to the mean the MAD
detector pairs with), and a moving-average seasonal decomposition
(`ts_decompose_ma` — the classical trend/seasonal split behind every
"is this weekday effect or drift?" question).

Determinism conventions: the day index is integer epoch-day
(epoch_us // 86_400_000_000 — identical integer division on both
engines), every series value is an integer COUNT (double sums would
hash-differently across aggregation orders), and all derived floats are
single expressions over exact integers, so both engines compute
bit-identical doubles before the 6-dp round.

Reference analog: none direct (the reference is a pandas/SQLite scrape
pipeline with no time-series surface); this is new-engine surface in the
SURVEY §2.11 north-star class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, y): events per type per UTC epoch-day — one
    map-side-combined aggregate; y is an exact BIGINT."""
    ev = table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(_DAY_US))
    return ev.groupBy("event_type", day.cast("long").alias("day")).agg(
        F.count(F.lit(1)).alias("y")
    )


_DAILY_SQL = f"""
daily AS (
  SELECT event_type, epoch_us(ts) // {_DAY_US} AS day, COUNT(*) AS y
  FROM events GROUP BY event_type, day
)
"""


@register(
    "ts_forecast_ols",
    oracle=f"""
    WITH {_DAILY_SQL},
    s AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(day) AS sx, SUM(y) AS sy,
             SUM(day * y) AS sxy, SUM(day * day) AS sxx,
             MAX(day) AS last_day
      FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE)
                 + (CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE))
                   * CAST(last_day + 1 AS DOUBLE), 6) AS forecast_next
    FROM s
    """,
)
def ts_forecast_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series closed-form OLS trend forecast: fit y = a + b·day over
    each event type's daily-count series and emit the next-day point
    forecast. The five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
    EXACT integer sums folded map-side in one combinable aggregate — the
    whole fit is one groupBy at any corpus size, never a per-series
    driver loop, and slope/intercept are single double expressions over
    exact integers (deterministic across engines and partitionings,
    unlike summing float residuals). This is the capacity-planning /
    drift-projection primitive next to the detectors (ts_anomaly_mad,
    ts_cusum_changepoint): they flag level shifts, this quantifies the
    trend line the shifts are measured against."""
    daily = _daily_counts(spark, sf_dir)
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("day").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("day") * F.col("y")).alias("sxy"),
        F.sum(F.col("day") * F.col("day")).alias("sxx"),
        F.max("day").alias("last_day"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(
            intercept + slope * (F.col("last_day") + 1).cast("double"), 6
        ).alias("forecast_next"),
    )


@register(
    "ts_rolling_median",
    oracle=f"""
    WITH {_DAILY_SQL}
    SELECT event_type,
           CAST(day AS BIGINT) AS day,
           CAST(y AS BIGINT) AS y,
           ROUND(MEDIAN(y) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
    FROM daily
    """,
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling 7-day median per event-type series — the robust
    smoother (spikes shift a mean for a week; a median ignores up to 3
    outlier days). Spark's exact `percentile(y, 0.5)` over a ROWS frame
    and DuckDB's windowed MEDIAN both average the two middle values on
    even counts, and the inputs are integer counts, so the halves are
    exact — hash-identical without any float-order caveat. The window
    partitions by series key (hash-partitioned, never global), frame
    work is O(7) per row; at 100 TB the cost is the one shuffle onto
    (event_type) that any per-series computation pays."""
    daily = _daily_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "y",
        F.round(F.expr("percentile(y, 0.5)").over(w), 6).alias("med7"),
    )


@register(
    "ts_decompose_ma",
    oracle=f"""
    WITH {_DAILY_SQL},
    win AS (
      SELECT event_type, day, y,
             SUM(y) OVER w AS s7,
             COUNT(*) OVER w AS n7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    complete AS (SELECT * FROM win WHERE n7 = 7)
    SELECT event_type,
           CAST(day % 7 AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(s7) AS DOUBLE) / (7.0 * COUNT(*)), 6) AS avg_trend,
           ROUND(CAST(7 * SUM(y) - SUM(s7) AS DOUBLE) / (7.0 * COUNT(*)), 6)
             AS seasonal
    FROM complete
    GROUP BY event_type, day % 7
    """,
)
def ts_decompose_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical moving-average seasonal decomposition of each event-type
    daily series: trend = centered 7-day MA (complete windows only),
    seasonal index per day-of-week = mean of (y − trend) over that dow.
    The float trap in the textbook formulation is summing double
    residuals (aggregation-order-dependent); here the seasonal mean is
    algebraically refolded onto INTEGER sums —
    mean(y − s7/7) = (7·Σy − Σs7) / (7·n) — so both engines divide the
    same exact integers. Day-of-week is epoch-day mod 7 (identical on
    both engines; the label mapping is presentation, not semantics).
    Plan: one per-series window (hash-partitioned on event_type) + one
    combinable groupBy — two shuffles total at any scale."""
    daily = _daily_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    win = daily.select(
        "event_type",
        "day",
        "y",
        F.sum("y").over(w).alias("s7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    ).filter(F.col("n7") == 7)
    return win.groupBy(
        "event_type", (F.col("day") % 7).cast("long").alias("dow")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(
            F.sum("s7").cast("double") / (F.lit(7.0) * F.count(F.lit(1))), 6
        ).alias("avg_trend"),
        F.round(
            (F.lit(7) * F.sum("y") - F.sum("s7")).cast("double")
            / (F.lit(7.0) * F.count(F.lit(1))),
            6,
        ).alias("seasonal"),
    )
