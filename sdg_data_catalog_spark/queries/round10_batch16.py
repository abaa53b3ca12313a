"""Round-10 operator batch 16: referential-integrity census, cohort LTV
curves, and windowed exact-distinct.

- ``dq_referential_orphans`` — the warehouse FK health check: for each
  declared relationship (lineitem→orders, lineitem→part,
  lineitem→supplier, orders→customer), the exact count of child rows
  whose key has no parent, via LEFT ANTI joins with the small parents
  broadcast. Zero rows orphaned is itself a fact worth certifying — a
  silent FK break is how star-schema joins start dropping revenue.
- ``agg_cohort_ltv_curve`` — cumulative lifetime value by signup-cohort
  age: per (cohort week, weeks-since-signup), exact purchase-value
  micro sums accumulated along age with a cohort-partitioned window —
  the LTV curve finance projects from. Cohort grain keeps every window
  bounded; values are exact integer micros end to end.
- ``stream_window_distinct`` — exact distinct users per 15-minute
  tumbling window per event type — the windowed COUNT(DISTINCT) shape
  Structured Streaming serves with watermark + approx or a two-level
  exact aggregation; registered in its batch form (distinct-pairs
  census → windowed count) so the result is externally hash-checked.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_WEEK_US = 7 * 86_400_000_000


@register(
    "dq_referential_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS relationship,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM lineitem l
                 LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
                 WHERE o.o_orderkey IS NULL) AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            LEFT JOIN part p ON p.p_partkey = l.l_partkey
            WHERE p.p_partkey IS NULL)
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
            WHERE s.s_suppkey IS NULL)
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            LEFT JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_custkey IS NULL)
    ORDER BY relationship
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan census over the star schema's four declared
    relationships: LEFT ANTI join per edge (parent key tables broadcast
    where small; the lineitem-side checks share one fact scan per edge
    and partial-aggregate to single counts). The bounded 4-row report
    is the referential-integrity gate a warehouse runs after every
    load — and 'zero orphans' is certified, not assumed."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")

    # ONE lineitem scan carries all three FK checks: left-join a
    # presence flag per parent key set, then conditional-sum the nulls
    def keys(df, col, flag):
        return df.select(F.col(col)).distinct().withColumn(flag, F.lit(1))

    li_flags = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(
            keys(orders, "o_orderkey", "has_o").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ),
            "l_orderkey",
            "left",
        )
        .join(
            keys(part, "p_partkey", "has_p").withColumnRenamed(
                "p_partkey", "l_partkey"
            ),
            "l_partkey",
            "left",
        )
        .join(
            keys(supp, "s_suppkey", "has_s").withColumnRenamed(
                "s_suppkey", "l_suppkey"
            ),
            "l_suppkey",
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_li"),
            F.sum(F.col("has_o").isNull().cast("bigint"))
            .cast("bigint")
            .alias("orph_o"),
            F.sum(F.col("has_p").isNull().cast("bigint"))
            .cast("bigint")
            .alias("orph_p"),
            F.sum(F.col("has_s").isNull().cast("bigint"))
            .cast("bigint")
            .alias("orph_s"),
        )
    )
    oc = (
        orders.select("o_custkey")
        .join(
            keys(cust, "c_custkey", "has_c").withColumnRenamed(
                "c_custkey", "o_custkey"
            ),
            "o_custkey",
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ord"),
            F.sum(F.col("has_c").isNull().cast("bigint"))
            .cast("bigint")
            .alias("orph_c"),
        )
    )
    li_rows = li_flags.select(
        F.expr(
            "stack(3,"
            " 'lineitem->orders', n_li, orph_o,"
            " 'lineitem->part', n_li, orph_p,"
            " 'lineitem->supplier', n_li, orph_s)"
            " AS (relationship, n_child, n_orphans)"
        )
    )
    oc_row = oc.select(
        F.lit("orders->customer").alias("relationship"),
        F.col("n_ord").alias("n_child"),
        F.col("orph_c").alias("n_orphans"),
    )
    return li_rows.unionAll(oc_row).orderBy("relationship")


@register(
    "agg_cohort_ltv_curve",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS v
        FROM events
    ),
    signup AS (
        SELECT user_id, MIN(ts_us) AS t0 FROM ev
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    purchases AS (
        SELECT s.user_id,
               s.t0 // {_WEEK_US} AS cohort_week,
               (e.ts_us - s.t0) // {_WEEK_US} AS age_weeks,
               e.v
        FROM signup s JOIN ev e ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts_us >= s.t0
    ),
    cohort_size AS (
        SELECT t0 // {_WEEK_US} AS cohort_week,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM signup GROUP BY 1
    ),
    cell AS (
        SELECT cohort_week, age_weeks,
               CAST(SUM(v) AS BIGINT) AS rev_micro
        FROM purchases GROUP BY cohort_week, age_weeks
    )
    SELECT c.cohort_week AS cohort_week, c.age_weeks, cs.n_users,
           CAST(SUM(c.rev_micro) OVER (PARTITION BY c.cohort_week
                ORDER BY c.age_weeks
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_rev_micro
    FROM cell c JOIN cohort_size cs ON cs.cohort_week = c.cohort_week
    ORDER BY cohort_week, age_weeks
    """,
)
def agg_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV by signup cohort: per (cohort week, age-in-weeks)
    cell, exact purchase micro sums accumulated along age with a window
    PARTITIONED BY COHORT over the bounded (cohorts × ages) cell table —
    the revenue curve finance extrapolates. Purchases BEFORE a user's
    signup are excluded on both engines; all arithmetic is exact
    integer micros."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") * 1e6).cast("bigint").alias("v"),
    )
    # user-grain; referenced by BOTH the purchase join and cohort_size —
    # checkpoint so each reference does not re-expand the events scan
    # (the plan-scan gate caught 3 visible scans without this)
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
        .localCheckpoint(eager=True)
    )
    purchases = (
        signup.join(ev, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts_us") >= F.col("t0"))
        )
        .select(
            F.expr(f"t0 DIV {_WEEK_US}").alias("cohort_week"),
            F.expr(f"(ts_us - t0) DIV {_WEEK_US}").alias("age_weeks"),
            "v",
        )
    )
    cohort_size = signup.groupBy(
        F.expr(f"t0 DIV {_WEEK_US}").alias("cohort_week")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    cell = purchases.groupBy("cohort_week", "age_weeks").agg(
        F.sum("v").cast("bigint").alias("rev_micro")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.join(cohort_size, "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "n_users",
            F.sum("rev_micro").over(w).cast("bigint").alias("cum_rev_micro"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


@register(
    "stream_window_distinct",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per 15-minute tumbling window per type — the
    windowed COUNT(DISTINCT) every realtime dashboard wants. The batch
    form here runs it as the scalable TWO-LEVEL aggregation: distinct
    (window, type, user) triples first (partial-agg friendly — the
    dedup happens map-side before the one shuffle), then a plain count
    per (window, type). Under readStream the same plan runs with a
    watermark (streaming/windows.py conventions); COUNT(DISTINCT)
    inside one streaming agg is not incrementalizable, the two-level
    form is."""
    ev = table(spark, sf_dir, "events")
    triples = ev.select(
        F.window("ts", "15 minutes").alias("w"), "event_type", "user_id"
    ).distinct()
    return (
        triples.groupBy(
            F.col("w.start").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("window_start", "event_type")
    )
