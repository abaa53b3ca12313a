"""Event analytics + graph batch: funnel conversion, retention cohorts,
histograms, and degree-oriented triangle counting.

Engine-added operators (SURVEY.md §2.11 — no reference analog; the
reference has no event/clickstream surface at all). Everything is
equi-join + hash-aggregate shaped: funnels and cohorts shuffle on
user_id only, the histogram is one map-side-combinable aggregate, and
the triangle count uses the degree-orientation trick (Suri &
Vassilvitskii, "Counting triangles and the curse of the last reducer",
WWW'11) so hub nodes don't explode the wedge join at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed; of those, who clicked strictly
    AFTER their first view; of those, who purchased strictly after that
    first qualifying click. True sequence semantics (first-occurrence
    chaining), not the min-timestamp approximation — a user who purchases
    before ever viewing does not convert. Each stage is one groupBy +
    one equi-join, all hash-partitioned on user_id, so the three stages
    co-partition into a single shuffle family; per-stage counts are
    1-row frames cross-joined at the end (driver receives 3 longs)."""
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    # each stage frame is user-grained and consumed twice (next stage +
    # its own count) — checkpointed so the chain is three filtered event
    # scans, not six re-expansions
    v = v.localCheckpoint(eager=True)
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=True)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@register(
    "agg_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', cohort_day, CAST(e.ts AS DATE))
                AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN first_seen USING (user_id)
    GROUP BY first_seen.cohort_day, day_offset
    """,
)
def agg_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later day-offset they return — the standard product-analytics
    triangle table. Plan: first-seen is one groupBy on user_id; the
    events join back on the same key (co-partitioned, no second shuffle
    of the fact under AQE); the final distinct-count aggregates the
    (cohort_day, day_offset) grid, whose cardinality is days², not
    events. Day arithmetic is exact integer date math on both engines."""
    ev = table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        ev.join(first_seen, "user_id")
        .select(
            # dates surface as formatted strings (date_today precedent:
            # DuckDB's pandas bridge widens DATE to datetime64, so raw
            # date columns hash-mismatch on isoformat)
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 6) AS sum_value
    FROM events
    GROUP BY bin
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram (bin width 25 over events.value):
    one codegen'd floor expression + one map-side-combinable groupBy —
    the cheapest possible distribution profile at 100 TB (shuffle volume
    = number of bins, not rows). The per-bin sum doubles as a mass check
    against `catalog_stats`. Bin edges use double division + FLOOR, which
    is IEEE-identical across engines."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.col("value") / 25.0).cast("long").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


@register(
    "agg_rolling_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    mx AS (SELECT MAX(d) AS m FROM du),
    ex AS (
      SELECT d + CAST(o AS INTEGER) AS report_day, user_id
      FROM du, range(7) t(o)
    )
    SELECT strftime(report_day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM ex, mx
    WHERE report_day <= mx.m
    GROUP BY report_day
    """,
)
def agg_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (WAU): the sliding distinct
    count that a naive rolling window can't do (COUNT(DISTINCT) doesn't
    decompose over window frames). The scalable formulation: one
    (day, user) distinct, then each pair VOLUNTEERS itself into the 7
    report days it supports via a 7-row explode, and one distinct-count
    per report day — shuffle volume is 7×|day,user| pairs, never
    events², and no per-day self-join. The max-day bound rides along as
    a 1-row cross join, keeping the plan fully lazy."""
    ev = table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    mx = du.agg(F.max("d").alias("m"))
    ex = du.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "d",
    ).select(F.date_add("d", F.col("o")).alias("report_day"), "user_id")
    return (
        ex.crossJoin(mx)
        .filter(F.col("report_day") <= F.col("m"))
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").alias("wau"))
        .select(
            F.date_format("report_day", "yyyy-MM-dd").alias("day"), "wau"
        )
    )


@register(
    "dq_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
      FROM events GROUP BY d
    ),
    stats AS (
      SELECT AVG(CAST(n AS DOUBLE)) AS mu, stddev_samp(CAST(n AS DOUBLE)) AS sd
      FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n,
           ROUND((n - mu) / sd, 4) AS z,
           (abs((n - mu) / sd) > 2.0) AS is_anomaly
    FROM daily, stats
    """,
)
def dq_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly screen over daily event counts: z-score each day
    against the corpus mean/stddev and flag |z| > 2 — the cheapest
    ingest-health monitor (a dropped partition or a duplicated feed
    shows up as a volume spike long before content checks run; pairs
    with `dq_constraints`, which validates content). Two tiny
    aggregates: daily counts (map-side combined) and one global
    mean/std row cross-joined back — the screen costs one scan no
    matter the corpus size."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = daily.agg(
        F.avg(F.col("n").cast("double")).alias("mu"),
        F.stddev_samp(F.col("n").cast("double")).alias("sd"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return daily.crossJoin(stats).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


@register(
    "win_gap_islands",
    oracle="""
    WITH du AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    g AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS grp
      FROM du
    )
    SELECT user_id,
           strftime(MIN(d), '%Y-%m-%d') AS streak_start,
           strftime(MAX(d), '%Y-%m-%d') AS streak_end,
           CAST(COUNT(*) AS BIGINT) AS streak_days
    FROM g
    GROUP BY user_id, grp
    """,
)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE active
    days (engagement streaks — the retention signal behind "7-day
    streak" features). The classic island key: day minus the day's rank
    within the user is constant exactly while days are consecutive, so
    one hash-partitioned window plus one groupBy finds every streak —
    no self-join, no iteration, and the whole plan shuffles on user_id
    once. Pairs with `etl_sessionize` (intra-day gaps) and
    `agg_retention_cohorts` (cross-user decay)."""
    ev = table(spark, sf_dir, "events")
    du = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    g = du.withColumn(
        "grp", F.date_sub("d", F.row_number().over(w))
    )
    return g.groupBy("user_id", "grp").agg(
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
        F.count(F.lit(1)).alias("streak_days"),
    ).drop("grp")


@register(
    "graph_triangle_count",
    oracle="""
    WITH pe AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey % 4 = 0
    ),
    edges0 AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pe a JOIN pe b ON a.o = b.o AND a.p < b.p
    ),
    deg AS (
      SELECT node, COUNT(*) AS d
      FROM (SELECT u AS node FROM edges0
            UNION ALL SELECT v AS node FROM edges0)
      GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t
      FROM edges0 e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    )
    SELECT CAST((SELECT COUNT(*) FROM edges0) AS BIGINT) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM oriented e1
    JOIN oriented e2 ON e2.s = e1.s AND e2.t <> e1.t
    JOIN oriented e3 ON e3.s = e1.t AND e3.t = e2.t
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the part co-purchase graph (parts sharing an
    order are adjacent; l_partkey % 4 bounds the demo subgraph). The
    scale-critical move is DEGREE ORIENTATION: each undirected edge
    points from its (degree, id)-smaller endpoint to the larger, so
    every wedge is enumerated at its lowest-degree vertex — total wedge
    work drops from sum(deg²) over hubs to O(E^1.5), the fix for the
    "curse of the last reducer". Each triangle then has exactly one
    orientation pattern e1=(x,y), e2=(x,z), e3=(y,z), so one equi-join
    closes and counts it once. All three joins are hash equi-joins;
    nothing is broadcast-sized by assumption, so the plan survives a
    graph 1000× this size."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 4 == 0)
    pe = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = pe.alias("a"), pe.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        # edge list materializes ONCE: degree + orientation both consume
        # it, and the three wedge-join branches re-expanded the whole
        # lineitem self-join per alias (30+ scans in the formatted plan)
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ranked = edges.join(du, "u").join(dv, "v")
    u_first = F.struct("du", "u") < F.struct("dv", "v")
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    ).localCheckpoint(eager=True)  # consumed by all three join aliases
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.s") == F.col("e1.s")) & (F.col("e2.t") != F.col("e1.t")),
        )
        .join(
            e3,
            (F.col("e3.s") == F.col("e1.t")) & (F.col("e3.t") == F.col("e2.t")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(tri)


@register(
    "dq_freshness",
    oracle="""
    WITH g AS (SELECT MAX(ts) AS global_max FROM events)
    SELECT event_type,
           MAX(ts) AS latest_ts,
           CAST(FLOOR((epoch(date_trunc('second', g.global_max))
                       - epoch(date_trunc('second', MAX(ts)))) / 3600) AS BIGINT)
             AS lag_hours,
           FLOOR((epoch(date_trunc('second', g.global_max))
                  - epoch(date_trunc('second', MAX(ts)))) / 3600) > 24 AS stale
    FROM events, g
    GROUP BY event_type, g.global_max
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness check: per-stream (event_type) latest timestamp and
    its lag behind the feed's global high-water mark, with a >24 h stale
    flag — the monitoring question every ingest pipeline answers before
    dq_constraints even matters (correct-but-stale data fails SLAs too;
    completes the DQ family: constraints → anomaly → drift → freshness).
    Two partial-aggregated MAX folds (per-type and global — the global is
    a 1-row broadcast onto the per-type frame); at 100 TB both are
    metadata-cheap scans and the high-water mark would come from the
    catalog's ANALYZE stats (catalog_stats) for free."""
    ev = table(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("global_max"))
    per = ev.groupBy("event_type").agg(F.max("ts").alias("latest_ts"))
    lag_hours = (
        F.floor(
            (F.unix_timestamp("global_max") - F.unix_timestamp("latest_ts")) / 3600
        )
    ).cast("bigint")
    return per.join(F.broadcast(g)).select(
        "event_type",
        "latest_ts",
        lag_hours.alias("lag_hours"),
        (lag_hours > 24).alias("stale"),
    )


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(ts) AS signup_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS purchase_ts
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
        GROUP BY e.user_id
    )
    SELECT s.user_id,
           CAST(FLOOR((epoch(date_trunc('second', p.purchase_ts))
                       - epoch(date_trunc('second', s.signup_ts))) / 60) AS BIGINT)
             AS minutes_to_convert,
           p.purchase_ts IS NOT NULL AS converted
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per user: first signup → first STRICTLY LATER
    purchase (the ordered-funnel discipline funnel_conversion
    established — a purchase before the signup must not count), emitted
    per user with the conversion flag so downstream can take any
    quantile without this operator choosing one. Two co-partitioned
    user_id aggregations and one left join — all on the same key, one
    effective shuffle lineage; the latency distribution itself is the
    deliverable every growth dashboard plots."""
    ev = table(spark, sf_dir, "events")
    # user-sized; consumed by the purchase probe AND the final left join —
    # one signup pass, not two (audited 3 events scans, now 2: signup +
    # purchase, each a pushed-down event_type filter)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
        .localCheckpoint(eager=True)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    minutes = F.floor(
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("signup_ts")) / 60
    ).cast("bigint")
    return (
        s.join(p, "user_id", "left")
        .select(
            "user_id",
            minutes.alias("minutes_to_convert"),
            F.col("purchase_ts").isNotNull().alias("converted"),
        )
    )
