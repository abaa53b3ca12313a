"""Round-7 batch 9: causal inference and computational geometry.

- ``agg_diff_in_diff`` — the difference-in-differences estimator over a
  natural experiment: treatment = odd user ids, the post period starts
  at the observation window's midpoint, outcome = event value. Reports
  the four cell means, the DiD effect, and its unpooled standard error —
  the workhorse causal readout for staged rollouts.
- ``join_point_in_polygon`` — point-in-polygon containment join via ray
  casting with EXACT integer cross-multiplication (no division, no
  floats): customer points against a broadcast literal polygon table —
  the geofencing primitive alongside join_geo_radius (distance theta)
  and join_geo_gridded (grid-bucketed radius).

Determinism: cell moments are exact micro-unit integers in
decimal(38,0) (the agg_welch_ttest convention); DiD/SE are single
identical double expressions; every ray-cast crossing test is an
integer sign comparison, so containment is bit-exact on both engines.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000


@register(
    "agg_diff_in_diff",
    oracle=f"""
    WITH v AS (
      SELECT CAST(user_id % 2 AS INTEGER) AS treat,
             epoch_us(ts) // {_DAY_US} AS day,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    cut AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS cutoff FROM v),
    cells AS (
      SELECT v.treat,
             CASE WHEN v.day >= c.cutoff THEN 1 ELSE 0 END AS post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v.img) AS DECIMAL(38, 0)) AS s1,
             CAST(SUM(v.img * v.img) AS DECIMAL(38, 0)) AS s2
      FROM v CROSS JOIN cut c GROUP BY 1, 2
    ),
    m AS (
      SELECT treat, post, n,
             CAST(s1 AS DOUBLE) / (n * 1e6) AS mean,
             (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
               / (CAST(n AS DOUBLE) * (n - 1) * 1e12) AS var
      FROM cells
    ),
    eff AS (
      SELECT (MAX(CASE WHEN treat = 1 AND post = 1 THEN mean END)
              - MAX(CASE WHEN treat = 1 AND post = 0 THEN mean END))
             - (MAX(CASE WHEN treat = 0 AND post = 1 THEN mean END)
                - MAX(CASE WHEN treat = 0 AND post = 0 THEN mean END)) AS did,
             sqrt(SUM(var / n)) AS se
      FROM m
    )
    SELECT m.treat, m.post, m.n, ROUND(m.mean, 6) AS mean_value,
           ROUND(e.did, 6) AS did, ROUND(e.se, 6) AS se,
           ROUND(e.did / e.se, 6) AS t_stat
    FROM m CROSS JOIN eff e ORDER BY m.treat, m.post
    """,
)
def agg_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the built-in natural experiment:
    treatment = odd user ids, post = the second half of the observation
    window (cutoff = integer midpoint of the day range, computed from
    the data and broadcast), outcome = event value in exact micro-units.
    One partially-aggregated pass collects the four cells' decimal(38,0)
    moments (the agg_welch_ttest convention); the DiD effect
    (Δtreat − Δcontrol), its unpooled SE √Σ(varᵢ/nᵢ), and the t statistic
    are single identical double expressions joined back onto the cell
    rows — the whole estimator is two tiny broadcasts on top of one
    corpus scan."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("int").alias("treat"),
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
        F.floor(F.col("value") * 1e6).cast("long").alias("img"),
    )
    cut = ev.agg(
        F.expr("(MIN(day) + MAX(day) + 1) DIV 2").alias("cutoff")
    )
    cells = (
        ev.crossJoin(F.broadcast(cut))
        .withColumn("post", (F.col("day") >= F.col("cutoff")).cast("int"))
        .groupBy("treat", "post")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("img").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("s1"),
            F.sum((F.col("img") * F.col("img")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
    )
    m = cells.selectExpr(
        "treat",
        "post",
        "n",
        "CAST(s1 AS DOUBLE) / (n * 1e6) AS mean",
        "(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * (n - 1) * 1e12) AS var",
    ).localCheckpoint(eager=True)  # 4 rows; two consumers (cells + effect)
    eff = m.agg(
        (
            (
                F.max(F.when((F.col("treat") == 1) & (F.col("post") == 1), F.col("mean")))
                - F.max(F.when((F.col("treat") == 1) & (F.col("post") == 0), F.col("mean")))
            )
            - (
                F.max(F.when((F.col("treat") == 0) & (F.col("post") == 1), F.col("mean")))
                - F.max(F.when((F.col("treat") == 0) & (F.col("post") == 0), F.col("mean")))
            )
        ).alias("did"),
        F.sqrt(F.sum(F.col("var") / F.col("n"))).alias("se"),
    )
    return (
        m.crossJoin(F.broadcast(eff))
        .select(
            "treat",
            "post",
            "n",
            F.round("mean", 6).alias("mean_value"),
            F.round("did", 6).alias("did"),
            F.round("se", 6).alias("se"),
            F.round(F.col("did") / F.col("se"), 6).alias("t_stat"),
        )
        .orderBy("treat", "post")
    )


# Literal polygon table in micro-degree integers: (polygon_id, vertex
# order, x=lon·1e6, y=lat·1e6). A convex box, a triangle, and a concave
# chevron — the concave one is what makes ray casting non-trivial.
_POLYGONS = [
    # box over the north-east quadrant patch
    (1, 0, 20_000_000, 10_000_000),
    (1, 1, 80_000_000, 10_000_000),
    (1, 2, 80_000_000, 45_000_000),
    (1, 3, 20_000_000, 45_000_000),
    # triangle in the south-west
    (2, 0, -120_000_000, -50_000_000),
    (2, 1, -40_000_000, -50_000_000),
    (2, 2, -80_000_000, 5_000_000),
    # concave chevron straddling the prime meridian
    (3, 0, -30_000_000, 50_000_000),
    (3, 1, 0, 20_000_000),
    (3, 2, 30_000_000, 50_000_000),
    (3, 3, 30_000_000, 58_000_000),
    (3, 4, 0, 34_000_000),
    (3, 5, -30_000_000, 58_000_000),
]

_POLY_SQL = ", ".join(f"({p}, {i}, {x}, {y})" for p, i, x, y in _POLYGONS)


@register(
    "join_point_in_polygon",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS pid,
             ((c_custkey * 73) % 360 - 180) * 1000000 + 500000 AS x,
             ((c_custkey * 37) % 120 - 60) * 1000000 + 500000 AS y
      FROM customer
    ),
    poly (polygon_id, i, x, y) AS (VALUES {_POLY_SQL}),
    edges AS (
      SELECT a.polygon_id, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      FROM poly a JOIN poly b
        ON a.polygon_id = b.polygon_id
       AND b.i = (a.i + 1) % (SELECT COUNT(*) FROM poly p2
                              WHERE p2.polygon_id = a.polygon_id)
    ),
    crossings AS (
      SELECT p.pid, e.polygon_id,
             CAST(SUM(CASE WHEN (e.y1 > p.y) <> (e.y2 > p.y)
                            AND CASE WHEN e.y2 > e.y1
                                THEN (p.x - e.x1) * (e.y2 - e.y1)
                                     < (e.x2 - e.x1) * (p.y - e.y1)
                                ELSE (p.x - e.x1) * (e.y2 - e.y1)
                                     > (e.x2 - e.x1) * (p.y - e.y1) END
                           THEN 1 ELSE 0 END) AS BIGINT) AS k
      FROM pts p CROSS JOIN edges e
      GROUP BY p.pid, e.polygon_id
    )
    SELECT polygon_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(pid) AS BIGINT) AS sum_point_ids
    FROM crossings WHERE k % 2 = 1
    GROUP BY polygon_id ORDER BY polygon_id
    """,
)
def join_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment join: customers hashed onto the
    synthetic micro-degree grid (the join_geo_* coordinate convention)
    against a broadcast literal polygon table — box, triangle, and a
    CONCAVE chevron (the case that breaks bounding-box shortcuts). Ray
    casting with exact integer cross-multiplication: an upward ray
    crosses edge (x1,y1)-(x2,y2) iff the y-interval straddles the point
    and the sign-adjusted cross product places the point left of the
    edge — no division, no floats, so containment parity is bit-exact on
    both engines. The plan is one corpus scan × a ~13-row broadcast edge
    table with a partially-aggregated parity count — the geofencing
    pattern that scales to billions of points against thousands of
    fence edges."""
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("pid"),
        (((F.col("c_custkey") * 73) % 360 - 180) * 1_000_000 + 500_000).alias("x"),
        (((F.col("c_custkey") * 37) % 120 - 60) * 1_000_000 + 500_000).alias("y"),
    )
    n_by_poly: dict[int, int] = {}
    for p, _, _, _ in _POLYGONS:
        n_by_poly[p] = n_by_poly.get(p, 0) + 1
    edges = spark.createDataFrame(
        [
            (p, x, y, nx, ny)
            for (p, i, x, y) in _POLYGONS
            for (p2, i2, nx, ny) in [
                next(
                    q
                    for q in _POLYGONS
                    if q[0] == p and q[1] == (i + 1) % n_by_poly[p]
                )
            ]
        ],
        "polygon_id int, x1 long, y1 long, x2 long, y2 long",
    )
    straddle = (F.col("y1") > F.col("y")) != (F.col("y2") > F.col("y"))
    lhs = (F.col("x") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    rhs = (F.col("x2") - F.col("x1")) * (F.col("y") - F.col("y1"))
    crosses = F.when(
        F.col("y2") > F.col("y1"), lhs < rhs
    ).otherwise(lhs > rhs)
    crossings = (
        cust.crossJoin(F.broadcast(edges))
        .groupBy("pid", "polygon_id")
        .agg(
            F.sum(F.when(straddle & crosses, 1).otherwise(0))
            .cast("bigint")
            .alias("k")
        )
    )
    return (
        crossings.filter(F.col("k") % 2 == 1)
        .groupBy("polygon_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum("pid").cast("bigint").alias("sum_point_ids"),
        )
        .orderBy("polygon_id")
    )
