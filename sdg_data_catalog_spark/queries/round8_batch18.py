"""Round-8 operator batch 18: HITS, FDR correction, HLL set algebra.

- ``graph_hits`` — Kleinberg's HITS hubs/authorities on the
  supplier→customer bipartite graph (the graph_pagerank edge
  convention): 3 power-iteration rounds with MAX-normalization
  (equivalent direction to the L2/L1-normalized iterate, but the
  normalizer is an order-free aggregate — a corpus-wide float SUM
  would be association-order-dependent across engines).
- ``agg_bh_fdr`` — Benjamini-Hochberg FDR correction over the family
  of per-event-type Mann-Whitney tests: the multiple-testing gate an
  experimentation platform applies before anyone reads per-segment
  p-values (5 segments at α=0.05 uncorrected ≈ 23% false-positive
  family risk). The normal CDF is the Abramowitz-Stegun 26.2.17
  polynomial written IDENTICALLY on both engines.
- ``sketch_hll_intersect`` — pairwise distinct-user intersections via
  HLL inclusion-exclusion (|A∩B| = |A|+|B|−|A∪B|): the audience-
  overlap question sketch tables exist to answer without a raw-event
  scan, checked against the exact intersection with the standard
  compounded-error bound.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_HITS_ROUNDS = 3


def _hits_oracle_round(i: int) -> str:
    hp = f"h{i-1}" if i > 1 else "h0"
    return f"""
a{i}r AS (SELECT e.dst AS node, CAST(SUM(h.s) AS BIGINT) AS s
  FROM e JOIN {hp} h ON e.src = h.node GROUP BY e.dst),
a{i} AS (SELECT node, CAST(FLOOR(CAST(s AS DOUBLE)
             / (SELECT MAX(s) FROM a{i}r) * 1e9) AS BIGINT) AS s FROM a{i}r),
h{i}r AS (SELECT e.src AS node, CAST(SUM(a.s) AS BIGINT) AS s
  FROM e JOIN a{i} a ON e.dst = a.node GROUP BY e.src),
h{i} AS (SELECT node, CAST(FLOOR(CAST(s AS DOUBLE)
             / (SELECT MAX(s) FROM h{i}r) * 1e9) AS BIGINT) AS s FROM h{i}r)"""


_HITS_ORACLE = (
    """WITH e AS (SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
h0 AS (SELECT DISTINCT src AS node, CAST(1000000000 AS BIGINT) AS s FROM e),"""
    + ",".join(_hits_oracle_round(i) for i in range(1, _HITS_ROUNDS + 1))
    + f"""
SELECT 'authority' AS role, node, ROUND(s / 1e9, 9) AS score
FROM (SELECT * FROM a{_HITS_ROUNDS} ORDER BY s DESC, node LIMIT 20)
UNION ALL
SELECT 'hub' AS role, node, ROUND(s / 1e9, 9) AS score
FROM (SELECT * FROM h{_HITS_ROUNDS} ORDER BY s DESC, node LIMIT 20)
ORDER BY role, score DESC, node"""
)


@register("graph_hits", oracle=_HITS_ORACLE)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs and authorities on the supplier→customer purchase
    graph: authority(c) = Σ hub(suppliers selling to c), hub(s) =
    Σ authority(customers of s), iterated 3 rounds from uniform hubs.
    Each round is two hash-join aggregations over the edge list — the
    same shuffle shape as one pagerank round, nothing broadcast-sized
    by assumption. Scores stay INTEGER images end to end: each
    half-round sums int64 scores over edges (exact — a float sum over
    in-edges is association-order-dependent across engines, the bug the
    first draft shipped) and renormalizes to FLOOR(s/max·10⁹), an
    identical IEEE chain per node (the per-node sum stays double-exact
    to ~9·10¹⁵, i.e. max in-degree ~10⁶ at the 10⁹ scale — documented
    bound). MAX, unlike an L1/L2 SUM, is itself order-free. Output:
    top-20 authorities and top-20 hubs by (score, node) —
    TakeOrderedAndProject, no global sort."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    e = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + 1_000_000).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # 2 joins per round × rounds consume it
    )
    h = e.select(F.col("src").alias("node")).distinct().withColumn(
        "s", F.lit(1_000_000_000).cast("bigint")
    )
    a = None

    def _norm(raw: DataFrame) -> DataFrame:
        mx = raw.agg(F.max("s").alias("mx"))
        return (
            raw.crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.floor(F.col("s").cast("double") / F.col("mx") * 1e9)
                .cast("bigint")
                .alias("s"),
            )
            .localCheckpoint(eager=True)  # next half-round + output consume
        )

    for _ in range(_HITS_ROUNDS):
        a = _norm(
            e.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("s").cast("bigint").alias("s"))
        )
        h = _norm(
            e.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("s").cast("bigint").alias("s"))
        )
    top_a = (
        a.orderBy(F.desc("s"), F.asc("node"))
        .limit(20)
        .select(
            F.lit("authority").alias("role"),
            "node",
            F.round(F.col("s") / 1e9, 9).alias("score"),
        )
    )
    top_h = (
        h.orderBy(F.desc("s"), F.asc("node"))
        .limit(20)
        .select(
            F.lit("hub").alias("role"),
            "node",
            F.round(F.col("s") / 1e9, 9).alias("score"),
        )
    )
    return top_a.unionAll(top_h).orderBy("role", F.desc("score"), "node")


# Abramowitz-Stegun 26.2.17 polynomial tail of the standard normal CDF;
# written once and injected VERBATIM into both engines' expressions so
# the double chain is identical. {z} must be a non-negative expression.
_PHI_TAIL = (
    "(exp(-({z}) * ({z}) / 2.0) / 2.5066282746310002"
    " * ((((1.330274429 * (1.0 / (1.0 + 0.2316419 * ({z})))"
    "      - 1.821255978) * (1.0 / (1.0 + 0.2316419 * ({z})))"
    "      + 1.781477937) * (1.0 / (1.0 + 0.2316419 * ({z})))"
    "      - 0.356563782) * (1.0 / (1.0 + 0.2316419 * ({z})))"
    "      + 0.319381530) * (1.0 / (1.0 + 0.2316419 * ({z}))))"
)

_MWU_Z_SQL = """
    v AS (
      SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    pv AS (SELECT img, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM v GROUP BY img, event_type),
    vals AS (SELECT img, CAST(SUM(cnt) AS BIGINT) AS tot FROM pv GROUP BY img),
    pref AS (
      SELECT img, tot,
             CAST(SUM(tot) OVER (ORDER BY img ROWS UNBOUNDED PRECEDING)
                  - tot AS BIGINT) AS prefix
      FROM vals
    ),
    n_all AS (SELECT CAST(SUM(tot) AS BIGINT) AS n,
                     CAST(SUM(CAST(tot AS DECIMAL(38,0)) * tot * tot - tot)
                          AS DECIMAL(38,0)) AS ties
              FROM vals),
    g AS (
      SELECT p.event_type,
             CAST(SUM(p.cnt) AS BIGINT) AS n1,
             CAST(SUM(p.cnt * (2 * f.prefix + f.tot + 1)) AS BIGINT) AS r2
      FROM pv p JOIN pref f ON p.img = f.img
      GROUP BY p.event_type
    ),
    zt AS (
      SELECT g.event_type,
             ROUND((CAST(g.r2 - g.n1 * (g.n1 + 1) AS DOUBLE) / 2
                    - CAST(g.n1 AS DOUBLE) * (a.n - g.n1) / 2)
                   / sqrt(CAST(g.n1 AS DOUBLE) * (a.n - g.n1) / 12
                          * ((a.n + 1)
                             - CAST(a.ties AS DOUBLE)
                               / (CAST(a.n AS DOUBLE) * (a.n - 1)))), 6) AS z
      FROM g CROSS JOIN n_all a
    )
"""


@register(
    "agg_bh_fdr",
    oracle=f"""
    WITH {_MWU_Z_SQL},
    pv2 AS (
      SELECT event_type, z,
             ROUND(2.0 * {_PHI_TAIL.format(z="abs(z)")}, 9) AS p
      FROM zt
    ),
    ranked AS (
      SELECT event_type, z, p,
             ROW_NUMBER() OVER (ORDER BY p, event_type) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS m
      FROM pv2
    ),
    kstar AS (
      SELECT COALESCE(MAX(CASE WHEN p * m <= 0.05 * rk THEN rk END), 0) AS k
      FROM ranked
    )
    SELECT r.event_type, r.z, r.p AS p_value,
           CAST(r.rk AS BIGINT) AS rank,
           ROUND(0.05 * r.rk / r.m, 9) AS bh_threshold,
           CAST(CASE WHEN r.rk <= k.k THEN 1 ELSE 0 END AS BIGINT)
             AS discovery
    FROM ranked r CROSS JOIN kstar k
    ORDER BY r.rk
    """,
)
def agg_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR correction over the family of
    per-event-type Mann-Whitney tests (each segment's value
    distribution vs the pooled rest — the agg_mann_whitney statistics
    recomputed here so the op is self-contained): two-sided p-values
    from the A&S 26.2.17 normal-CDF polynomial (a literal-for-literal
    identical double chain on both engines, applied to the ROUNDED z so
    the input is already pinned), ranked ascending; k* = max{{k : p_k ≤
    α·k/m}} and every test ranked ≤ k* is a discovery at FDR α=0.05.
    The step-up comparison is p·m ≤ 0.05·rk — no division, no
    threshold-boundary asymmetry between engines. The family is
    |types|-sized, so everything after the MWU rank pass is a 5-row
    walk."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1e6).cast("long").alias("img")
    )
    pv = (
        ev.groupBy("img", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    vals = pv.groupBy("img").agg(F.sum("cnt").cast("bigint").alias("tot"))
    pref = running_total(vals, "img", F.col("tot"), "run").select(
        "img", "tot", (F.col("run") - F.col("tot")).alias("prefix")
    )
    n_all = vals.agg(
        F.sum("tot").cast("bigint").alias("n"),
        F.sum(
            F.col("tot").cast("decimal(38,0)") * F.col("tot") * F.col("tot")
            - F.col("tot")
        )
        .cast("decimal(38,0)")
        .alias("ties"),
    )
    g = (
        pv.join(pref, "img")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n1"),
            F.sum(F.col("cnt") * (2 * F.col("prefix") + F.col("tot") + 1))
            .cast("bigint")
            .alias("r2"),
        )
    )
    zt = g.crossJoin(F.broadcast(n_all)).selectExpr(
        "event_type",
        "ROUND((CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / 2"
        "       - CAST(n1 AS DOUBLE) * (n - n1) / 2)"
        "      / sqrt(CAST(n1 AS DOUBLE) * (n - n1) / 12"
        "             * ((n + 1)"
        "                - CAST(ties AS DOUBLE)"
        "                  / (CAST(n AS DOUBLE) * (n - 1)))), 6) AS z",
    )
    p_expr = f"ROUND(2.0 * {_PHI_TAIL.format(z='abs(z)')}, 9)"
    pv2 = zt.selectExpr("event_type", "z", f"{p_expr} AS p").coalesce(1)
    w = Window.partitionBy(F.spark_partition_id()).orderBy("p", "event_type")
    ranked = pv2.select(
        "event_type",
        "z",
        "p",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy(F.spark_partition_id()).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("m"),
    ).localCheckpoint(eager=True)  # |types| rows; k* + output consume it
    kstar = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p") * F.col("m") <= 0.05 * F.col("rk"), F.col("rk")
                )
            ),
            F.lit(0),
        ).alias("k")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "event_type",
            "z",
            F.col("p").alias("p_value"),
            F.col("rk").cast("bigint").alias("rank"),
            F.round(0.05 * F.col("rk") / F.col("m"), 9).alias("bh_threshold"),
            F.when(F.col("rk") <= F.col("k"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("discovery"),
        )
        .orderBy("rank")
    )


@register(
    "sketch_hll_intersect",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_intersect
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM tu GROUP BY event_type)
    SELECT p.type_a, p.type_b,
           pa.n AS n_a, pb.n AS n_b, p.n_intersect,
           TRUE AS est_within_bound
    FROM pairs p
    JOIN per pa ON pa.event_type = p.type_a
    JOIN per pb ON pb.event_type = p.type_b
    ORDER BY p.type_a, p.type_b
    """,
)
def sketch_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap from sketches: distinct-user intersection of
    every event-type pair by HLL inclusion-exclusion — |A∩B| ≈
    est(A) + est(B) − est(A∪B), where the union estimate merges the two
    PERSISTED per-type sketches (register-max, exact vs one big
    sketch). This is the question sketch tables exist for: overlap of
    N segments without re-scanning raw events per pair. The checked
    bound: HLL at lgK=12 has relative standard error 1.04/√2¹² ≈
    1.625%, and the inclusion-exclusion estimate's absolute error is
    bounded (in probability) by the sum of the three terms' absolute
    errors — so the gate allows 3 compounded standard errors,
    max(32, 3·1.625%·(est(A)+est(B)+est(A∪B))). Because the oracle
    pins the bound column to TRUE, the margin is deliberately
    conservative (per-term 3σ exceedance ≈ 0.3%, and the +32 floor
    dominates at small cardinalities) so a data regen cannot fail the
    gate without a genuine sketch bug (r8 ADVICE). The exact
    intersection (one distinct pass + a user-keyed self-join) rides
    along as the oracle columns.
    One corpus pass builds the |types| sketch rows; the pair algebra is
    |types|²-sized."""
    ev = table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct().localCheckpoint(
        eager=True
    )  # type-user pairs; sketches + exact intersection consume it
    per = tu.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).localCheckpoint(eager=True)  # |types| rows; both pair sides consume it
    a = per.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n").alias("n_a"),
    )
    b = per.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n").alias("n_b"),
    )
    est = a.join(b, F.col("type_a") < F.col("type_b")).select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        F.expr("hll_sketch_estimate(sk_a)").alias("ea"),
        F.expr("hll_sketch_estimate(sk_b)").alias("eb"),
        F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))").alias("eu"),
    )
    ta, tb = tu.alias("ta"), tu.alias("tb")
    exact = (
        ta.join(
            tb,
            (F.col("ta.user_id") == F.col("tb.user_id"))
            & (F.col("ta.event_type") < F.col("tb.event_type")),
        )
        .groupBy(
            F.col("ta.event_type").alias("type_a"),
            F.col("tb.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_intersect"))
    )
    return (
        est.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_intersect",
            (
                F.abs(F.col("ea") + F.col("eb") - F.col("eu") - F.col("n_intersect"))
                <= F.greatest(
                    F.lit(32.0),
                    3 * 0.01625 * (F.col("ea") + F.col("eb") + F.col("eu")),
                )
            ).alias("est_within_bound"),
        )
        .orderBy("type_a", "type_b")
    )
