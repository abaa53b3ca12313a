"""Round-8 operator batch 20: parametric effect size, the third
clustering-validity index, and variance-homogeneity testing.

- ``agg_cohens_d`` — Cohen's d (with Hedges' g small-sample correction)
  per event type vs the pooled rest: the PARAMETRIC effect size quoted
  beside agg_welch_ttest's significance verdict, the mean-difference
  twin of agg_cliffs_delta's ordinal one.
- ``emb_calinski_harabasz`` — the Calinski-Harabasz (variance-ratio)
  index of the cluster_kmeans fit: between-cluster vs within-cluster
  dispersion, completing the validity triad (silhouette,
  Davies-Bouldin, CH — the three scores sklearn reports side by side).
- ``agg_levene_bf`` — Brown-Forsythe test (Levene with group MEDIANS)
  for variance homogeneity across event types: the robust "are the
  spreads equal?" gate that decides whether pooled-variance methods
  are admissible at all.

Determinism: Cohen's d reduces to the Welch exact decimal moments;
CH to exact integer scatter images around the shared fitted centroids;
Brown-Forsythe to exact per-type medians (integer order statistics via
the two-phase running total) and exact integer moments of the
|deviation| images.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.queries.round8_batch16 import _KMEANS_FIT_SQL


@register(
    "agg_cohens_d",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(img AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(img AS DECIMAL(38,0)) * img) AS DECIMAL(38,0)) AS s2
      FROM v GROUP BY event_type
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
                 CAST(SUM(s1) AS DECIMAL(38,0)) AS ts1,
                 CAST(SUM(s2) AS DECIMAL(38,0)) AS ts2
          FROM g),
    m AS (
      SELECT g.event_type, g.n, t.tn - g.n AS n2,
             CAST(g.s1 AS DOUBLE) / (g.n * 1e6) AS m1,
             CAST(t.ts1 - g.s1 AS DOUBLE) / ((t.tn - g.n) * 1e6) AS m2,
             (CAST(g.n AS DOUBLE) * CAST(g.s2 AS DOUBLE)
              - CAST(g.s1 AS DOUBLE) * CAST(g.s1 AS DOUBLE))
             / (CAST(g.n AS DOUBLE) * 1e12) AS ss1,
             (CAST(t.tn - g.n AS DOUBLE) * CAST(t.ts2 - g.s2 AS DOUBLE)
              - CAST(t.ts1 - g.s1 AS DOUBLE) * CAST(t.ts1 - g.s1 AS DOUBLE))
             / (CAST(t.tn - g.n AS DOUBLE) * 1e12) AS ss2
      FROM g CROSS JOIN t
    )
    SELECT event_type, n AS n1, n2,
           ROUND((m1 - m2)
                 / sqrt((ss1 + ss2) / (n + n2 - 2)), 6) + 0.0 AS cohens_d,
           ROUND((m1 - m2) / sqrt((ss1 + ss2) / (n + n2 - 2))
                 * (1.0 - 3.0 / (4.0 * (n + n2) - 9.0)), 6) + 0.0 AS hedges_g
    FROM m ORDER BY event_type
    """,
)
def agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d of each event type's value against the pooled rest —
    standardized mean difference over the POOLED standard deviation
    d = (m₁−m₂)/s_p with s_p² = (SS₁+SS₂)/(n₁+n₂−2) — plus Hedges' g,
    the small-sample-debiased variant (×(1 − 3/(4N−9))). This is the
    number meta-analyses and power calculations consume; a significant
    Welch t with d = 0.02 is a launch nobody should ship. The exact
    decimal(38,0) micro-unit moments are the agg_welch_ttest machinery
    (complement group by broadcast-total subtraction — one corpus
    pass); d and g are single identical double chains, ROUND 1e-6."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1e6).cast("long").alias("img")
    )
    g = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("img").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("s1"),
            F.sum((F.col("img") * F.col("img")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
        .localCheckpoint(eager=True)  # |types| rows; total + cells consume it
    )
    t = g.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("s1").cast("decimal(38,0)").alias("ts1"),
        F.sum("s2").cast("decimal(38,0)").alias("ts2"),
    )
    m = g.crossJoin(F.broadcast(t)).selectExpr(
        "event_type",
        "n",
        "CAST(tn - n AS BIGINT) AS n2",
        "CAST(s1 AS DOUBLE) / (n * 1e6) AS m1",
        "CAST(ts1 - s1 AS DOUBLE) / ((tn - n) * 1e6) AS m2",
        "(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * 1e12) AS ss1",
        "(CAST(tn - n AS DOUBLE) * CAST(ts2 - s2 AS DOUBLE)"
        " - CAST(ts1 - s1 AS DOUBLE) * CAST(ts1 - s1 AS DOUBLE))"
        " / (CAST(tn - n AS DOUBLE) * 1e12) AS ss2",
    )
    return m.selectExpr(
        "event_type",
        "n AS n1",
        "n2",
        "ROUND((m1 - m2) / sqrt((ss1 + ss2) / (n + n2 - 2)), 6) + 0.0"
        " AS cohens_d",
        "ROUND((m1 - m2) / sqrt((ss1 + ss2) / (n + n2 - 2))"
        " * (1.0 - 3.0 / (4.0 * (n + n2) - 9.0)), 6) + 0.0 AS hedges_g",
    ).orderBy("event_type")


@register(
    "emb_calinski_harabasz",
    oracle=f"""
    WITH {_KMEANS_FIT_SQL},
    sq AS (
      SELECT o.cluster_id,
             CAST(FLOOR(o.a * o.a * 1e6) AS BIGINT) AS w_img
      FROM own o
    ),
    within AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS k,
             CAST(SUM(w_img) AS BIGINT) AS wss_img
      FROM sq
    ),
    gmean AS (
      SELECT list(m ORDER BY pos) AS gm FROM (
        SELECT pos, ROUND(AVG(CAST(val AS DOUBLE)), 9) AS m
        FROM (SELECT unnest(embedding) AS val,
                     generate_subscripts(embedding, 1) AS pos
              FROM embeddings)
        GROUP BY pos)
    ),
    btw AS (
      SELECT CAST(SUM(cnt_img) AS BIGINT) AS bss_img FROM (
        SELECT CAST(FLOOR(cn.c * list_distance(c3f.cent, g.gm)^2 * 1e6)
                    AS BIGINT) AS cnt_img
        FROM c3f
        JOIN (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS c
              FROM own GROUP BY cluster_id) cn ON cn.cluster_id = c3f.cid
        CROSS JOIN gmean g)
    )
    SELECT w.n, w.k,
           ROUND(b.bss_img / 1e6, 6) AS between_ss,
           ROUND(w.wss_img / 1e6, 6) AS within_ss,
           ROUND((CAST(b.bss_img AS DOUBLE) / (w.k - 1))
                 / (CAST(w.wss_img AS DOUBLE) / (w.n - w.k)), 6) AS ch_index
    FROM within w CROSS JOIN btw b
    """,
)
def emb_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz variance-ratio index of the cluster_kmeans
    fit: CH = [BSS/(k−1)] / [WSS/(n−k)], where WSS sums squared
    member-to-centroid distances and BSS sums cluster sizes times
    squared centroid-to-grand-mean distances — higher = denser, better
    separated. Completes the validity triad with emb_silhouette and
    emb_davies_bouldin on the SAME deterministic fit. WSS terms are
    FLOOR(d²·10⁶) images summed exactly (one map-side pass over the
    assignment frame); BSS runs over k rows against the grand mean.
    Both the fitted centroids and the grand mean are pinned to a 1e-9
    lattice (ROUND(AVG, 9) on both engines) before any FLOOR image
    consumes them — the averages are the only association-order-
    dependent inputs, so after pinning every floor boundary resolves
    identically across engines and partition layouts (r8 ADVICE)."""
    from sdg_data_catalog_spark.operators.iterative import kmeans_fit

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned, cents = kmeans_fit(emb, k=4, iters=3)
    w_img = F.floor(F.col("__sq") * 1e6).cast("bigint")
    cluster_sizes = (
        assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .coalesce(1)
        .localCheckpoint(eager=True)  # k rows
    )
    within = assigned.select(w_img.alias("w_img"), "cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("cluster_id").cast("bigint").alias("k"),
        F.sum("w_img").cast("bigint").alias("wss_img"),
    )
    # grand mean: one partial-aggregated pass (64 avg slots), pinned to a
    # 1e-9 lattice like the fitted centroids — the raw AVG is an
    # association-order-dependent float sum, and the BSS FLOOR(·1e6)
    # image below must consume the same bits on both engines.
    gm_row = (
        emb.select(F.posexplode("embedding").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 9).alias("m"))
        .collect()
    )
    gm = [r["m"] for r in sorted(gm_row, key=lambda r: r["pos"])]
    import math

    bss_rows = [
        (i, math.sqrt(sum((x - y) ** 2 for x, y in zip(c, gm))) ** 2)
        for i, c in enumerate(cents)
    ]
    bdf = spark.createDataFrame(bss_rows, "cluster_id int, d2 double")
    btw = (
        cluster_sizes.join(F.broadcast(bdf), "cluster_id")
        .agg(
            F.sum(
                F.floor(F.col("c") * F.col("d2") * 1e6).cast("bigint")
            )
            .cast("bigint")
            .alias("bss_img")
        )
    )
    return within.crossJoin(F.broadcast(btw)).select(
        "n",
        "k",
        F.round(F.col("bss_img") / 1e6, 6).alias("between_ss"),
        F.round(F.col("wss_img") / 1e6, 6).alias("within_ss"),
        F.round(
            (F.col("bss_img").cast("double") / (F.col("k") - 1))
            / (F.col("wss_img").cast("double") / (F.col("n") - F.col("k"))),
            6,
        ).alias("ch_index"),
    )


@register(
    "agg_levene_bf",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    pv AS (SELECT event_type, img, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM v GROUP BY event_type, img),
    c AS (
      SELECT event_type, img, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY img
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM pv
    ),
    med AS (
      SELECT event_type,
             MIN(CASE WHEN cum * 2 >= n THEN img END) AS m
      FROM c GROUP BY event_type
    ),
    dev AS (
      SELECT p.event_type, ABS(p.img - md.m) AS z, p.cnt
      FROM pv p JOIN med md ON md.event_type = p.event_type
    ),
    g AS (
      SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(CAST(z AS DECIMAL(38,0)) * cnt) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(z AS DECIMAL(38,0)) * z * cnt) AS DECIMAL(38,0))
               AS s2
      FROM dev GROUP BY event_type
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(s1) AS DECIMAL(38,0)) AS ts1
          FROM g),
    parts AS (
      SELECT t.tn, t.k,
             SUM(CAST(FLOOR(CAST(g.s1 AS DOUBLE) * CAST(g.s1 AS DOUBLE)
                            / g.n / 1e6) AS BIGINT)) AS bterm_img,
             CAST(SUM(g.s2) AS DECIMAL(38,0)) AS ss_tot,
             CAST(MAX(t.ts1) AS DECIMAL(38,0)) AS gs1
      FROM g CROSS JOIN t GROUP BY t.tn, t.k
    )
    SELECT tn AS n_total, k,
           ROUND(((bterm_img / 1e6
                   - CAST(gs1 AS DOUBLE) * CAST(gs1 AS DOUBLE) / tn / 1e12)
                  / (k - 1))
                 / ((CAST(ss_tot AS DOUBLE) / 1e12 - bterm_img / 1e6 / 1e6)
                    / (tn - k)), 6) AS f_stat
    FROM parts
    """,
)
def agg_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene with group medians) for equal
    variances across event types: one-way ANOVA F on z = |x − median
    of x's group|. Significant F = heteroscedastic groups = pooled-
    variance methods are off the table (and Welch machinery earns its
    keep). Group medians are exact integer order statistics (2·cum ≥ n
    over the per-type value census); z stays an exact integer image, so
    the ANOVA sufficient statistics (Σz, Σz² per group in decimal) are
    exact; the between-group term Σ(S₁ᵢ²/nᵢ) rides floored micro images
    summed as integers, and F is one identical double chain, ROUND
    1e-6. Two passes over the census (median walk + deviation moments),
    both census-grained — and the per-type cumulative counts run
    through the TWO-PHASE running total on a packed (type-idx·10¹² +
    img) key, the dq_outlier_iqr convention, because the value census
    is ~50% of corpus rows and a per-type sort window would funnel the
    biggest type through one reducer."""
    from pyspark import StorageLevel
    from pyspark.sql.window import Window

    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1e6).cast("long").alias("img")
    )
    pv = (
        ev.groupBy("event_type", "img")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # census-grained; median walk + deviation moments consume it
    )
    w_idx = Window.partitionBy(F.spark_partition_id()).orderBy("event_type")
    types = (
        pv.select("event_type")
        .distinct()
        .coalesce(1)
        .select("event_type", (F.row_number().over(w_idx) - 1).alias("tidx"))
        .localCheckpoint(eager=True)  # |types| rows
    )
    tot_t = (
        pv.groupBy("event_type")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .join(F.broadcast(types), "event_type")
        .coalesce(1)
    )
    w_off = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("tidx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = tot_t.select(
        "event_type",
        "n",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off"),
    ).localCheckpoint(eager=True)  # |types| rows
    packed = pv.join(F.broadcast(types), "event_type").select(
        "event_type",
        "img",
        "cnt",
        (F.col("tidx") * F.lit(10**12) + F.col("img")).alias("key"),
    )
    c = running_total(packed, "key", F.col("cnt"), "run").join(
        F.broadcast(offs), "event_type"
    ).select(
        "event_type",
        "img",
        "n",
        (F.col("run") - F.col("off")).cast("bigint").alias("cum"),
    )
    med = c.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("img"))).alias("m")
    )
    dev = pv.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("img") - F.col("m")).alias("z"), "cnt"
    )
    g = dev.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("z").cast("decimal(38,0)") * F.col("cnt"))
        .cast("decimal(38,0)")
        .alias("s1"),
        F.sum(F.col("z").cast("decimal(19,0)") * F.col("z") * F.col("cnt"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    t = g.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s1").cast("decimal(38,0)").alias("ts1"),
    )
    parts = (
        g.crossJoin(F.broadcast(t))
        .groupBy("tn", "k")
        .agg(
            F.sum(
                F.floor(
                    F.col("s1").cast("double")
                    * F.col("s1").cast("double")
                    / F.col("n")
                    / 1e6
                ).cast("bigint")
            ).alias("bterm_img"),
            F.sum("s2").cast("decimal(38,0)").alias("ss_tot"),
            F.max("ts1").cast("decimal(38,0)").alias("gs1"),
        )
    )
    between = (
        F.col("bterm_img") / 1e6
        - F.col("gs1").cast("double") * F.col("gs1").cast("double")
        / F.col("tn")
        / 1e12
    ) / (F.col("k") - 1)
    within = (
        F.col("ss_tot").cast("double") / 1e12
        - F.col("bterm_img") / 1e6 / 1e6
    ) / (F.col("tn") - F.col("k"))
    return parts.select(
        F.col("tn").alias("n_total"),
        "k",
        F.round(between / within, 6).alias("f_stat"),
    )
