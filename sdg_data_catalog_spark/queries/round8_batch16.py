"""Round-8 operator batch 16: clustering validity and scaled forecast
error.

- ``emb_silhouette`` — simplified (centroid-based) silhouette per
  k-means cluster: s = (b − a)/max(a, b) with a = distance to own
  centroid, b = nearest other centroid. The O(n·k) validity readout
  that makes "did k=4 actually fit?" answerable at corpus scale (the
  classic pairwise silhouette is O(n²) and dead on arrival at 100 TB).
- ``emb_davies_bouldin`` — Davies-Bouldin index over the same fit:
  DB = mean_i max_{j≠i} (S_i + S_j)/M_ij — lower is better, the
  standard k-selection score reported beside silhouette.
- ``ts_backtest_mase`` — Mean Absolute SCALED Error of the OLS trend
  forecast on the 7-day holdout, scaled by the in-sample seasonal-naive
  MAE (Hyndman-Koehler '06): the unit-free forecast score that lets
  series of different volumes share one quality bar (sMAPE breaks near
  zero; MASE doesn't).

Determinism: both validity indices run on the deterministic
cluster_kmeans fit (same init, same 3 Lloyd rounds — the centroids are
shared driver floats, k·dim values); per-point silhouette terms are
FLOOR(·10⁶) images summed as integers; the naive-MAE denominator of
MASE is a pure INTEGER sum of |y_t − y_{t−7}| over training days.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.queries.scoring_sampling import _kmeans_oracle_round

_DAY_US = 86_400_000_000

# shared oracle prefix: the exact 3-round unrolled Lloyd fit of
# cluster_kmeans (c3f = final centroids, k=4, init = 4 lowest vec_ids)
_KMEANS_FIT_SQL = (
    """c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)
),"""
    + ",".join(_kmeans_oracle_round(i) for i in (1, 2, 3))
    + """,
dists AS (
  SELECT e.vec_id, c.cid,
         sqrt(list_distance(list_transform(e.embedding,
                                           x -> CAST(x AS DOUBLE)),
                            c.cent)^2) AS d
  FROM embeddings e CROSS JOIN c3f c
),
own AS (
  SELECT vec_id, cid AS cluster_id, d AS a
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid)
               AS rn FROM dists) WHERE rn = 1
)"""
)


@register(
    "emb_silhouette",
    oracle=f"""
    WITH {_KMEANS_FIT_SQL},
    sil AS (
      SELECT o.cluster_id,
             CAST(FLOOR((MIN(d.d) - o.a)
                        / GREATEST(MIN(d.d), o.a) * 1e6) AS BIGINT) AS s_img
      FROM own o JOIN dists d
        ON d.vec_id = o.vec_id AND d.cid <> o.cluster_id
      GROUP BY o.vec_id, o.cluster_id, o.a
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(s_img) AS DOUBLE) / (1e6 * COUNT(*)), 6)
             AS mean_silhouette
    FROM sil GROUP BY cluster_id ORDER BY cluster_id
    """,
)
def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per cluster of the cluster_kmeans fit
    (same deterministic init and 3 Lloyd rounds): for each vector,
    a = distance to its own centroid, b = distance to the nearest OTHER
    centroid, s = (b−a)/max(a,b) ∈ [−1, 1]; the per-cluster mean says
    which clusters are tight (→1) vs overlapping (→0) vs misassigned
    (<0). The centroid-based form replaces the O(n²) pairwise
    definition with ONE map-side pass of k codegen'd distance
    expressions against broadcast-literal centroids — the only scalable
    silhouette at corpus size. Per-point terms are FLOOR(s·10⁶) images
    (identical IEEE chains on the shared fitted centroids) summed as
    exact integers per cluster."""
    from sdg_data_catalog_spark.operators.iterative import kmeans_fit

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # r14 (guide §4.2): keep_dists reuses the assignment pass's full
    # k-distance vector — the former k separate interpreted-HOF distance
    # expressions are gone (16.6 → measured-after in OPTIMIZATION_r14.md
    # at the 100× replica); sqrt(__dists[i]) is the same double as the
    # former sqrt(_sq_dist(embedding, cents[i])).
    assigned, cents = kmeans_fit(emb, k=4, iters=3, keep_dists=True)
    a = F.sqrt(F.col("__sq"))
    # nearest OTHER centroid: min over the k distances masked at own id
    b = F.array_min(
        F.array(
            *[
                F.when(F.col("cluster_id") == i, F.lit(float("inf"))).otherwise(
                    F.sqrt(F.element_at("__dists", i + 1))
                )
                for i in range(len(cents))
            ]
        )
    )
    s_img = F.floor((b - a) / F.greatest(b, a) * 1e6).cast("bigint")
    return (
        assigned.select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            s_img.alias("s_img"),
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum("s_img").cast("double") / (1e6 * F.count(F.lit(1))), 6
            ).alias("mean_silhouette"),
        )
        .orderBy("cluster_id")
    )


@register(
    "emb_davies_bouldin",
    oracle=f"""
    WITH {_KMEANS_FIT_SQL},
    scatter AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(a * 1e6) AS BIGINT)) AS BIGINT) AS sa
      FROM own GROUP BY cluster_id
    ),
    csep AS (
      SELECT a.cid AS i, b.cid AS j,
             sqrt(list_distance(a.cent, b.cent)^2) AS m
      FROM c3f a JOIN c3f b ON a.cid <> b.cid
    ),
    ratio AS (
      SELECT si.cluster_id,
             MAX((CAST(si.sa AS DOUBLE) / (1e6 * si.n)
                  + CAST(sj.sa AS DOUBLE) / (1e6 * sj.n)) / cs.m) AS db_term
      FROM scatter si
      JOIN csep cs ON cs.i = si.cluster_id
      JOIN scatter sj ON sj.cluster_id = cs.j
      GROUP BY si.cluster_id
    )
    SELECT CAST(r.cluster_id AS BIGINT) AS cluster_id,
           s.n,
           ROUND(CAST(s.sa AS DOUBLE) / (1e6 * s.n), 6) AS scatter,
           ROUND(r.db_term, 6) AS db_term,
           ROUND((SELECT AVG(db_term) FROM ratio), 6) AS db_index
    FROM ratio r JOIN scatter s ON s.cluster_id = r.cluster_id
    ORDER BY r.cluster_id
    """,
)
def emb_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin index of the cluster_kmeans fit: per cluster the
    worst (S_i + S_j)/M_ij ratio against every other cluster — S from
    mean member-to-centroid distance (FLOOR(d·10⁶) integer sums), M
    from the k×k centroid separations (driver floats, exact on both
    engines) — and the headline DB = mean of the per-cluster terms
    (lower = tighter, better-separated clusters; THE standard
    k-selection score beside silhouette). ONE corpus pass computes the
    k scatter sums map-side; everything after is k-row arithmetic
    (k² = 16 ratios), so the index costs the same at any corpus size.
    The AVG over k=4 db_terms is order-stable at ROUND 1e-6 (terms are
    identical doubles on both engines; the 4-element sum is exact in
    double precision at these magnitudes)."""
    from sdg_data_catalog_spark.operators.iterative import kmeans_fit

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned, cents = kmeans_fit(emb, k=4, iters=3)
    a_img = F.floor(F.sqrt(F.col("__sq")) * 1e6).cast("bigint")
    scatter = (
        assigned.select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            a_img.alias("a_img"),
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("a_img").cast("bigint").alias("sa"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)  # k rows; ratio matrix + output consume
    )
    import math

    sep_rows = [
        (i, j, math.sqrt(sum((x - y) ** 2 for x, y in zip(ci, cj))))
        for i, ci in enumerate(cents)
        for j, cj in enumerate(cents)
        if i != j
    ]
    csep = spark.createDataFrame(sep_rows, "i int, j int, m double")
    si = scatter.select(
        F.col("cluster_id").alias("i_id"),
        F.col("n").alias("n_i"),
        F.col("sa").alias("sa_i"),
    )
    sj = scatter.select(
        F.col("cluster_id").alias("j_id"),
        F.col("n").alias("n_j"),
        F.col("sa").alias("sa_j"),
    )
    ratio = (
        si.join(F.broadcast(csep), si.i_id == F.col("i"))
        .join(sj, sj.j_id == F.col("j"))
        .groupBy("i_id")
        .agg(
            F.max(
                (
                    F.col("sa_i").cast("double") / (1e6 * F.col("n_i"))
                    + F.col("sa_j").cast("double") / (1e6 * F.col("n_j"))
                )
                / F.col("m")
            ).alias("db_term")
        )
        .coalesce(1)
        .localCheckpoint(eager=True)  # k rows; index mean + output consume
    )
    db = ratio.agg(F.avg("db_term").alias("db_index"))
    return (
        ratio.join(scatter, ratio.i_id == scatter.cluster_id)
        .crossJoin(F.broadcast(db))
        .select(
            F.col("cluster_id").cast("bigint").alias("cluster_id"),
            "n",
            F.round(F.col("sa").cast("double") / (1e6 * F.col("n")), 6).alias(
                "scatter"
            ),
            F.round("db_term", 6).alias("db_term"),
            F.round("db_index", 6).alias("db_index"),
        )
        .orderBy("cluster_id")
    )


_TEST_DAYS = 7


@register(
    "ts_backtest_mase",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ),
    cut AS (SELECT event_type, MAX(day) - {_TEST_DAYS - 1} AS cutoff
            FROM daily GROUP BY event_type),
    train AS (
      SELECT d.event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d.day) AS BIGINT) AS sd,
             CAST(SUM(d.y) AS BIGINT) AS sy,
             CAST(SUM(d.day * d.y) AS BIGINT) AS sdy,
             CAST(SUM(d.day * d.day) AS BIGINT) AS sdd
      FROM daily d JOIN cut ON d.event_type = cut.event_type
      WHERE d.day < cut.cutoff GROUP BY d.event_type
    ),
    naive AS (
      SELECT a.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(ABS(a.y - p.y)) AS BIGINT) AS sum_abs
      FROM daily a
      JOIN daily p ON p.event_type = a.event_type AND p.day = a.day - 7
      JOIN cut ON a.event_type = cut.event_type
      WHERE a.day < cut.cutoff
      GROUP BY a.event_type
    ),
    test AS (
      SELECT d.event_type, d.day, d.y
      FROM daily d JOIN cut ON d.event_type = cut.event_type
      WHERE d.day >= cut.cutoff
    ),
    err AS (
      SELECT t.event_type,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CAST(FLOOR(ABS(t.y
                 - ((CAST(tr.sy AS DOUBLE) / tr.n)
                    + (CAST(tr.n * tr.sdy - tr.sd * tr.sy AS DOUBLE)
                       / CAST(tr.n * tr.sdd - tr.sd * tr.sd AS DOUBLE))
                      * (t.day - CAST(tr.sd AS DOUBLE) / tr.n)))
                 * 1e6) AS BIGINT)) AS BIGINT) AS num_micro
      FROM test t JOIN train tr ON t.event_type = tr.event_type
      GROUP BY t.event_type
    )
    SELECT e.event_type, e.n_test, n.n_pairs AS n_naive_pairs,
           ROUND(e.num_micro / 1e6 / e.n_test, 6) AS mae_forecast,
           ROUND(CAST(n.sum_abs AS DOUBLE) / n.n_pairs, 6) AS mae_naive,
           ROUND((e.num_micro / 1e6 / e.n_test)
                 / (CAST(n.sum_abs AS DOUBLE) / n.n_pairs), 6) AS mase
    FROM err e JOIN naive n ON n.event_type = e.event_type
    ORDER BY e.event_type
    """,
)
def ts_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Absolute Scaled Error of the OLS trend forecast on each
    series' last-7-days holdout: MASE = MAE(forecast on test) /
    MAE(seasonal-naive y[d−7] IN-SAMPLE) — Hyndman-Koehler's unit-free
    score (MASE < 1 beats the naive benchmark; sMAPE blows up near
    zero, MASE doesn't). The denominator is a PURE INTEGER sum of
    |y_t − y_{{t−7}}| over training days; the numerator sums
    FLOOR(|err|·10⁶) images of the exact-integer-sufficient-statistic
    OLS forecast (the ts_forecast_ols convention). The daily census
    materializes once; train/naive/test all consume it — bounded
    |types|×days tables after the one corpus pass."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)  # train + naive + test consume it
    )
    cut = daily.groupBy("event_type").agg(
        (F.max("day") - (_TEST_DAYS - 1)).alias("cutoff")
    )
    with_cut = daily.join(F.broadcast(cut), "event_type")
    train = (
        with_cut.filter(F.col("day") < F.col("cutoff"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("day").cast("bigint").alias("sd"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("day") * F.col("y")).cast("bigint").alias("sdy"),
            F.sum(F.col("day") * F.col("day")).cast("bigint").alias("sdd"),
        )
    )
    prev = daily.select(
        F.col("event_type").alias("p_et"),
        (F.col("day") + 7).alias("p_day"),
        F.col("y").alias("p_y"),
    )
    naive = (
        with_cut.filter(F.col("day") < F.col("cutoff"))
        .join(
            prev,
            (F.col("event_type") == F.col("p_et"))
            & (F.col("day") == F.col("p_day")),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.abs(F.col("y") - F.col("p_y"))).cast("bigint").alias(
                "sum_abs"
            ),
        )
    )
    slope = (
        F.col("n") * F.col("sdy") - F.col("sd") * F.col("sy")
    ).cast("double") / (
        F.col("n") * F.col("sdd") - F.col("sd") * F.col("sd")
    ).cast("double")
    fcast = (F.col("sy").cast("double") / F.col("n")) + slope * (
        F.col("day") - F.col("sd").cast("double") / F.col("n")
    )
    err = (
        with_cut.filter(F.col("day") >= F.col("cutoff"))
        .join(F.broadcast(train), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.floor(F.abs(F.col("y") - fcast) * 1e6).cast("bigint")
            )
            .cast("bigint")
            .alias("num_micro"),
        )
    )
    mae_f = F.col("num_micro") / 1e6 / F.col("n_test")
    mae_n = F.col("sum_abs").cast("double") / F.col("n_pairs")
    return (
        err.join(naive, "event_type")
        .select(
            "event_type",
            "n_test",
            F.col("n_pairs").alias("n_naive_pairs"),
            F.round(mae_f, 6).alias("mae_forecast"),
            F.round(mae_n, 6).alias("mae_naive"),
            F.round(mae_f / mae_n, 6).alias("mase"),
        )
        .orderBy("event_type")
    )
