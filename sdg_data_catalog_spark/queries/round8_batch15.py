"""Round-8 operator batch 15: PSI drift, lift/gains, seasonality
strength.

- ``dq_psi`` — Population Stability Index between the first and second
  halves of the observation window over reference-decile value bins:
  THE model-monitoring drift number (credit-risk folklore thresholds:
  <0.1 stable, 0.1–0.25 shifting, >0.25 retrain). KS tests reject at
  scale on trivia; PSI is the magnitude readout teams actually page on.
- ``agg_lift_gains`` — decile lift and cumulative-gains table of the
  deterministic classifier head: the campaign-targeting readout ("the
  top decile captures X% of positives at Y× random") that ROC/PR curves
  don't surface directly.
- ``ts_seasonality_strength`` — STL-style trend/seasonal strength
  F = max(0, 1 − Var(remainder)/Var(component+remainder)) per event
  series from the ts_decompose_ma decomposition: the scalar that says
  whether seasonal adjustment is worth doing before anomaly detection.

Determinism: PSI bins come from exact integer reference-decile edges
(two-phase running total over the value census); bin counts are exact;
per-bin PSI terms are identical double chains floored at 1e-9 and
summed as integers. Lift deciles ride the agg_roc_auc fixed-width rank
key; every decile statistic is an exact-integer ratio. Seasonality
strengths use FLOOR(·10⁶) images of the decomposition residuals with
decimal moment sums.

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
    "dq_psi",
    oracle=f"""
    WITH v AS (
      SELECT epoch_us(ts) // {_DAY_US} AS day,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS m FROM v),
    halves AS (
      SELECT CASE WHEN day < m THEN 0 ELSE 1 END AS half, img
      FROM v CROSS JOIN mid
    ),
    refc AS (
      SELECT img, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM halves WHERE half = 0 GROUP BY img
    ),
    cum AS (
      SELECT img,
             CAST(SUM(cnt) OVER (ORDER BY img ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS c,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM refc
    ),
    edges AS (
      SELECT k, MIN(CASE WHEN c * 10 >= k * n THEN img END) AS edge
      FROM cum CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS k)
      GROUP BY k
    ),
    binned AS (
      SELECT h.half,
             (SELECT COUNT(*) FROM edges e WHERE h.img > e.edge) AS bin
      FROM halves h
    ),
    cells AS (
      SELECT bin,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT CAST(SUM(r) AS BIGINT) AS nr, CAST(SUM(c) AS BIGINT) AS nc
            FROM cells),
    terms AS (
      SELECT cells.bin, cells.r AS n_ref, cells.c AS n_cur,
             CAST(FLOOR((CAST(cells.c + 1 AS DOUBLE) / (tot.nc + 10)
                         - CAST(cells.r + 1 AS DOUBLE) / (tot.nr + 10))
                        * ln((CAST(cells.c + 1 AS DOUBLE) / (tot.nc + 10))
                             / (CAST(cells.r + 1 AS DOUBLE) / (tot.nr + 10)))
                        * 1e9) AS BIGINT) AS term_nano
      FROM cells CROSS JOIN tot
    )
    SELECT bin, n_ref, n_cur,
           ROUND(term_nano / 1e9, 6) AS psi_term,
           ROUND(CAST(SUM(term_nano) OVER () AS DOUBLE) / 1e9, 6) AS psi_total
    FROM terms ORDER BY bin
    """,
)
def dq_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the value distribution, second half
    of the observation window vs the first (the production monitoring
    frame: yesterday's scores vs the training-time reference):
    PSI = Σ_bins (p_cur − p_ref)·ln(p_cur/p_ref) over the REFERENCE
    deciles, add-one smoothed so empty bins stay finite. Decile edges
    are exact integer order statistics (10·cum ≥ k·n — integer
    cross-multiplication over the two-phase running total of the
    reference census, never a global sort window); bin assignment
    joins the value census against the broadcast 9-row edge table;
    per-bin terms are identical IEEE double chains on exact integer
    counts, FLOORed at 1e-9 and summed as integers — the total is
    association-order-free. Emits the per-bin decomposition (which
    deciles drifted) plus the headline total on every row."""
    from pyspark import StorageLevel

    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events").select(
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
        F.floor(F.col("value") * 1e6).cast("long").alias("img"),
    )
    mid = ev.agg(
        F.expr("(MIN(day) + MAX(day) + 1) DIV 2").alias("m")
    )
    halves = ev.crossJoin(F.broadcast(mid)).select(
        F.when(F.col("day") < F.col("m"), 0).otherwise(1).alias("half"), "img"
    )
    # (half, img) census: one corpus pass; edges + binning both consume it
    census = (
        halves.groupBy("half", "img")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    refc = census.filter(F.col("half") == 0).select("img", "cnt")
    cum = running_total(refc, "img", F.col("cnt"), "c")
    n_ref = refc.agg(F.sum("cnt").cast("bigint").alias("n"))
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    edges = (
        cum.crossJoin(F.broadcast(n_ref))
        .crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.min(
                F.when(F.col("c") * 10 >= F.col("k") * F.col("n"), F.col("img"))
            ).alias("edge")
        )
        .localCheckpoint(eager=True)  # 9 rows; broadcast into the bin join
    )
    binned = (
        census.crossJoin(F.broadcast(edges))
        .groupBy("half", "img", "cnt")
        .agg(
            F.sum(F.when(F.col("img") > F.col("edge"), 1).otherwise(0)).alias(
                "bin"
            )
        )
    )
    cells = (
        binned.groupBy("bin")
        .agg(
            F.sum(F.when(F.col("half") == 0, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_ref"),
            F.sum(F.when(F.col("half") == 1, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_cur"),
        )
        .coalesce(1)  # ≤10 rows
        .localCheckpoint(eager=True)  # totals + terms + total-window consume
    )
    tot = cells.agg(
        F.sum("n_ref").cast("bigint").alias("nr"),
        F.sum("n_cur").cast("bigint").alias("nc"),
    )
    p_cur = (F.col("n_cur") + 1).cast("double") / (F.col("nc") + 10)
    p_ref = (F.col("n_ref") + 1).cast("double") / (F.col("nr") + 10)
    terms = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.floor((p_cur - p_ref) * F.log(p_cur / p_ref) * 1e9)
        .cast("bigint")
        .alias("term_nano"),
    )
    w_all = Window.partitionBy(F.spark_partition_id()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        terms.coalesce(1)
        .select(
            "bin",
            "n_ref",
            "n_cur",
            F.round(F.col("term_nano") / 1e9, 6).alias("psi_term"),
            F.round(
                F.sum("term_nano").over(w_all).cast("double") / 1e9, 6
            ).alias("psi_total"),
        )
        .orderBy("bin")
    )


_BERT_P_SQL = """1.0 / (1.0 + exp(-list_sum(list_transform(range(1, 65),
    i -> CAST(embedding[i] AS DOUBLE)
         * ((((i + 17) * 2654435761) % 1000003 % 97 - 48) / 48.0)))))"""


@register(
    "agg_lift_gains",
    oracle=f"""
    WITH scored AS (
        SELECT vec_id, {_BERT_P_SQL} AS p, label % 2 AS y FROM embeddings
    ),
    ranked AS (
        SELECT y,
               ROW_NUMBER() OVER (ORDER BY FLOOR(p * 1e18) DESC, vec_id DESC)
                 AS rd,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM scored
    ),
    dec AS (
      SELECT CAST((rd - 1) * 10 // n + 1 AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_d,
             CAST(SUM(y) AS BIGINT) AS pos_d
      FROM ranked GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n,
                   CAST(SUM(pos_d) AS BIGINT) AS p FROM dec)
    SELECT d.decile, d.n_d AS n, d.pos_d AS n_pos,
           FLOOR(CAST(d.pos_d AS DOUBLE) * t.n
                 / (CAST(d.n_d AS DOUBLE) * t.p) * 1e6) / 1e6 AS lift,
           FLOOR(CAST(SUM(d.pos_d) OVER (ORDER BY d.decile
                                         ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / t.p * 1e6) / 1e6 AS cum_gain
    FROM dec d CROSS JOIN tot t ORDER BY d.decile
    """,
)
def agg_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative-gains table of the deterministic
    classifier head: rows ranked by score (best first), cut into ten
    equal-count deciles; lift_d = precision-in-decile / base-rate and
    cum_gain_d = share of all positives captured by deciles 1..d — the
    "mail the top 20%" targeting readout. The global descending rank
    rides the agg_roc_auc machinery: the fixed-width
    (floor(p·10¹⁸), vec_id) key through the two-phase running total
    (range-repartition + per-partition window + broadcast offsets),
    never a single-partition ORDER BY; decile statistics are exact
    integer ratios FLOORed at 1e-6; the 10-row gains walk runs in one
    bounded partition."""
    from sdg_data_catalog_spark.operators import scoring as SC
    from sdg_data_catalog_spark.operators.curation import running_total

    emb = table(spark, sf_dir, "embeddings")
    scored = SC.classify_embeddings(emb).join(
        emb.select("vec_id", (F.col("label") % 2).alias("y")), "vec_id"
    )
    key = F.when(
        F.col("vec_id") < F.lit(10**12),
        F.format_string(
            "%020d:%012d",
            F.floor(F.col("p_positive") * 1e18).cast("long"),
            F.col("vec_id"),
        ),
    ).otherwise(
        F.raise_error(
            F.lit("agg_lift_gains: vec_id >= 1e12 overflows the %012d rank key")
        )
    )
    ranked = running_total(
        scored.withColumn("__key", key), "__key", F.lit(1), "r"
    ).select("y", "r")
    n_all = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # ascending rank r on (p ASC, vec_id ASC) -> descending rank n - r + 1
    dec = (
        ranked.crossJoin(F.broadcast(n_all))
        .select(
            F.expr("(n - r) * 10 DIV n + 1").cast("bigint").alias("decile"),
            "y",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_d"),
            F.sum("y").cast("bigint").alias("pos_d"),
        )
        .coalesce(1)  # 10 rows
        .localCheckpoint(eager=True)  # totals + gains walk consume it
    )
    tot = dec.agg(
        F.sum("n_d").cast("bigint").alias("n"),
        F.sum("pos_d").cast("bigint").alias("p"),
    )
    w_cum = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.col("n_d").alias("n"),
            F.col("pos_d").alias("n_pos"),
            (
                F.floor(
                    F.col("pos_d").cast("double")
                    * F.col("n")
                    / (F.col("n_d").cast("double") * F.col("p"))
                    * 1e6
                )
                / 1e6
            ).alias("lift"),
            (
                F.floor(
                    F.sum("pos_d").over(w_cum).cast("double") / F.col("p") * 1e6
                )
                / 1e6
            ).alias("cum_gain"),
        )
        .orderBy("decile")
    )


@register(
    "ts_seasonality_strength",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ),
    win AS (
      SELECT event_type, day, y,
             CAST(SUM(y) OVER w AS BIGINT) AS s7,
             COUNT(*) OVER w AS n7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    complete AS (SELECT event_type, day, y, s7 FROM win WHERE n7 = 7),
    sea AS (
      SELECT event_type, day % 7 AS dow,
             CAST(7 * SUM(y) - SUM(s7) AS DOUBLE) / (7.0 * COUNT(*)) AS s_dow
      FROM complete GROUP BY event_type, day % 7
    ),
    imgs AS (
      SELECT c.event_type,
             CAST(FLOOR((CAST(7 * c.y - c.s7 AS DOUBLE) / 7.0 - sea.s_dow)
                        * 1e6) AS BIGINT) AS r_img,
             CAST(FLOOR(CAST(7 * c.y - c.s7 AS DOUBLE) / 7.0 * 1e6)
                  AS BIGINT) AS d_img,
             CAST(FLOOR((c.y - sea.s_dow) * 1e6) AS BIGINT) AS t_img
      FROM complete c
      JOIN sea ON sea.event_type = c.event_type AND sea.dow = c.day % 7
    ),
    m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(r_img AS HUGEINT)) AS HUGEINT) AS sr,
             CAST(SUM(CAST(r_img AS HUGEINT) * r_img) AS HUGEINT) AS sr2,
             CAST(SUM(CAST(d_img AS HUGEINT)) AS HUGEINT) AS sd,
             CAST(SUM(CAST(d_img AS HUGEINT) * d_img) AS HUGEINT) AS sd2,
             CAST(SUM(CAST(t_img AS HUGEINT)) AS HUGEINT) AS st,
             CAST(SUM(CAST(t_img AS HUGEINT) * t_img) AS HUGEINT) AS st2
      FROM imgs GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           ROUND(GREATEST(0.0, 1.0 -
             (CAST(n AS DOUBLE) * CAST(sr2 AS DOUBLE)
              - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sd2 AS DOUBLE)
                - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))), 6)
             AS f_seasonal,
           ROUND(GREATEST(0.0, 1.0 -
             (CAST(n AS DOUBLE) * CAST(sr2 AS DOUBLE)
              - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(st2 AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))), 6)
             AS f_trend
    FROM m ORDER BY event_type
    """,
)
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style component strengths per event-type daily series
    (Hyndman's FPP convention): F_seasonal = max(0, 1 − Var(R)/Var(S+R))
    and F_trend = max(0, 1 − Var(R)/Var(T+R)) over the classical MA
    decomposition (7-day centered trend, dow seasonal means — the
    ts_decompose_ma conventions, complete windows only). Near 1 = the
    component dominates; near 0 = skip the adjustment. Residual/
    component values are FLOOR(·10⁶) images of identical double chains
    on exact integer (y, Σ7y) inputs; variances come from exact decimal
    moment sums of those images (scale cancels in the ratio). One
    per-series window + one dow aggregate + one moment aggregate over
    the bounded day table."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    complete = (
        daily.select(
            "event_type",
            "day",
            "y",
            F.sum("y").over(w).cast("bigint").alias("s7"),
            F.count(F.lit(1)).over(w).alias("n7"),
        )
        .filter(F.col("n7") == 7)
        .localCheckpoint(eager=True)  # bounded day table; two consumers
    )
    sea = (
        complete.groupBy("event_type", (F.col("day") % 7).alias("dow"))
        .agg(
            (
                (F.lit(7) * F.sum("y") - F.sum("s7")).cast("double")
                / (F.lit(7.0) * F.count(F.lit(1)))
            ).alias("s_dow")
        )
        .select(
            F.col("event_type").alias("s_et"),
            F.col("dow").alias("s_dow_key"),
            "s_dow",
        )
    )
    d_dbl = (F.lit(7) * F.col("y") - F.col("s7")).cast("double") / 7.0
    imgs = complete.join(
        F.broadcast(sea),
        (F.col("event_type") == F.col("s_et"))
        & ((F.col("day") % 7) == F.col("s_dow_key")),
    ).select(
        "event_type",
        F.floor((d_dbl - F.col("s_dow")) * 1e6).cast("bigint").alias("r_img"),
        F.floor(d_dbl * 1e6).cast("bigint").alias("d_img"),
        F.floor((F.col("y") - F.col("s_dow")) * 1e6).cast("bigint").alias("t_img"),
    )
    m = imgs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("r_img").cast("decimal(38,0)")).alias("sr"),
        F.sum((F.col("r_img") * F.col("r_img")).cast("decimal(38,0)")).alias("sr2"),
        F.sum(F.col("d_img").cast("decimal(38,0)")).alias("sd"),
        F.sum((F.col("d_img") * F.col("d_img")).cast("decimal(38,0)")).alias("sd2"),
        F.sum(F.col("t_img").cast("decimal(38,0)")).alias("st"),
        F.sum((F.col("t_img") * F.col("t_img")).cast("decimal(38,0)")).alias("st2"),
    )
    var_r = F.col("n").cast("double") * F.col("sr2").cast("double") - F.col(
        "sr"
    ).cast("double") * F.col("sr").cast("double")
    var_d = F.col("n").cast("double") * F.col("sd2").cast("double") - F.col(
        "sd"
    ).cast("double") * F.col("sd").cast("double")
    var_t = F.col("n").cast("double") * F.col("st2").cast("double") - F.col(
        "st"
    ).cast("double") * F.col("st").cast("double")
    return m.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.round(F.greatest(F.lit(0.0), 1.0 - var_r / var_d), 6).alias(
            "f_seasonal"
        ),
        F.round(F.greatest(F.lit(0.0), 1.0 - var_r / var_t), 6).alias("f_trend"),
    ).orderBy("event_type")
