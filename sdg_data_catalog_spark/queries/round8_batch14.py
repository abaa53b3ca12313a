"""Round-8 operator batch 14: nearest as-of join, cross-validated stump
training, and robust outlier fences.

- ``join_asof_nearest`` — the NEAREST-neighbor as-of variant completing
  the family (backward `join_asof`, forward `join_asof_fwd_tolerance`):
  for each error event, the same user's closest signup in EITHER
  direction, prior winning ties. Sensor alignment and sessionless
  attribution want nearest, not last-before.
- ``ml_stump_cv`` — 5-fold cross-validation of the decision stump as a
  dataflow: per fold, train the threshold on the OTHER four folds
  (complement-by-subtraction — no second scan) and score held-out
  accuracy. The model-selection loop every AutoML system runs, in ONE
  corpus pass.
- ``dq_outlier_iqr`` — Tukey IQR fences per event type (1.5×IQR beyond
  p25/p75) with exact integer order statistics: THE standard box-plot
  outlier count, complementing the MAD day-level anomaly op with
  row-level fences.

Determinism: as-of picks compare exact microsecond deltas with
event_id tie-breaks; CV folds are event_id % 5 images and every
count is an exact integer; IQR quantile selection is integer
cross-multiplication on the two-phase grouped running total (never a
per-type corpus sort window), and the fence comparisons are pure
int64 (5·p25 − 3·p75 doubles the fence to stay integral).

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


@register(
    "join_asof_nearest",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS t
      FROM events WHERE event_type = 'error'
    ),
    s AS (
      SELECT user_id, epoch_us(ts) AS t
      FROM events WHERE event_type = 'signup'
    ),
    cand AS (
      SELECT e.event_id, e.user_id,
             MAX(CASE WHEN s.t <= e.t THEN s.t END) AS prev_t,
             MIN(CASE WHEN s.t > e.t THEN s.t END) AS next_t
      FROM e LEFT JOIN s ON s.user_id = e.user_id
      GROUP BY e.event_id, e.user_id
    )
    SELECT event_id, user_id,
           CAST(CASE
             WHEN prev_t IS NULL THEN next_t
             WHEN next_t IS NULL THEN prev_t
             WHEN (e_t - prev_t) <= (next_t - e_t) THEN prev_t
             ELSE next_t END AS BIGINT) AS nearest_signup_us,
           CAST(CASE
             WHEN prev_t IS NULL AND next_t IS NULL THEN NULL
             WHEN prev_t IS NULL THEN next_t - e_t
             WHEN next_t IS NULL THEN e_t - prev_t
             ELSE LEAST(e_t - prev_t, next_t - e_t) END AS BIGINT)
             AS delta_us
    FROM (SELECT c.*, e.t AS e_t FROM cand c JOIN e USING (event_id, user_id))
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each error event matched to the SAME user's
    closest signup in either time direction (prior signup wins exact
    ties — the deterministic convention). Implemented shuffle-ONCE with
    the union-carry trick run both ways: tag signups, one ascending
    window carries the latest prior signup ts, one descending window
    (same user_id partitioning — Spark reuses the single hash exchange,
    paying only a second sort) carries the earliest following one; the
    winner is an exact integer microsecond comparison. No self-join, no
    per-event range probe — the classic backward/forward/nearest as-of
    family at one shuffle each."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    tagged = ev.filter(F.col("event_type").isin("error", "signup")).select(
        "event_id",
        "user_id",
        "event_type",
        "t",
        F.when(F.col("event_type") == "signup", F.col("t")).alias("sig_t"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = tagged.select(
        "event_id",
        "user_id",
        "event_type",
        "t",
        F.max("sig_t").over(w_back).alias("prev_t"),
        F.min("sig_t").over(w_fwd).alias("next_t"),
    ).filter(F.col("event_type") == "error")
    prev_d = F.col("t") - F.col("prev_t")
    next_d = F.col("next_t") - F.col("t")
    nearest = (
        F.when(F.col("prev_t").isNull(), F.col("next_t"))
        .when(F.col("next_t").isNull(), F.col("prev_t"))
        .when(prev_d <= next_d, F.col("prev_t"))
        .otherwise(F.col("next_t"))
    )
    delta = (
        F.when(F.col("prev_t").isNull() & F.col("next_t").isNull(), F.lit(None))
        .when(F.col("prev_t").isNull(), next_d)
        .when(F.col("next_t").isNull(), prev_d)
        .otherwise(F.least(prev_d, next_d))
    )
    return carried.select(
        "event_id",
        "user_id",
        nearest.cast("bigint").alias("nearest_signup_us"),
        delta.cast("bigint").alias("delta_us"),
    )


_STUMP_GRID = [d * 10**b for b in range(4, 9) for d in range(1, 10)]
_GRID_SQL = ", ".join(str(t) for t in _STUMP_GRID)
_N_FOLDS = 5

_GINI_SQL = """ROUND(CASE WHEN {nl} = 0 OR {n} - {nl} = 0 THEN 2.0 ELSE
    ({nl} * (1.0 - (CAST({pl} AS DOUBLE)/{nl})*(CAST({pl} AS DOUBLE)/{nl})
               - (CAST({nl}-{pl} AS DOUBLE)/{nl})*(CAST({nl}-{pl} AS DOUBLE)/{nl}))
     + ({n}-{nl}) * (1.0
               - (CAST({p}-{pl} AS DOUBLE)/({n}-{nl}))*(CAST({p}-{pl} AS DOUBLE)/({n}-{nl}))
               - (CAST(({n}-{nl})-({p}-{pl}) AS DOUBLE)/({n}-{nl}))*(CAST(({n}-{nl})-({p}-{pl}) AS DOUBLE)/({n}-{nl}))))
    / {n} END, 9)"""


@register(
    "ml_stump_cv",
    oracle=f"""
    WITH v AS (
      SELECT CAST(FLOOR(value * 1e6) AS BIGINT) AS img,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
             CAST(event_id % {_N_FOLDS} AS INTEGER) AS fold
      FROM events
    ),
    grid AS (SELECT unnest([{_GRID_SQL}]) AS thr),
    cell AS (
      SELECT g.thr, v.fold,
             CAST(SUM(CASE WHEN v.img < g.thr THEN 1 ELSE 0 END) AS BIGINT)
               AS nl,
             CAST(SUM(CASE WHEN v.img < g.thr THEN v.y ELSE 0 END) AS BIGINT)
               AS pl,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v.y) AS BIGINT) AS p
      FROM grid g CROSS JOIN v GROUP BY g.thr, v.fold
    ),
    tot AS (
      SELECT thr, CAST(SUM(nl) AS BIGINT) AS nl, CAST(SUM(pl) AS BIGINT) AS pl,
             CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS p
      FROM cell GROUP BY thr
    ),
    train AS (
      SELECT c.fold, c.thr,
             t.nl - c.nl AS nl, t.pl - c.pl AS pl,
             t.n - c.n AS n, t.p - c.p AS p
      FROM cell c JOIN tot t ON t.thr = c.thr
    ),
    scored AS (
      SELECT fold, thr, nl, pl, n, p,
             {_GINI_SQL.format(nl="nl", pl="pl", n="n", p="p")} AS gini
      FROM train
    ),
    best AS (
      SELECT fold,
             MIN(CAST(FLOOR(gini * 1e9) AS BIGINT) * 1000000
                 + CAST(thr // 1000 AS BIGINT)) AS bk
      FROM scored GROUP BY fold
    ),
    chosen AS (
      SELECT s.fold, s.thr, s.gini,
             CASE WHEN 2 * s.pl > s.nl THEN 1 ELSE 0 END AS left_pos,
             CASE WHEN 2 * (s.p - s.pl) > (s.n - s.nl) THEN 1 ELSE 0 END
               AS right_pos
      FROM scored s JOIN best b
        ON b.fold = s.fold
       AND CAST(FLOOR(s.gini * 1e9) AS BIGINT) * 1000000
           + CAST(s.thr // 1000 AS BIGINT) = b.bk
    )
    SELECT ch.fold, CAST(ch.thr AS DOUBLE) / 1e6 AS threshold,
           ch.gini AS train_gini, c.n AS n_holdout,
           ROUND(CAST((CASE WHEN ch.left_pos = 1 THEN c.pl
                            ELSE c.nl - c.pl END)
                      + (CASE WHEN ch.right_pos = 1 THEN c.p - c.pl
                              ELSE (c.n - c.nl) - (c.p - c.pl) END)
                      AS DOUBLE) / c.n, 6) AS holdout_accuracy
    FROM chosen ch JOIN cell c ON c.fold = ch.fold AND c.thr = ch.thr
    ORDER BY ch.fold
    """,
)
def ml_stump_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation of the ml_split_stump trainer, entirely
    as a dataflow: ONE corpus pass conditionally aggregates the
    45-threshold × 5-fold contingency cube; each fold's TRAINING
    counts are the per-threshold totals minus its own cell (the
    complement-by-subtraction convention — no second scan); the
    per-fold winning threshold is the packed-integer Gini argmin, its
    leaf labels are the training-side majorities, and held-out accuracy
    reads straight off the fold's own cell. The full model-selection
    loop — train ×5, evaluate ×5 — costs exactly one pass over the
    data plus arithmetic on a 225-row cube; fold assignment is the
    event_id % 5 image, reproducible anywhere."""
    ev = table(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 1e6).cast("long").alias("img"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (F.col("event_id") % _N_FOLDS).cast("int").alias("fold"),
    )
    grid = spark.createDataFrame([(t,) for t in _STUMP_GRID], "thr long")
    cell = (
        ev.crossJoin(F.broadcast(grid))
        .groupBy("thr", "fold")
        .agg(
            F.sum(F.when(F.col("img") < F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("nl"),
            F.sum(F.when(F.col("img") < F.col("thr"), F.col("y")).otherwise(0))
            .cast("bigint")
            .alias("pl"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("p"),
        )
        .localCheckpoint(eager=True)  # 225 rows; totals + train + eval consume
    )
    tot = cell.groupBy("thr").agg(
        F.sum("nl").cast("bigint").alias("t_nl"),
        F.sum("pl").cast("bigint").alias("t_pl"),
        F.sum("n").cast("bigint").alias("t_n"),
        F.sum("p").cast("bigint").alias("t_p"),
    )
    train = cell.join(F.broadcast(tot), "thr").select(
        "fold",
        "thr",
        (F.col("t_nl") - F.col("nl")).alias("nl"),
        (F.col("t_pl") - F.col("pl")).alias("pl"),
        (F.col("t_n") - F.col("n")).alias("n"),
        (F.col("t_p") - F.col("p")).alias("p"),
    )
    scored = train.selectExpr(
        "fold",
        "thr",
        "nl",
        "pl",
        "n",
        "p",
        _GINI_SQL.format(nl="nl", pl="pl", n="n", p="p") + " AS gini",
    )
    key = F.floor(F.col("gini") * 1e9).cast("long") * F.lit(1_000_000) + F.expr(
        "CAST(thr DIV 1000 AS BIGINT)"
    )
    best = scored.groupBy("fold").agg(F.min(key).alias("bk"))
    chosen = (
        scored.join(F.broadcast(best), "fold")
        .filter(key == F.col("bk"))
        .select(
            "fold",
            "thr",
            "gini",
            (2 * F.col("pl") > F.col("nl")).cast("int").alias("left_pos"),
            (2 * (F.col("p") - F.col("pl")) > (F.col("n") - F.col("nl")))
            .cast("int")
            .alias("right_pos"),
        )
    )
    hold = chosen.join(cell, ["fold", "thr"])
    correct = F.when(F.col("left_pos") == 1, F.col("pl")).otherwise(
        F.col("nl") - F.col("pl")
    ) + F.when(F.col("right_pos") == 1, F.col("p") - F.col("pl")).otherwise(
        (F.col("n") - F.col("nl")) - (F.col("p") - F.col("pl"))
    )
    return hold.select(
        "fold",
        (F.col("thr").cast("double") / 1e6).alias("threshold"),
        F.col("gini").alias("train_gini"),
        F.col("n").alias("n_holdout"),
        F.round(correct.cast("double") / F.col("n"), 6).alias("holdout_accuracy"),
    ).orderBy("fold")


@register(
    "dq_outlier_iqr",
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
    q AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MIN(CASE WHEN cum * 4 >= n THEN img END) AS p25,
             MIN(CASE WHEN cum * 4 >= 3 * n THEN img END) AS p75
      FROM c GROUP BY event_type
    ),
    f AS (
      SELECT event_type, n, p25, p75,
             5 * p25 - 3 * p75 AS lo2, 5 * p75 - 3 * p25 AS hi2
      FROM q
    )
    SELECT f.event_type, f.n,
           CAST(f.p25 AS DOUBLE) / 1e6 AS p25,
           CAST(f.p75 AS DOUBLE) / 1e6 AS p75,
           CAST(f.p75 - f.p25 AS DOUBLE) / 1e6 AS iqr,
           CAST(COALESCE(SUM(CASE WHEN 2 * pv.img < f.lo2
                                       OR 2 * pv.img > f.hi2
                                  THEN pv.cnt ELSE 0 END), 0) AS BIGINT)
             AS n_outliers,
           ROUND(CAST(COALESCE(SUM(CASE WHEN 2 * pv.img < f.lo2
                                             OR 2 * pv.img > f.hi2
                                        THEN pv.cnt ELSE 0 END), 0) AS DOUBLE)
                 / f.n, 6) AS outlier_rate
    FROM f JOIN pv ON pv.event_type = f.event_type
    GROUP BY f.event_type, f.n, f.p25, f.p75, f.lo2, f.hi2
    ORDER BY f.event_type
    """,
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey box-plot outlier fences per event type: p25/p75 from exact
    integer order statistics over the per-type value census, fences at
    1.5×IQR beyond them, and the row count falling outside. Quantile
    selection is integer cross-multiplication (4·cum ≥ n picks the
    ceil-rank order statistic — no float quantile interpolation to
    disagree about); the fences are kept INTEGRAL by doubling
    (2·img vs 5·p25 − 3·p75), so the outlier verdict is a pure int64
    comparison on both engines.

    Scale note: the micro-value census is NOT small here (~50% of
    corpus rows on near-continuous values), so the per-type cumulative
    counts run through the TWO-PHASE running total
    (operators/curation.py) on a packed (type-index·10¹² + img) key —
    the agg_mann_whitney convention — instead of a per-type ORDER BY
    window whose biggest group would be a single-reducer corpus sort.
    Per-type offsets come off the |types|-row total table. img must be
    non-negative and < 10¹² for the packing (holds for the micro-image
    of this bounded metric; documented, not silent — packing would
    collide loudly in the unique-key assert of running_total's sort)."""
    from pyspark import StorageLevel

    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1e6).cast("long").alias("img")
    )
    pv = (
        ev.groupBy("event_type", "img")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # census-grained; quantile walk + fence recount both consume it
    )
    # tiny deterministic type index (|types| rows) for the packed key
    w_idx = Window.partitionBy(F.spark_partition_id()).orderBy("event_type")
    types = (
        pv.select("event_type")
        .distinct()
        .coalesce(1)
        .select("event_type", (F.row_number().over(w_idx) - 1).alias("tidx"))
        .localCheckpoint(eager=True)  # |types| rows; key pack + offsets use it
    )
    tot_t = (
        pv.groupBy("event_type")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .join(F.broadcast(types), "event_type")
        .coalesce(1)  # |types| rows; offset walk below
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
    ).localCheckpoint(eager=True)  # |types| rows; broadcast into the census
    packed = pv.join(F.broadcast(types), "event_type").select(
        "event_type",
        "img",
        "cnt",
        (F.col("tidx") * F.lit(10**12) + F.col("img")).alias("key"),
    )
    glob = running_total(packed, "key", F.col("cnt"), "run")
    c = glob.join(F.broadcast(offs), "event_type").select(
        "event_type",
        "img",
        "n",
        (F.col("run") - F.col("off")).cast("bigint").alias("cum"),
    )
    q = c.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.min(F.when(F.col("cum") * 4 >= F.col("n"), F.col("img"))).alias("p25"),
        F.min(F.when(F.col("cum") * 4 >= 3 * F.col("n"), F.col("img"))).alias(
            "p75"
        ),
    )
    f = q.select(
        "event_type",
        "n",
        "p25",
        "p75",
        (5 * F.col("p25") - 3 * F.col("p75")).alias("lo2"),
        (5 * F.col("p75") - 3 * F.col("p25")).alias("hi2"),
    )
    out = F.sum(
        F.when(
            (2 * F.col("img") < F.col("lo2")) | (2 * F.col("img") > F.col("hi2")),
            F.col("cnt"),
        ).otherwise(0)
    ).cast("bigint")
    return (
        pv.join(F.broadcast(f), "event_type")
        .groupBy("event_type", "n", "p25", "p75")
        .agg(out.alias("n_outliers"))
        .select(
            "event_type",
            "n",
            (F.col("p25").cast("double") / 1e6).alias("p25"),
            (F.col("p75").cast("double") / 1e6).alias("p75"),
            ((F.col("p75") - F.col("p25")).cast("double") / 1e6).alias("iqr"),
            "n_outliers",
            F.round(F.col("n_outliers").cast("double") / F.col("n"), 6).alias(
                "outlier_rate"
            ),
        )
        .orderBy("event_type")
    )
