"""Round-8 operator batch 4: jackknife uncertainty, graph modularity,
and XmR statistical process control.

- `agg_jackknife_variance`: delete-one-GROUP jackknife standard error
  for the global mean document length — the uncertainty estimator for
  clustered data (docs within a source correlate, so the iid bootstrap
  understates variance; the delete-a-source jackknife is what
  experiment platforms use for ratio/clustered metrics).
- `graph_modularity`: Newman modularity Q of the brand partition over
  the part co-purchase graph — the community-QUALITY score that closes
  the graph family (label_prop finds communities; this is the number
  that says whether a partition is better than chance).
- `dq_xmr_control_chart`: individuals & moving-range control limits
  over per-type daily ingest counts — classic SPC (the monitoring
  discipline behind "is today's volume out of control?"), complementing
  the z-score (dq_anomaly_days) and MAD (ts_anomaly_mad) detectors with
  the sequential-process variant.

All integer-exact until one final double expression per statistic;
order-sensitive float sums are avoided by summing 1e-6/1e-12-floored
integer images (the dq_benford convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


@register(
    "agg_jackknife_variance",
    oracle="""
    WITH g AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(s) AS st, SUM(n) AS nt,
                   CAST(COUNT(*) AS BIGINT) AS ng FROM g),
    theta AS (
      -- leave-one-source-out mean, floored to an exact 1e-9 integer
      -- image so every downstream sum is integer arithmetic
      SELECT CAST(FLOOR(CAST(st - s AS DOUBLE) / (nt - n) * 1e9) AS BIGINT)
               AS t, ng
      FROM g, tot
    ),
    agg AS (
      SELECT ng, SUM(t) AS tt,
             SUM(CAST(ng * t AS HUGEINT) * (ng * t)) AS sq,
             COUNT(*) AS cnt
      FROM theta GROUP BY ng
    )
    SELECT CAST(ng AS BIGINT) AS n_groups,
           FLOOR((SELECT CAST(st AS DOUBLE) / nt FROM tot) * 1e6) / 1e6
             AS mean_chars,
           FLOOR(sqrt(CAST(sq - CAST(tt AS HUGEINT) * tt AS DOUBLE)
                      / (CAST(ng AS DOUBLE) * ng * ng)
                      * (ng - 1.0) / ng) / 1e9 * 1e6) / 1e6
             AS jackknife_se
    FROM agg
    """,
)
def agg_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-source jackknife standard error of the global mean
    document length. Docs inside one source are correlated (same crawl,
    same template), so iid row-level resampling (agg_bootstrap_ci)
    understates uncertainty; deleting whole GROUPS is the standard
    clustered-data estimator (Efron & Stein 1981; the "delete-one-bucket"
    jackknife every large experimentation platform applies to ratio
    metrics).

    Exactness: leave-one-out means theta_i = (S-S_i)/(N-n_i) are floored
    to 1e-9 integer images t_i, and the variance numerator
    sum_i (g*t_i - T)^2 with T = sum t_i is pure integer arithmetic in
    decimal/HUGEINT (g*t_i ~ 6e12 squares past int64) — no
    order-sensitive float summation anywhere; ONE double sqrt at the
    end. Dataflow: one combinable per-source aggregation (|sources|
    rows), everything after is metadata-sized."""
    docs = table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).localCheckpoint(eager=True)  # |sources| rows; feeds totals + thetas
    tot = g.agg(
        F.sum("s").alias("st"),
        F.sum("n").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("ng"),
    )
    theta = g.crossJoin(F.broadcast(tot)).select(
        F.floor(
            (F.col("st") - F.col("s")).cast("double")
            / (F.col("nt") - F.col("n"))
            * 1e9
        )
        .cast("bigint")
        .alias("t"),
        "ng",
        "st",
        "nt",
    )
    agg = theta.groupBy("ng", "st", "nt").agg(
        F.sum("t").alias("tt"),
        F.sum(
            (F.col("ng") * F.col("t")).cast("decimal(19,0)")
            * (F.col("ng") * F.col("t")).cast("decimal(19,0)")
        ).alias("sq"),
    )
    var_num = F.col("sq").cast("decimal(38,0)") - F.col("tt").cast(
        "decimal(19,0)"
    ) * F.col("tt").cast("decimal(19,0)")
    se = (
        F.sqrt(
            var_num.cast("double")
            / (F.col("ng").cast("double") * F.col("ng") * F.col("ng"))
            * (F.col("ng") - 1.0)
            / F.col("ng")
        )
        / 1e9
    )
    return agg.select(
        F.col("ng").alias("n_groups"),
        (F.floor(F.col("st").cast("double") / F.col("nt") * 1e6) / 1e6).alias(
            "mean_chars"
        ),
        (F.floor(se * 1e6) / 1e6).alias("jackknife_se"),
    )


@register(
    "graph_modularity",
    oracle="""
    WITH base AS (
      SELECT DISTINCT l_orderkey AS ord, l_partkey AS part FROM lineitem
    ),
    e AS (
      SELECT DISTINCT a.part AS u, b.part AS v
      FROM base a JOIN base b ON a.ord = b.ord AND a.part < b.part
    ),
    lab AS (SELECT p_partkey, p_brand FROM part),
    edges AS (
      SELECT lu.p_brand AS cu, lv.p_brand AS cv
      FROM e JOIN lab lu ON lu.p_partkey = e.u
             JOIN lab lv ON lv.p_partkey = e.v
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
    intra AS (
      SELECT cu AS brand, CAST(COUNT(*) AS BIGINT) AS e_c
      FROM edges WHERE cu = cv GROUP BY cu
    ),
    deg AS (
      SELECT brand, CAST(SUM(n) AS BIGINT) AS d_c FROM (
        SELECT cu AS brand, COUNT(*) AS n FROM edges GROUP BY cu
        UNION ALL
        SELECT cv AS brand, COUNT(*) AS n FROM edges GROUP BY cv
      ) GROUP BY brand
    )
    SELECT deg.brand,
           CAST(COALESCE(intra.e_c, 0) AS BIGINT) AS intra_edges,
           d_c AS degree_sum,
           FLOOR((CAST(COALESCE(intra.e_c, 0) AS DOUBLE) / m.m
                  - (CAST(d_c AS DOUBLE) / (2 * m.m))
                    * (CAST(d_c AS DOUBLE) / (2 * m.m))) * 1e6) / 1e6
             AS q_contrib
    FROM deg LEFT JOIN intra ON intra.brand = deg.brand, m
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity contribution per community for the BRAND
    partition of the part co-purchase graph: Q_c = e_c/m - (d_c/2m)^2
    (sum over rows = Q). Answers "are co-purchases concentrated within
    brands beyond chance?" — the community-QUALITY metric that
    completes the graph family (graph_label_prop proposes communities,
    this scores a partition; Newman 2006). Per-community contributions
    are emitted (not just the scalar) so a curator sees WHICH groups
    cohere.

    Plan (graph_triangle_count template): the distinct edge list
    materializes once and the brand labels join onto BOTH endpoints via
    one broadcast dim; intra counts, degree sums, and m are metadata-
    sized aggregates of the labeled edge table (itself checkpointed —
    three consumers). All counts integer; Q terms are one identical
    double expression floored at 1e-6."""
    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("ord"), F.col("l_partkey").alias("part")
    ).distinct()
    a, b = base.alias("a"), base.alias("b")
    e = (
        a.join(b, (F.col("a.ord") == F.col("b.ord")) & (F.col("a.part") < F.col("b.part")))
        .select(F.col("a.part").alias("u"), F.col("b.part").alias("v"))
        .distinct()
    )
    lab = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    lu = lab.select(F.col("p_partkey").alias("u"), F.col("p_brand").alias("cu"))
    lv = lab.select(F.col("p_partkey").alias("v"), F.col("p_brand").alias("cv"))
    edges = (
        e.join(F.broadcast(lu), "u")
        .join(F.broadcast(lv), "v")
        .select("cu", "cv")
        .localCheckpoint(eager=True)  # labeled edge list: three consumers
    )
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    intra = (
        edges.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("brand"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    deg = (
        edges.select(F.col("cu").alias("brand"))
        .unionAll(edges.select(F.col("cv").alias("brand")))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_c"))
    )
    dm = F.col("d_c").cast("double") / (2 * F.col("m"))
    q = F.coalesce(F.col("e_c"), F.lit(0)).cast("double") / F.col("m") - dm * dm
    return (
        deg.join(intra, "brand", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "brand",
            F.coalesce(F.col("e_c"), F.lit(0)).cast("bigint").alias("intra_edges"),
            F.col("d_c").alias("degree_sum"),
            (F.floor(q * 1e6) / 1e6).alias("q_contrib"),
        )
    )


_XMR_C = 2.66  # d2-derived constant for n=2 moving ranges


@register(
    "dq_xmr_control_chart",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ),
    mr AS (
      SELECT event_type, day, y,
             abs(y - LAG(y) OVER (PARTITION BY event_type ORDER BY day)) AS mr
      FROM daily
    ),
    lim AS (
      SELECT event_type,
             CAST(SUM(y) AS BIGINT) AS sy, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(mr) AS BIGINT) AS smr,
             CAST(COUNT(mr) AS BIGINT) AS nmr
      FROM mr GROUP BY event_type
    )
    SELECT m.event_type, strftime(m.day, '%Y-%m-%d') AS day, m.y,
           FLOOR(CAST(sy AS DOUBLE) / n * 1e6) / 1e6 AS center,
           FLOOR((CAST(sy AS DOUBLE) / n
                  + {_XMR_C} * CAST(smr AS DOUBLE) / nmr) * 1e6) / 1e6 AS ucl,
           FLOOR((CAST(sy AS DOUBLE) / n
                  - {_XMR_C} * CAST(smr AS DOUBLE) / nmr) * 1e6) / 1e6 AS lcl,
           m.y > CAST(sy AS DOUBLE) / n + {_XMR_C} * CAST(smr AS DOUBLE) / nmr
            OR m.y < CAST(sy AS DOUBLE) / n - {_XMR_C} * CAST(smr AS DOUBLE) / nmr
             AS out_of_control
    FROM mr m JOIN lim USING (event_type)
    """,
)
def dq_xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals & moving range) control chart over per-type
    daily ingest counts: center = mean(y), limits = mean(y) +/-
    2.66 * mean(|y_t - y_(t-1)|) — Shewhart SPC, the SEQUENTIAL-process
    member of the anomaly family (dq_anomaly_days' z-score assumes an
    iid pool; the moving range estimates short-term variation, so a
    slow drift widens nothing and still breaches the limits). 2.66 is
    the standard 3/d2(2) constant.

    Exactness: daily counts and moving ranges are integers, the limits
    are identical double expressions from exact integer sums on both
    engines, and every flag compares the same derived doubles. The
    aggregate frame is |types| x |days| — metadata-sized; one corpus
    pass for the census (checkpointed: the lag window and the limits
    join both consume it)."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("event_type").orderBy("day")
    mr = daily.withColumn("mr", F.abs(F.col("y") - F.lag("y").over(w)))
    lim = mr.groupBy("event_type").agg(
        F.sum("y").cast("bigint").alias("sy"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("mr").cast("bigint").alias("smr"),
        F.count("mr").cast("bigint").alias("nmr"),
    )
    center = F.col("sy").cast("double") / F.col("n")
    mrbar = F.col("smr").cast("double") / F.col("nmr")
    ucl = center + _XMR_C * mrbar
    lcl = center - _XMR_C * mrbar
    return mr.join(F.broadcast(lim), "event_type").select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "y",
        (F.floor(center * 1e6) / 1e6).alias("center"),
        (F.floor(ucl * 1e6) / 1e6).alias("ucl"),
        (F.floor(lcl * 1e6) / 1e6).alias("lcl"),
        ((F.col("y") > ucl) | (F.col("y") < lcl)).alias("out_of_control"),
    )
