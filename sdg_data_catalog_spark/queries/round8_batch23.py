"""Round-8 operator batch 23: price elasticity, boilerplate stripping,
and feature ranking.

- ``agg_price_elasticity`` — log-log OLS elasticity of demand from the
  lineitem fact (d ln(qty) / d ln(unit price)) per return-flag
  segment: the commerce analytics classic, on the exact-integer-image
  OLS machinery.
- ``curation_boilerplate_strip`` — the APPLY step of
  text_boilerplate_df: strip each source's top template phrases from
  its documents and report the per-document character cost — detection
  reports exist to feed exactly this rewrite (the dedup_apply_canonical
  pattern, boilerplate edition).
- ``ml_feature_rank_gini`` — rank three candidate features (value,
  hour-of-day, user-id bucket) by their best decision-stump Gini for
  predicting purchases, ALL in one corpus pass over a unioned
  (feature, threshold) grid — the feature-selection step before any
  tree ensemble training.

Determinism: elasticity rides FLOOR(ln·10⁶) images with decimal OLS
sums; stripping applies a FIXED-rank phrase ladder (five nested
literal-free REPLACEs, identical order both engines — no lambda folds,
per the DuckDB list_reduce corruption finding); feature ranking reuses
the packed-integer Gini argmin.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


@register(
    "agg_price_elasticity",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(FLOOR(ln(l_extendedprice / l_quantity) * 1e6) AS BIGINT)
               AS x,
             CAST(FLOOR(ln(l_quantity) * 1e6) AS BIGINT) AS y
      FROM lineitem WHERE l_quantity > 0 AND l_extendedprice > 0
    ),
    s AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS HUGEINT)) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx
      FROM v GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS elasticity,
           ROUND(CAST(sx AS DOUBLE) / n / 1e6, 6) AS avg_ln_price,
           ROUND(CAST(sy AS DOUBLE) / n / 1e6, 6) AS avg_ln_qty
    FROM s ORDER BY l_returnflag
    """,
)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand per return-flag segment: the slope of
    ln(quantity) on ln(unit price) — elasticity < −1 is elastic demand
    (discounts pay for themselves), > −1 inelastic. ln values ride
    FLOOR(·10⁶) integer images (identical IEEE ln chains on exact
    inputs), the OLS sufficient statistics accumulate in decimal
    (Σx·y of 10⁷ micro-images overflows int64), and the slope is one
    closed-form double expression (the ts_forecast_ols convention
    applied to a log-log fit). ONE partially-aggregated corpus pass —
    the whole regression costs a groupBy."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
    )
    v = li.select(
        "l_returnflag",
        F.floor(F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 1e6)
        .cast("bigint")
        .alias("x"),
        F.floor(F.log(F.col("l_quantity")) * 1e6).cast("bigint").alias("y"),
    )
    s = v.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("decimal(38,0)").alias("sy"),
        F.sum((F.col("x").cast("decimal(19,0)") * F.col("y")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum((F.col("x").cast("decimal(19,0)") * F.col("x")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("elasticity"),
        F.round(F.col("sx").cast("double") / F.col("n") / 1e6, 6).alias(
            "avg_ln_price"
        ),
        F.round(F.col("sy").cast("double") / F.col("n") / 1e6, 6).alias(
            "avg_ln_qty"
        ),
    ).orderBy("l_returnflag")


_STRIP_TOPK = 5
_STRIP_DF_MIN = 3


@register(
    "curation_boilerplate_strip",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    tri AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
      FROM toks WHERE len(t) >= 3
    ),
    dfreq AS (
      SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS df
      FROM tri GROUP BY source, gram
    ),
    top AS (
      SELECT source, gram,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY df DESC, gram ASC) AS rk
      FROM dfreq WHERE df >= {_STRIP_DF_MIN}
    ),
    phr AS (
      SELECT source,
             MAX(CASE WHEN rk = 1 THEN gram END) AS p1,
             MAX(CASE WHEN rk = 2 THEN gram END) AS p2,
             MAX(CASE WHEN rk = 3 THEN gram END) AS p3,
             MAX(CASE WHEN rk = 4 THEN gram END) AS p4,
             MAX(CASE WHEN rk = 5 THEN gram END) AS p5
      FROM top WHERE rk <= {_STRIP_TOPK} GROUP BY source
    )
    SELECT d.doc_id,
           CAST(length(d.text) AS BIGINT) AS chars_before,
           CAST(length(
             replace(replace(replace(replace(replace(d.text,
               COALESCE(p.p1, chr(1)), ''),
               COALESCE(p.p2, chr(1)), ''),
               COALESCE(p.p3, chr(1)), ''),
               COALESCE(p.p4, chr(1)), ''),
               COALESCE(p.p5, chr(1)), '')) AS BIGINT) AS chars_after
    FROM documents d LEFT JOIN phr p ON p.source = d.source
    WHERE d.doc_id % 20 = 0
    ORDER BY d.doc_id
    """,
)
def curation_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply step of the boilerplate pipeline: each source's top-5
    template 3-grams (by document frequency, the text_boilerplate_df
    detector) are stripped from its documents, reporting the
    per-document character cost — the rewrite that turns a detection
    report into cleaned training data. The strip is a FIXED ladder of
    five nested REPLACEs in deterministic (df DESC, gram) rank order —
    identical substitution order on both engines, no lambda fold (the
    DuckDB list_reduce corruption finding rules those out for oracles).
    Missing ranks substitute an unmatchable sentinel (chr(1) cannot
    occur in the corpus), so short phrase lists are no-ops, not nulls.
    Plan: the detector's one shuffle + a broadcast |sources|-row phrase
    table joined onto a map-side rewrite; the doc_id % 20 slice bounds
    the driver comparison, the operator itself is corpus-wide."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("t"))
    tri = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("t", i),
                        F.element_at("t", i + F.lit(1)),
                        F.element_at("t", i + F.lit(2)),
                    ),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    dfreq = tri.groupBy("source", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    w_rk = Window.partitionBy("source").orderBy(F.desc("df"), F.asc("gram"))
    top = (
        dfreq.filter(F.col("df") >= _STRIP_DF_MIN)
        .select("source", "gram", F.row_number().over(w_rk).alias("rk"))
        .filter(F.col("rk") <= _STRIP_TOPK)
    )
    phr = top.groupBy("source").agg(
        *[
            F.max(F.when(F.col("rk") == i, F.col("gram"))).alias(f"p{i}")
            for i in range(1, _STRIP_TOPK + 1)
        ]
    )
    stripped = F.col("text")
    for i in range(1, _STRIP_TOPK + 1):
        stripped = F.replace(
            stripped,
            F.coalesce(F.col(f"p{i}"), F.lit("\x01")),
            F.lit(""),
        )
    return (
        docs.filter(F.col("doc_id") % 20 == 0)
        .join(F.broadcast(phr), "source", "left")
        .select(
            "doc_id",
            F.length("text").cast("bigint").alias("chars_before"),
            F.length(stripped).cast("bigint").alias("chars_after"),
        )
        .orderBy("doc_id")
    )


# feature grids: value micro-image thresholds (the ml_split_stump grid),
# hour-of-day cuts, user-bucket cuts — all literal, all scanned in ONE pass
_VAL_GRID = [d * 10**b for b in range(4, 9) for d in range(1, 10)]
_HOUR_GRID = list(range(1, 24))
_BUCKET_GRID = list(range(1, 10))

_GRID_ROWS_SQL = " UNION ALL ".join(
    [f"SELECT 'value' AS feature, {t} AS thr" for t in _VAL_GRID]
    + [f"SELECT 'hour' AS feature, {t} AS thr" for t in _HOUR_GRID]
    + [f"SELECT 'bucket' AS feature, {t} AS thr" for t in _BUCKET_GRID]
)

_GINI_SQL = """ROUND(CASE WHEN nl = 0 OR n - nl = 0 THEN 2.0 ELSE
    (nl * (1.0 - (CAST(pl AS DOUBLE)/nl)*(CAST(pl AS DOUBLE)/nl)
               - (CAST(nl-pl AS DOUBLE)/nl)*(CAST(nl-pl AS DOUBLE)/nl))
     + (n-nl) * (1.0
               - (CAST(p-pl AS DOUBLE)/(n-nl))*(CAST(p-pl AS DOUBLE)/(n-nl))
               - (CAST((n-nl)-(p-pl) AS DOUBLE)/(n-nl))*(CAST((n-nl)-(p-pl) AS DOUBLE)/(n-nl))))
    / n END, 9)"""


@register(
    "ml_feature_rank_gini",
    oracle=f"""
    WITH v AS (
      SELECT CAST(FLOOR(value * 1e6) AS BIGINT) AS fval,
             CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS fhour,
             CAST(user_id % 10 AS BIGINT) AS fbucket,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    grid AS ({_GRID_ROWS_SQL}),
    agg AS (
      SELECT g.feature, g.thr,
             CAST(SUM(CASE WHEN (CASE g.feature WHEN 'value' THEN v.fval
                                 WHEN 'hour' THEN v.fhour
                                 ELSE v.fbucket END) < g.thr
                           THEN 1 ELSE 0 END) AS BIGINT) AS nl,
             CAST(SUM(CASE WHEN (CASE g.feature WHEN 'value' THEN v.fval
                                 WHEN 'hour' THEN v.fhour
                                 ELSE v.fbucket END) < g.thr
                           THEN v.y ELSE 0 END) AS BIGINT) AS pl,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v.y) AS BIGINT) AS p
      FROM grid g CROSS JOIN v GROUP BY g.feature, g.thr
    ),
    scored AS (
      SELECT feature, thr, {_GINI_SQL} AS gini FROM agg
    ),
    best AS (
      SELECT feature,
             MIN(CAST(FLOOR(gini * 1e9) AS BIGINT) * 1000000000
                 + thr) AS bk
      FROM scored GROUP BY feature
    ),
    chosen AS (
      SELECT s.feature, s.thr, s.gini
      FROM scored s JOIN best b
        ON b.feature = s.feature
       AND CAST(FLOOR(s.gini * 1e9) AS BIGINT) * 1000000000 + s.thr = b.bk
    )
    SELECT feature,
           CAST(thr AS BIGINT) AS best_threshold,
           gini AS best_gini,
           CAST(ROW_NUMBER() OVER (ORDER BY gini, feature) AS BIGINT)
             AS feature_rank
    FROM chosen ORDER BY feature_rank
    """,
)
def ml_feature_rank_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature selection by stump Gini: three candidate predictors of
    the purchase label — the value micro-image (45 thresholds),
    hour-of-day (23), and user-id bucket (9) — scored in ONE corpus
    pass over the unioned 77-row literal (feature, threshold) grid
    (broadcast crossJoin + conditional partial aggregation, the
    ml_split_stump shape generalized across features). The per-feature
    winner is the packed-integer Gini argmin (threshold domains are
    < 10⁹, so floor(gini·10⁹)·10⁹ + thr stays in int64), and features
    rank by their best achievable split — the cheap screen run before
    spending a tree ensemble on useless columns."""
    # epoch-hour mod 24, NOT EXTRACT(hour): the extract is session-
    # timezone-dependent and the two engines need not agree on it
    ev = table(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 1e6).cast("bigint").alias("fval"),
        F.expr(
            "(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000) % 24"
        )
        .cast("bigint")
        .alias("fhour"),
        (F.col("user_id") % 10).cast("bigint").alias("fbucket"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    # r15 (guide §2.3 "aggregate before you shuffle", VERDICT item 5):
    # the 77× broadcast-crossJoin row blowup is gone. The value grid is
    # decade-structured (d·10^b, b∈[4,8], d∈[1,9]), so each row's count
    # of thresholds ≤ fval is pure integer arithmetic (vseg = 9·(b−4)+d,
    # capped 0/45 outside the grid), and ONE corpus pass folds into the
    # ≤ 46·24·10-cell (vseg, fhour, fbucket) cube with map-side partial
    # aggregation. Every (feature, thr) row's nl/pl/n/p is then an exact
    # integer sum over cube cells (left joins keep empty-side thresholds
    # at 0, exactly the crossJoin form's conditional-sum zeros), and the
    # gini expression sees bit-identical inputs. The 154-agg-state
    # single-pass alternative was A/B'd and measured (see
    # OPTIMIZATION_r15.md): the cube dominates both it and the crossJoin.
    vseg = F.when(F.col("fval") < 10**4, F.lit(0)).when(
        F.col("fval") >= 10**9, F.lit(45)
    )
    for b in range(4, 9):
        vseg = vseg.when(
            F.col("fval") < 10 ** (b + 1),
            F.lit((b - 4) * 9) + F.expr(f"fval DIV {10**b}"),
        )
    cube = ev.groupBy(
        vseg.cast("long").alias("vseg"), F.col("fhour"), F.col("fbucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("py"),
    )
    # fval < t_j ⇔ vseg ≤ j (vseg counts thresholds ≤ fval), so the
    # original crossJoin+conditional-agg shape now runs over the ≤ 11k
    # CUBE rows instead of every event: 77·|cube| rows through one
    # aggregate, and n/p fall out of the same pass (every cube row lands
    # in every grid group). All counts are exact integer sums — identical
    # to the per-event conditional sums they replace.
    grid_rows = (
        [("value", t, j) for j, t in enumerate(_VAL_GRID)]
        + [("hour", t, None) for t in _HOUR_GRID]
        + [("bucket", t, None) for t in _BUCKET_GRID]
    )
    grid = spark.createDataFrame(grid_rows, "feature string, thr long, j long")
    cond = (
        F.when(F.col("feature") == "value", F.col("vseg") <= F.col("j"))
        .when(F.col("feature") == "hour", F.col("fhour") < F.col("thr"))
        .otherwise(F.col("fbucket") < F.col("thr"))
    )
    zero = F.lit(0).cast("bigint")
    agg = (
        cube.crossJoin(F.broadcast(grid))
        .groupBy("feature", "thr")
        .agg(
            F.sum(F.when(cond, F.col("cnt")).otherwise(zero))
            .cast("bigint")
            .alias("nl"),
            F.sum(F.when(cond, F.col("py")).otherwise(zero))
            .cast("bigint")
            .alias("pl"),
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum("py").cast("bigint").alias("p"),
        )
    )
    scored = agg.selectExpr("feature", "thr", _GINI_SQL + " AS gini")
    key = F.floor(F.col("gini") * 1e9).cast("long") * F.lit(
        1_000_000_000
    ) + F.col("thr")
    best = scored.groupBy("feature").agg(F.min(key).alias("bk"))
    chosen = (
        scored.join(F.broadcast(best), "feature")
        .filter(key == F.col("bk"))
        .coalesce(1)  # 3 rows
    )
    w = Window.partitionBy(F.spark_partition_id()).orderBy("gini", "feature")
    return chosen.select(
        "feature",
        F.col("thr").cast("bigint").alias("best_threshold"),
        F.col("gini").alias("best_gini"),
        F.row_number().over(w).cast("bigint").alias("feature_rank"),
    ).orderBy("feature_rank")
