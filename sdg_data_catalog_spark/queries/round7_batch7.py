"""Round-7 batch 7: contrastive-pair mining, forecast backtesting, and
contingency-table inference.

- ``emb_triplet_mining`` — hard-triplet mining for contrastive training:
  for each anchor embedding, the most-similar SAME-label candidate
  (positive) and the most-similar DIFFERENT-label candidate (the hard
  negative), found with ONE partially-aggregated groupBy over lexical
  max-structs — no per-anchor sort, no window over corpus-sized groups.
- ``ts_backtest_smape`` — rolling-origin forecast backtest: hold out the
  last seven days per series, forecast them with seasonal-naive (y[d−7])
  and the closed-form OLS trend fit on the training prefix, and report
  per-day absolute error and sMAPE terms for both methods side by side.
- ``agg_chisq_independence`` — χ² test of independence on the
  event-type × day-of-week contingency table (is traffic mix stable
  across the week?), with per-cell terms and the floored-term exact
  total (the dq_benford_digits convention).

Determinism: similarity argmaxes compare (floor(cos·10¹²), vec_id)
integer structs; OLS coefficients come from exact integer sufficient
statistics; χ² cell terms are single identical double expressions and
the total sums their 1e-6 floors.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_N_ANCHORS = 32

_UNIT_SQL = """
unit AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(x AS DOUBLE)
                / sqrt(list_sum(list_transform(embedding,
                        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
  FROM embeddings
)
"""

_COS_QC = """list_sum(list_transform(range(1, 65),
    i -> q.u[i] * c.u[i]))"""


@register(
    "emb_triplet_mining",
    oracle=f"""
    WITH {_UNIT_SQL},
    pairs AS (
      SELECT q.vec_id AS anchor_id, q.label AS a_label,
             c.vec_id AS cand_id,
             (c.label = q.label) AS same_label,
             CAST(FLOOR(({_COS_QC}) * 1e12) AS BIGINT) AS k
      FROM unit q JOIN unit c
        ON q.vec_id < {_N_ANCHORS} AND c.vec_id >= {_N_ANCHORS}
    ),
    best AS (
      SELECT anchor_id, a_label, same_label, cand_id, k,
             ROW_NUMBER() OVER (PARTITION BY anchor_id, same_label
                                ORDER BY k DESC, cand_id) AS rk
      FROM pairs QUALIFY rk = 1
    )
    SELECT anchor_id, CAST(MAX(a_label) AS BIGINT) AS a_label,
           CAST(MAX(CASE WHEN same_label THEN cand_id END) AS BIGINT)
             AS pos_id,
           CAST(MAX(CASE WHEN same_label THEN k END) AS DOUBLE) / 1e12
             AS pos_cos,
           CAST(MAX(CASE WHEN NOT same_label THEN cand_id END) AS BIGINT)
             AS neg_id,
           CAST(MAX(CASE WHEN NOT same_label THEN k END) AS DOUBLE) / 1e12
             AS neg_cos,
           CAST(MAX(CASE WHEN same_label THEN k END)
                - MAX(CASE WHEN NOT same_label THEN k END) AS DOUBLE) / 1e12
             AS margin
    FROM best GROUP BY anchor_id ORDER BY anchor_id
    """,
)
def emb_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-triplet mining — the data-generation step of contrastive
    embedding training: per anchor, the nearest same-label candidate
    (positive) and nearest different-label candidate (the HARD negative,
    the one that most improves the margin loss). The 32 anchors
    broadcast against the candidate corpus; each argmax is ONE
    partially-aggregated groupBy whose combine is a lexical max over
    (floor(cos·10¹²), −cand_id) structs — exact integers, so ties break
    to the lowest candidate id on both engines and NO per-anchor sort or
    corpus-sized-group window ever runs. Cosines use the agg_ndcg
    normalize-then-ordered-fold convention (identical per-dimension fold
    on both engines). Margin = pos − neg in the same fixed-point image."""
    from sdg_data_catalog_spark.operators import similarity as S

    emb = table(spark, sf_dir, "embeddings")
    # r14 (guide §4.2): per-pair normalize+cosine through the Arrow
    # per-dimension fold (S.unit_cos_pairs — bit-identical chain;
    # 62.8 → 3.3 s (min-of-3) at the 100× replica). The argmax machinery below is
    # unchanged.
    pairs = S.unit_cos_pairs(emb, _N_ANCHORS).select(
        "anchor_id",
        "a_label",
        "cand_id",
        (F.col("c_label") == F.col("a_label")).alias("same_label"),
        F.floor(F.col("cos") * 1e12).cast("long").alias("k"),
    )
    # lexical max over (k, -cand_id): best similarity, lowest-id tie-break
    pick = F.struct(F.col("k"), (-F.col("cand_id")).alias("nc"))
    best = pairs.groupBy("anchor_id").agg(
        F.max("a_label").cast("bigint").alias("a_label"),
        F.max(F.when(F.col("same_label"), pick)).alias("p"),
        F.max(F.when(~F.col("same_label"), pick)).alias("n"),
    )
    return best.select(
        "anchor_id",
        "a_label",
        (-F.col("p.nc")).cast("bigint").alias("pos_id"),
        (F.col("p.k").cast("double") / 1e12).alias("pos_cos"),
        (-F.col("n.nc")).cast("bigint").alias("neg_id"),
        (F.col("n.k").cast("double") / 1e12).alias("neg_cos"),
        ((F.col("p.k") - F.col("n.k")).cast("double") / 1e12).alias("margin"),
    ).orderBy("anchor_id")


_DAY_US = 86_400_000_000
_TEST_DAYS = 7


@register(
    "ts_backtest_smape",
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
    test AS (
      SELECT d.event_type, d.day, d.y
      FROM daily d JOIN cut ON d.event_type = cut.event_type
      WHERE d.day >= cut.cutoff
    ),
    fc AS (
      SELECT t.event_type, t.day, t.y, 'ols' AS method,
             (CAST(tr.sy AS DOUBLE) / tr.n)
             + (CAST(tr.n * tr.sdy - tr.sd * tr.sy AS DOUBLE)
                / CAST(tr.n * tr.sdd - tr.sd * tr.sd AS DOUBLE))
               * (t.day - CAST(tr.sd AS DOUBLE) / tr.n) AS f
      FROM test t JOIN train tr ON t.event_type = tr.event_type
      UNION ALL
      SELECT t.event_type, t.day, t.y, 'seasonal_naive' AS method,
             CAST(p.y AS DOUBLE) AS f
      FROM test t JOIN daily p
        ON p.event_type = t.event_type AND p.day = t.day - 7
    )
    SELECT event_type, CAST(day AS BIGINT) AS day, method, y AS actual,
           ROUND(f, 6) AS forecast,
           ROUND(ABS(y - f), 6) AS abs_err,
           ROUND(2 * ABS(y - f) / (ABS(CAST(y AS DOUBLE)) + ABS(f)), 6)
             AS smape_term
    FROM fc ORDER BY event_type, day, method
    """,
)
def ts_backtest_smape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest: hold out each series' last
    seven days, forecast them with (a) seasonal-naive y[d−7] and (b) the
    closed-form OLS trend fit on the training prefix (the ts_forecast_ols
    integer-sufficient-statistics convention: slope and mean are single
    double divisions of exact int64 sums), and report per-day absolute
    error and sMAPE terms for both methods — the model-selection readout
    a forecasting pipeline runs before promoting a method. The daily
    census localCheckpoints once (both forecast branches and the
    seasonal lookup consume it — the shared-subtree lesson); everything
    downstream is |types|×days-sized."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)
    )
    cut = daily.groupBy("event_type").agg(
        (F.max("day") - (_TEST_DAYS - 1)).alias("cutoff")
    )
    d = daily.join(F.broadcast(cut), "event_type")
    train = (
        d.filter(F.col("day") < F.col("cutoff"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("day").cast("bigint").alias("sd"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("day") * F.col("y")).cast("bigint").alias("sdy"),
            F.sum(F.col("day") * F.col("day")).cast("bigint").alias("sdd"),
        )
    )
    test = d.filter(F.col("day") >= F.col("cutoff")).select(
        "event_type", "day", "y"
    )
    ols = (
        test.join(F.broadcast(train), "event_type")
        .selectExpr(
            "event_type",
            "day",
            "y",
            "'ols' AS method",
            "(CAST(sy AS DOUBLE) / n)"
            " + (CAST(n * sdy - sd * sy AS DOUBLE)"
            "    / CAST(n * sdd - sd * sd AS DOUBLE))"
            "   * (day - CAST(sd AS DOUBLE) / n) AS f",
        )
    )
    naive = (
        test.alias("t")
        .join(
            daily.select(
                F.col("event_type").alias("p_et"),
                (F.col("day") + 7).alias("p_day"),
                F.col("y").alias("p_y"),
            ),
            (F.col("t.event_type") == F.col("p_et"))
            & (F.col("t.day") == F.col("p_day")),
        )
        .select(
            "t.event_type",
            "t.day",
            "t.y",
            F.lit("seasonal_naive").alias("method"),
            F.col("p_y").cast("double").alias("f"),
        )
    )
    fc = ols.unionByName(naive)
    return fc.selectExpr(
        "event_type",
        "CAST(day AS BIGINT) AS day",
        "method",
        "y AS actual",
        "ROUND(f, 6) AS forecast",
        "ROUND(ABS(y - f), 6) AS abs_err",
        "ROUND(2 * ABS(y - f) / (ABS(CAST(y AS DOUBLE)) + ABS(f)), 6)"
        " AS smape_term",
    ).orderBy("event_type", "day", "method")


@register(
    "agg_chisq_independence",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST((epoch_us(ts) // {_DAY_US}) % 7 AS INTEGER) AS wd
      FROM events
    ),
    cell AS (SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS n_obs
             FROM v GROUP BY event_type, wd),
    rt AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS r
           FROM cell GROUP BY event_type),
    ct AS (SELECT wd, CAST(SUM(n_obs) AS BIGINT) AS c FROM cell GROUP BY wd),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
                   CAST(COUNT(DISTINCT wd) AS BIGINT) AS nc
            FROM cell),
    terms AS (
      SELECT cell.event_type, cell.wd, cell.n_obs,
             ROUND(CAST(rt.r AS DOUBLE) * ct.c / tot.n, 6) AS expected,
             ROUND((cell.n_obs - CAST(rt.r AS DOUBLE) * ct.c / tot.n)
                   * (cell.n_obs - CAST(rt.r AS DOUBLE) * ct.c / tot.n)
                   / (CAST(rt.r AS DOUBLE) * ct.c / tot.n), 6) AS chi2_term,
             (tot.nr - 1) * (tot.nc - 1) AS df
      FROM cell JOIN rt USING (event_type) JOIN ct USING (wd) CROSS JOIN tot
    ),
    total AS (
      SELECT CAST(SUM(CAST(FLOOR(chi2_term * 1e6) AS BIGINT)) AS DOUBLE)
               / 1e6 AS chi2_total
      FROM terms
    )
    SELECT t.event_type, t.wd, t.n_obs, t.expected, t.chi2_term,
           tl.chi2_total, CAST(t.df AS BIGINT) AS df
    FROM terms t CROSS JOIN total tl
    ORDER BY t.event_type, t.wd
    """,
)
def agg_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² test of independence on the event-type × day-of-week
    contingency table — is the traffic mix stable across the week? The
    corpus pass is one partially-aggregated groupBy to |types|·7 cells;
    row/column/grand totals re-aggregate the tiny cell table, expected
    counts r·c/N and each cell term are single identical double
    expressions (ROUND 1e-6), and the table χ² sums the FLOORED terms —
    an exact integer sum, immune to float association order (the
    dq_benford_digits convention, applied to independence rather than
    goodness-of-fit). Day-of-week is the epoch-day mod 7 class, the same
    integer on both engines (no locale-dependent DOW function)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"CAST((unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}) % 7 AS INT)").alias(
            "wd"
        ),
    )
    cell = ev.groupBy("event_type", "wd").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    cell = cell.localCheckpoint(eager=True)  # four consumers of a tiny table
    rt = cell.groupBy("event_type").agg(F.sum("n_obs").cast("bigint").alias("r"))
    ct = cell.groupBy("wd").agg(F.sum("n_obs").cast("bigint").alias("c"))
    tot = cell.agg(
        F.sum("n_obs").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("nr"),
        F.countDistinct("wd").cast("bigint").alias("nc"),
    )
    exp = F.col("r").cast("double") * F.col("c") / F.col("n")
    terms = (
        cell.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "wd")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "wd",
            "n_obs",
            F.round(exp, 6).alias("expected"),
            F.round((F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6).alias(
                "chi2_term"
            ),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("df"),
        )
    )
    total = terms.agg(
        (
            F.sum(F.floor(F.col("chi2_term") * 1e6).cast("long")).cast("double")
            / 1e6
        ).alias("chi2_total")
    )
    return (
        terms.crossJoin(F.broadcast(total))
        .select(
            "event_type", "wd", "n_obs", "expected", "chi2_term", "chi2_total", "df"
        )
        .orderBy("event_type", "wd")
    )
