"""Round-7 batch 10: the rest of the experimentation stack.

- ``agg_cuped_adjust`` — CUPED variance reduction (Deng et al., WSDM'13):
  per-user pre-period activity is the control covariate; the adjusted
  post-period metric Y' = Y − θ·(X − X̄) shrinks variance by the squared
  pre/post correlation, tightening every A/B readout at zero cost. θ and
  the variance-reduction ratio come from EXACT integer/decimal moments.
- ``dq_srm_check`` — sample-ratio-mismatch guardrail: the 2-cell χ²
  of observed treatment/control user counts against the designed 50/50
  split — the first thing a trustworthy experimentation platform checks
  before anyone reads a metric.

Together with agg_welch_ttest (t), agg_mann_whitney (nonparametric),
agg_diff_in_diff (causal), and agg_split_balance_chi2, this completes
the experiment-analysis surface.

Determinism: all per-user sums are micro-unit integers; cross moments
accumulate in decimal(38,0); θ, variance ratios, and χ² are single
identical double expressions ROUNDed at fixed precision.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000


@register(
    "agg_cuped_adjust",
    oracle=f"""
    WITH v AS (
      SELECT user_id, CAST(user_id % 2 AS INTEGER) AS treat,
             epoch_us(ts) // {_DAY_US} AS day,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    cut AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS cutoff FROM v),
    per_user AS (
      SELECT v.user_id, MAX(v.treat) AS treat,
             CAST(SUM(CASE WHEN v.day < c.cutoff THEN v.img ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(SUM(CASE WHEN v.day >= c.cutoff THEN v.img ELSE 0 END)
                  AS BIGINT) AS y
      FROM v CROSS JOIN cut c GROUP BY v.user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DECIMAL(38, 0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38, 0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38, 0)) * y) AS DECIMAL(38, 0))
               AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38, 0)) * x) AS DECIMAL(38, 0))
               AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38, 0)) * y) AS DECIMAL(38, 0))
               AS syy
      FROM per_user
    ),
    th AS (
      SELECT n,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
             CAST(sx AS DOUBLE) / n AS xbar,
             ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho2
      FROM mom
    ),
    g AS (
      SELECT treat, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(y) AS DECIMAL(38, 0)) AS gy,
             CAST(SUM(x) AS DECIMAL(38, 0)) AS gx
      FROM per_user GROUP BY treat
    )
    SELECT g.treat, g.n_users,
           ROUND(CAST(g.gy AS DOUBLE) / (g.n_users * 1e6), 6) AS mean_post,
           ROUND((CAST(g.gy AS DOUBLE)
                  - t.theta * (CAST(g.gx AS DOUBLE) - g.n_users * t.xbar))
                 / (g.n_users * 1e6), 6) AS mean_cuped,
           ROUND(t.theta, 6) AS theta,
           ROUND(1.0 - t.rho2, 6) AS var_ratio
    FROM g CROSS JOIN th t ORDER BY g.treat
    """,
)
def agg_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the odd-user experiment: per-user
    pre-period value (first half of the window) is the covariate X,
    post-period value is the metric Y, θ = cov(X,Y)/var(X) fit on ALL
    users (the standard pooled-θ CUPED), and each arm reports its raw
    and adjusted means plus the theoretical variance ratio 1 − ρ².
    Every moment — ΣX, ΣY, ΣXY, ΣX², ΣY² — is an exact decimal(38,0)
    integer (per-user micro-unit sums reach ~10¹⁰, products ~10²⁰); θ,
    ρ², and the adjusted means (via the algebraic identity
    Σ(y − θ(x − x̄)) = Σy − θ(Σx − n·x̄), never a per-row float sum) are
    single identical double expressions.
    Plan shape: one corpus pass folds events to user grain, the 1-row
    moment table broadcasts back, and the per-arm rollup partially
    aggregates — three tiny joins on top of one scan."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("treat"),
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
        F.floor(F.col("value") * 1e6).cast("long").alias("img"),
    )
    cut = ev.agg(F.expr("(MIN(day) + MAX(day) + 1) DIV 2").alias("cutoff"))
    per_user = (
        ev.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.max("treat").alias("treat"),
            F.sum(F.when(F.col("day") < F.col("cutoff"), F.col("img")).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("day") >= F.col("cutoff"), F.col("img")).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
        .localCheckpoint(eager=True)  # user-grained; moments + arms consume it
    )
    mom = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    th = mom.selectExpr(
        "n",
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta",
        "CAST(sx AS DOUBLE) / n AS xbar",
        "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        "    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
        " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        "     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        "    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        "       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rho2",
    )
    g = per_user.groupBy("treat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("y").cast("decimal(38,0)").alias("gy"),
        F.sum("x").cast("decimal(38,0)").alias("gx"),
    )
    # Σ(y − θ(x − x̄)) ≡ Σy − θ(Σx − n·x̄): the adjusted mean comes from
    # EXACT group sums in one double expression — a per-row float sum
    # would be association-order-dependent across engines
    return g.crossJoin(F.broadcast(th)).selectExpr(
        "treat",
        "n_users",
        "ROUND(CAST(gy AS DOUBLE) / (n_users * 1e6), 6) AS mean_post",
        "ROUND((CAST(gy AS DOUBLE)"
        " - theta * (CAST(gx AS DOUBLE) - n_users * xbar))"
        " / (n_users * 1e6), 6) AS mean_cuped",
        "ROUND(theta, 6) AS theta",
        "ROUND(1.0 - rho2, 6) AS var_ratio",
    ).orderBy("treat")


@register(
    "dq_srm_check",
    oracle="""
    WITH u AS (
      SELECT DISTINCT user_id, CAST(user_id % 2 AS INTEGER) AS treat
      FROM events
    ),
    c AS (SELECT treat, CAST(COUNT(*) AS BIGINT) AS n_users
          FROM u GROUP BY treat),
    t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n FROM c)
    SELECT c.treat, c.n_users,
           CAST(t.n AS DOUBLE) / 2 AS expected,
           ROUND((c.n_users - CAST(t.n AS DOUBLE) / 2)
                 * (c.n_users - CAST(t.n AS DOUBLE) / 2)
                 / (CAST(t.n AS DOUBLE) / 2), 6) AS chi2_term,
           (4 * c.n_users * c.n_users - 4 * c.n_users * t.n + t.n * t.n)
             * 100 > 384 * t.n AS srm_flag
    FROM c CROSS JOIN t ORDER BY c.treat
    """,
)
def dq_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: distinct users per arm vs the
    designed 50/50 split, with per-arm χ² terms and a boolean flag that
    fires when the 1-dof χ² statistic exceeds 3.84 (p < 0.05) — the
    first gate a trustworthy experimentation platform applies before any
    metric is read. The flag comparison is PURE INTEGER cross-
    multiplication: χ² = (2·nᵢ − N)²/N per arm, so the α = 0.05 test
    `χ² > 3.84` becomes `(4nᵢ² − 4nᵢN + N²)·100 > 384·N` — no float
    enters the verdict. One distinct-users pass, two tiny aggregates."""
    u = (
        table(spark, sf_dir, "events")
        .select("user_id", (F.col("user_id") % 2).cast("int").alias("treat"))
        .distinct()
    )
    c = (
        u.groupBy("treat")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .localCheckpoint(eager=True)  # 2 rows; total + output consume it
    )
    t = c.agg(F.sum("n_users").cast("bigint").alias("n"))
    return (
        c.crossJoin(F.broadcast(t))
        .selectExpr(
            "treat",
            "n_users",
            "CAST(n AS DOUBLE) / 2 AS expected",
            "ROUND((n_users - CAST(n AS DOUBLE) / 2)"
            " * (n_users - CAST(n AS DOUBLE) / 2)"
            " / (CAST(n AS DOUBLE) / 2), 6) AS chi2_term",
            "(4 * n_users * n_users - 4 * n_users * n + n * n)"
            " * 100 > 384 * n AS srm_flag",
        )
        .orderBy("treat")
    )
