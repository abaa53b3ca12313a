"""Round-8 operator batch 13: cumulative hazard, equivalence testing,
and word burstiness.

- ``agg_nelson_aalen`` — Nelson-Aalen cumulative-hazard curve on the
  agg_survival_km clock (signup→purchase with right-censoring): the
  estimator of choice when hazard RATES (not survival fractions) drive
  the decision, with the textbook variance alongside. KM multiplies
  survival factors; NA sums hazards — the two curves cross-check each
  other (exp(−H) ≈ S).
- ``agg_tost_equivalence`` — two-one-sided-tests (TOST) equivalence
  check between the odd- and even-user cohorts' event values: the test
  that can conclude "these arms are the SAME within ±δ" — a
  non-significant Welch t can never license that claim (absence of
  evidence is not evidence of absence).
- ``text_burstiness`` — per-word Fano factor (variance-to-mean ratio
  of per-document counts, Church & Gale '95): content words burst
  (appear many times in few docs), function/template words spread
  evenly — the signal that separates topical vocabulary from
  boilerplate beyond raw document frequency.

Determinism: hazard/variance terms are FLOOR(expr·10⁹) images of exact
integer day-censuses summed as integers; TOST reduces to the Welch
exact-decimal moment machinery with one identical double chain; the
Fano factor is a pure integer rational (D·Σc² − (Σc)²)/(D·Σc) until
one final division.

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
    "agg_nelson_aalen",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    signup AS (
      SELECT user_id, MIN(ts_us) AS t0 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    subj AS (
      SELECT s.user_id,
             CASE WHEN MIN(CASE WHEN e.event_type = 'purchase'
                                     AND e.ts_us > s.t0
                                THEN e.ts_us END) IS NOT NULL
                  THEN (MIN(CASE WHEN e.event_type = 'purchase'
                                      AND e.ts_us > s.t0
                                 THEN e.ts_us END) - s.t0) // {_DAY_US}
                  ELSE (MAX(e.ts_us) - s.t0) // {_DAY_US} END AS day,
             CASE WHEN MIN(CASE WHEN e.event_type = 'purchase'
                                     AND e.ts_us > s.t0
                                THEN e.ts_us END) IS NOT NULL
                  THEN 1 ELSE 0 END AS died
      FROM signup s JOIN ev e ON e.user_id = s.user_id
      GROUP BY s.user_id, s.t0
    ),
    per_day AS (
      SELECT day, CAST(SUM(died) AS BIGINT) AS n_death,
             CAST(SUM(1 - died) AS BIGINT) AS n_censored
      FROM subj GROUP BY day
    ),
    risk AS (
      SELECT day, n_death, n_censored,
             CAST((SELECT COUNT(*) FROM subj)
                  - COALESCE(SUM(n_death + n_censored)
                             OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                                   PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM per_day
    ),
    terms AS (
      SELECT day, n_risk, n_death, n_censored,
             CAST(FLOOR(CAST(n_death AS DOUBLE) * 1e9 / n_risk) AS BIGINT)
               AS h_img,
             CAST(FLOOR(CAST(n_death AS DOUBLE) * (n_risk - n_death)
                        / n_risk / n_risk / n_risk * 1e12) AS BIGINT)
               AS v_img
      FROM risk
    )
    SELECT CAST(day AS BIGINT) AS day, n_risk, n_death, n_censored,
           ROUND(SUM(h_img) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                 / 1e9, 6) AS cum_hazard,
           ROUND(SUM(v_img) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                 / 1e12, 6) AS cum_hazard_var
    FROM terms ORDER BY day
    """,
)
def agg_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = Σ_{{death days ≤ t}} d/n
    with the Klein variance Σ d(n−d)/n³ — the hazard-rate companion of
    agg_survival_km on the identical signup→purchase clock (same subject
    fold, same day census, so the two curves reconcile row for row).
    Per-day hazard and variance terms are FLOOR images (1e-9 / 1e-12) of
    IEEE-identical double chains over exact integer (d, n); the running
    sums are then INTEGER prefix sums over the bounded day table — no
    float fold order anywhere, unlike KM's log-space product which needs
    the ordered window fold."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
        .localCheckpoint(eager=True)  # user-grained; joined once below
    )
    subj = (
        ev.join(signup, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("t0").alias("t0"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") > F.col("t0")),
                    F.col("ts_us"),
                )
            ).alias("tp"),
            F.max("ts_us").alias("tl"),
        )
        .select(
            F.when(
                F.col("tp").isNotNull(), F.expr(f"(tp - t0) DIV {_DAY_US}")
            )
            .otherwise(F.expr(f"(tl - t0) DIV {_DAY_US}"))
            .alias("day"),
            F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("died"),
        )
    )
    per_day = (
        subj.groupBy("day")
        .agg(
            F.sum("died").cast("bigint").alias("n_death"),
            F.sum(1 - F.col("died")).cast("bigint").alias("n_censored"),
        )
        .coalesce(1)  # observation-window-sized; one partition for the walk
        .localCheckpoint(eager=True)  # totals + risk walk both consume it
    )
    n_subj = per_day.agg(
        F.sum(F.col("n_death") + F.col("n_censored")).cast("bigint").alias("n_subj")
    )
    w_prev = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_day.crossJoin(F.broadcast(n_subj)).withColumn(
        "n_risk",
        (
            F.col("n_subj")
            - F.coalesce(
                F.sum(F.col("n_death") + F.col("n_censored")).over(w_prev),
                F.lit(0),
            )
        ).cast("bigint"),
    )
    h_img = F.floor(
        F.col("n_death").cast("double") * 1e9 / F.col("n_risk")
    ).cast("bigint")
    v_img = F.floor(
        F.col("n_death").cast("double")
        * (F.col("n_risk") - F.col("n_death"))
        / F.col("n_risk")
        / F.col("n_risk")
        / F.col("n_risk")
        * 1e12
    ).cast("bigint")
    return risk.select(
        F.col("day").cast("bigint").alias("day"),
        "n_risk",
        "n_death",
        "n_censored",
        F.round(F.sum(h_img).over(w_cum) / 1e9, 6).alias("cum_hazard"),
        F.round(F.sum(v_img).over(w_cum) / 1e12, 6).alias("cum_hazard_var"),
    ).orderBy("day")


@register(
    "agg_tost_equivalence",
    oracle="""
    WITH v AS (
      SELECT user_id % 2 AS grp, CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    g AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(img AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(img AS DECIMAL(38,0)) * img) AS DECIMAL(38,0)) AS s2
      FROM v GROUP BY grp
    ),
    m AS (
      SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n0,
             MAX(CASE WHEN grp = 1 THEN n END) AS n1,
             MAX(CASE WHEN grp = 0 THEN CAST(s1 AS DOUBLE) END) AS a1,
             MAX(CASE WHEN grp = 1 THEN CAST(s1 AS DOUBLE) END) AS b1,
             MAX(CASE WHEN grp = 0 THEN CAST(s2 AS DOUBLE) END) AS a2,
             MAX(CASE WHEN grp = 1 THEN CAST(s2 AS DOUBLE) END) AS b2
      FROM g
    ),
    e AS (
      SELECT n0, n1,
             a1 / (n0 * 1e6) AS m0, b1 / (n1 * 1e6) AS m1,
             (CAST(n0 AS DOUBLE) * a2 - a1 * a1)
               / (CAST(n0 AS DOUBLE) * (n0 - 1) * 1e12) AS var0,
             (CAST(n1 AS DOUBLE) * b2 - b1 * b1)
               / (CAST(n1 AS DOUBLE) * (n1 - 1) * 1e12) AS var1,
             0.05 * (a1 + b1) / ((n0 + n1) * 1e6) AS margin
      FROM m
    )
    SELECT n0, n1, ROUND(m0, 6) AS mean_even, ROUND(m1, 6) AS mean_odd,
           ROUND(margin, 6) AS margin,
           ROUND((m1 - m0 + margin) / sqrt(var0 / n0 + var1 / n1), 6)
             AS t_lower,
           ROUND((m1 - m0 - margin) / sqrt(var0 / n0 + var1 / n1), 6)
             AS t_upper,
           CAST(CASE WHEN ROUND((m1 - m0 + margin)
                                / sqrt(var0 / n0 + var1 / n1), 6) > 1.644854
                          AND ROUND((m1 - m0 - margin)
                                / sqrt(var0 / n0 + var1 / n1), 6) < -1.644854
                     THEN 1 ELSE 0 END AS BIGINT) AS equivalent
    FROM e
    """,
)
def agg_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test between the odd- and even-user cohorts'
    event values with margin δ = 5% of the pooled mean: two one-sided
    Welch z-tests — H0a: diff ≤ −δ (reject when t_lower > 1.645) and
    H0b: diff ≥ δ (reject when t_upper < −1.645); rejecting BOTH
    concludes equivalence within ±δ at α=0.05. This is the launch
    gate "the cheap variant is no worse" actually needs — a
    non-significant agg_welch_ttest cannot license it.

    Machinery: the agg_welch_ttest exact decimal(38,0) micro-unit
    moments (Σx² of a 10⁷-row group overflows int64); both t statistics
    and the margin are one identical double chain per engine; the
    verdict compares the ROUNDed statistics against the literal
    quantile, so it cannot ulp-flip across engines."""
    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 2).cast("int").alias("grp"),
        F.floor(F.col("value") * 1e6).cast("long").alias("img"),
    )
    g = ev.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("img").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s1"),
        F.sum((F.col("img") * F.col("img")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    m = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 0, F.col("s1").cast("double"))).alias("a1"),
        F.max(F.when(F.col("grp") == 1, F.col("s1").cast("double"))).alias("b1"),
        F.max(F.when(F.col("grp") == 0, F.col("s2").cast("double"))).alias("a2"),
        F.max(F.when(F.col("grp") == 1, F.col("s2").cast("double"))).alias("b2"),
    )
    e = m.selectExpr(
        "n0",
        "n1",
        "a1 / (n0 * 1e6) AS m0",
        "b1 / (n1 * 1e6) AS m1",
        "(CAST(n0 AS DOUBLE) * a2 - a1 * a1)"
        " / (CAST(n0 AS DOUBLE) * (n0 - 1) * 1e12) AS var0",
        "(CAST(n1 AS DOUBLE) * b2 - b1 * b1)"
        " / (CAST(n1 AS DOUBLE) * (n1 - 1) * 1e12) AS var1",
        "0.05 * (a1 + b1) / ((n0 + n1) * 1e6) AS margin",
    )
    se = F.sqrt(F.col("var0") / F.col("n0") + F.col("var1") / F.col("n1"))
    t_lo = F.round((F.col("m1") - F.col("m0") + F.col("margin")) / se, 6)
    t_hi = F.round((F.col("m1") - F.col("m0") - F.col("margin")) / se, 6)
    return e.select(
        "n0",
        "n1",
        F.round("m0", 6).alias("mean_even"),
        F.round("m1", 6).alias("mean_odd"),
        F.round("margin", 6).alias("margin"),
        t_lo.alias("t_lower"),
        t_hi.alias("t_upper"),
        F.when((t_lo > 1.644854) & (t_hi < -1.644854), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("equivalent"),
    )


_BURST_TOPK = 20
_BURST_MIN_TF = 10


@register(
    "text_burstiness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    dw AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY doc_id, w),
    d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    ws AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS tf,
             CAST(SUM(c * c) AS BIGINT) AS tf2
      FROM dw GROUP BY w
    )
    SELECT w AS word, df, tf,
           ROUND((CAST(d.n_docs AS DOUBLE) * tf2 - CAST(tf AS DOUBLE) * tf)
                 / (CAST(d.n_docs AS DOUBLE) * tf), 6) AS fano
    FROM ws CROSS JOIN d
    WHERE tf >= {_BURST_MIN_TF}
    ORDER BY fano DESC, word ASC LIMIT {_BURST_TOPK}
    """,
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness as the Fano factor of per-document counts over
    ALL documents (zeros included): F = var/mean =
    (D·Σc² − (Σc)²)/(D·Σc) — F ≈ 1 is Poisson scatter (function words,
    templates), F ≫ 1 is bursty topical vocabulary (Church & Gale '95).
    Document frequency alone cannot make this distinction; burstiness
    is the standard second axis for stopword mining and
    boilerplate-phrase detection.

    Plan: one explode → (doc, word) counts with map-side combine → a
    vocabulary-sized groupBy carrying (df, Σc, Σc²) as exact int64; the
    Fano factor is a pure integer rational evaluated in ONE identical
    double expression, and the top-{_BURST_TOPK} cut is
    TakeOrderedAndProject on (fano DESC, word ASC) — no corpus-wide
    window, nothing driver-side. Σc² stays int64 to ~3·10⁹ occurrences
    of one word in one document-pair image (documented bound)."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    dw = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    d = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    ws = dw.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("tf"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("tf2"),
    )
    fano = F.round(
        (
            F.col("n_docs").cast("double") * F.col("tf2")
            - F.col("tf").cast("double") * F.col("tf")
        )
        / (F.col("n_docs").cast("double") * F.col("tf")),
        6,
    )
    return (
        ws.filter(F.col("tf") >= _BURST_MIN_TF)
        .crossJoin(F.broadcast(d))
        .select(F.col("w").alias("word"), "df", "tf", fano.alias("fano"))
        .orderBy(F.desc("fano"), F.asc("word"))
        .limit(_BURST_TOPK)
    )
