"""Round-8 operator batch 9: the remaining classical hypothesis tests.

- ``agg_kruskal_wallis`` — the k-group generalization of Mann-Whitney:
  one tie-corrected H statistic over ALL event-type groups at once (the
  omnibus "do any of these cohorts differ?" gate run before pairwise
  rank tests).
- ``agg_logrank_test`` — the standard two-cohort survival-curve
  comparison (Mantel-Haenszel log-rank) on the agg_survival_km
  signup→purchase clock, cohorts split by the odd/even-user natural
  experiment the DiD op uses.
- ``agg_mcnemar_test`` — paired classifier comparison on the SAME eval
  rows: the threshold classifier (agg_prf's rule) vs a shifted-threshold
  variant, scored by the b/c discordant cells. The test model evals
  actually need when two models share an eval set (a two-proportion test
  there is wrong — the pairing must be used).

Determinism: all three reduce to exact integer counts; the only float
work is (a) IEEE-identical scalar expressions evaluated on int64 inputs
on both engines and (b) final statistics ROUNDed/FLOORed at 1e-6.
Kruskal-Wallis rank sums ride the agg_mann_whitney two-phase
running-total machinery — no corpus-wide ORDER BY window anywhere.

Reference analog: none direct — SURVEY §2.11 north-star surface
(the reference's evaluation module stops at accuracy/PRF counts,
sdg-ai/sdg_data_catalog utils/metrics.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000


@register(
    "agg_kruskal_wallis",
    oracle="""
    WITH v AS (
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
    terms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(FLOOR(CAST(r2 AS DOUBLE) / n1 * r2) AS BIGINT))
                  AS BIGINT) AS s
      FROM g
    )
    SELECT a.n, t.k,
           ROUND(3.0 * t.s / (CAST(a.n AS DOUBLE) * (a.n + 1)) - 3.0 * (a.n + 1),
                 6) AS h,
           ROUND((3.0 * t.s / (CAST(a.n AS DOUBLE) * (a.n + 1)) - 3.0 * (a.n + 1))
                 / (1.0 - CAST(a.ties AS DOUBLE)
                          / (CAST(a.n AS DOUBLE) * a.n * a.n - a.n)),
                 6) AS h_tie_corrected
    FROM n_all a CROSS JOIN terms t
    """,
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H over the event-type groups' value distributions —
    the omnibus k-group rank test (the nonparametric ANOVA): with R_j the
    rank sum of group j over the pooled ranking,
    H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1), tie-corrected by
    C = 1 − Σ(t³−t)/(N³−N). Identical machinery to agg_mann_whitney:
    average ranks never materialize per row — the distinct-value table
    carries (prefix, tot) from ONE two-phase running total and
    2R_j = Σ cnt·(2·prefix+t+1) stays an exact int64.

    The per-group quadratic term rides an IEEE-identical double chain:
    FLOOR(double(2R_j)/n_j · 2R_j) — both engines evaluate the same two
    roundings on the same int64 inputs, so the floored term is
    bit-identical (2R_j ≤ N(N+1) must stay under 2^53 for the int64→
    double cast to be exact: holds to N ≈ 9·10⁷ rows; past that switch
    the term to decimal — documented, not silent). Σ(t³−t) accumulates in
    decimal(38,0) exactly as MWU does. H = 3·S/(N(N+1)) − 3(N+1) because
    S sums (2R_j)²/n_j = 4·R_j²/n_j."""
    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1e6).cast("long").alias("img")
    )
    from pyspark import StorageLevel

    pv = (
        ev.groupBy("img", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # distinct-value-grained; value totals AND the rank-sum join consume it
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
    terms = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.floor(F.col("r2").cast("double") / F.col("n1") * F.col("r2")).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("s"),
    )
    h = 3.0 * F.col("s") / (F.col("n").cast("double") * (F.col("n") + 1)) - 3.0 * (
        F.col("n") + 1
    )
    tie_c = 1.0 - F.col("ties").cast("double") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return (
        n_all.crossJoin(F.broadcast(terms))
        .select(
            "n",
            "k",
            F.round(h, 6).alias("h"),
            F.round(h / tie_c, 6).alias("h_tie_corrected"),
        )
    )


@register(
    "agg_logrank_test",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    signup AS (
      SELECT user_id, MIN(ts_us) AS t0 FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    subj AS (
      SELECT s.user_id, s.user_id % 2 AS grp,
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
      SELECT day,
             CAST(SUM(CASE WHEN grp = 1 THEN died ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(died) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS out1,
             CAST(COUNT(*) AS BIGINT) AS outt
      FROM subj GROUP BY day
    ),
    risk AS (
      SELECT day, d1, d,
             CAST((SELECT SUM(out1) FROM per_day)
                  - COALESCE(SUM(out1) OVER (ORDER BY day ROWS BETWEEN
                             UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n1,
             CAST((SELECT SUM(outt) FROM per_day)
                  - COALESCE(SUM(outt) OVER (ORDER BY day ROWS BETWEEN
                             UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n
      FROM per_day
    ),
    s AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS o1,
             CAST(SUM(CASE WHEN d > 0 THEN CAST(FLOOR(
                   CAST(d * n1 AS DOUBLE) * 1e6 / n) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS e1_micro,
             CAST(SUM(CASE WHEN d > 0 AND n > 1 THEN CAST(FLOOR(
                   CAST(d AS DOUBLE) * n1 / n * (n - n1) / n
                   * (n - d) / (n - 1) * 1e6) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS v_micro
      FROM risk
    )
    SELECT o1, ROUND(e1_micro / 1e6, 6) AS e1, ROUND(v_micro / 1e6, 6) AS v,
           ROUND((o1 - e1_micro / 1e6) / sqrt(v_micro / 1e6), 6) AS z,
           ROUND((o1 - e1_micro / 1e6) * (o1 - e1_micro / 1e6)
                 / (v_micro / 1e6), 6) AS chi2
    FROM s
    """,
)
def agg_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel log-rank test between the odd-user and even-user
    cohorts' signup→purchase survival curves (the agg_survival_km clock,
    the agg_diff_in_diff natural experiment): at each death day,
    E[d₁] = d·n₁/n under H₀ and V = d·(n₁/n)(1−n₁/n)(n−d)/(n−1);
    z = (O₁−E₁)/√V. THE standard "did the treatment arm convert faster?"
    test — comparing two KM curves by eyeballing them is not a test.

    Plan shape: the corpus folds to one row per user (one join + one
    conditional aggregate — the fused agg_survival_km form), then to one
    row per DAY carrying per-cohort death/exit counts; at-risk counts
    come from prefix sums over that bounded day table (coalesce(1), an
    observation-window-sized single partition). Per-day E/V terms are
    FLOOR(expr·1e6) of IEEE-identical double chains on exact int64
    inputs, summed as integers — no float-association-order dependence
    survives. d·n₁ stays int64 to N ≈ 3·10⁹ subjects (documented
    bound)."""
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
            (F.col("user_id") % 2).cast("int").alias("grp"),
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
            F.sum(F.when(F.col("grp") == 1, F.col("died")).otherwise(0))
            .cast("bigint")
            .alias("d1"),
            F.sum("died").cast("bigint").alias("d"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("out1"),
            F.count(F.lit(1)).cast("bigint").alias("outt"),
        )
        .coalesce(1)  # observation-window-sized; one partition for the walk
        .localCheckpoint(eager=True)  # totals + the risk walk both consume it
    )
    tot = per_day.agg(
        F.sum("out1").cast("bigint").alias("n1_all"),
        F.sum("outt").cast("bigint").alias("n_all"),
    )
    w_prev = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = per_day.crossJoin(F.broadcast(tot)).select(
        "day",
        "d1",
        "d",
        (
            F.col("n1_all")
            - F.coalesce(F.sum("out1").over(w_prev), F.lit(0))
        )
        .cast("bigint")
        .alias("n1"),
        (
            F.col("n_all")
            - F.coalesce(F.sum("outt").over(w_prev), F.lit(0))
        )
        .cast("bigint")
        .alias("n"),
    )
    e1_term = F.when(
        F.col("d") > 0,
        F.floor(
            (F.col("d") * F.col("n1")).cast("double") * 1e6 / F.col("n")
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    v_term = F.when(
        (F.col("d") > 0) & (F.col("n") > 1),
        F.floor(
            F.col("d").cast("double")
            * F.col("n1")
            / F.col("n")
            * (F.col("n") - F.col("n1"))
            / F.col("n")
            * (F.col("n") - F.col("d"))
            / (F.col("n") - 1)
            * 1e6
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    s = risk.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum(e1_term).cast("bigint").alias("e1_micro"),
        F.sum(v_term).cast("bigint").alias("v_micro"),
    )
    diff = F.col("o1") - F.col("e1_micro") / 1e6
    return s.select(
        "o1",
        F.round(F.col("e1_micro") / 1e6, 6).alias("e1"),
        F.round(F.col("v_micro") / 1e6, 6).alias("v"),
        F.round(diff / F.sqrt(F.col("v_micro") / 1e6), 6).alias("z"),
        F.round(diff * diff / (F.col("v_micro") / 1e6), 6).alias("chi2"),
    )


_PRED_A = """CASE WHEN value < 100 THEN 'view' WHEN value < 200 THEN 'click'
             WHEN value < 300 THEN 'signup' WHEN value < 400 THEN 'purchase'
             ELSE 'error' END"""
_PRED_B = """CASE WHEN value < 150 THEN 'view' WHEN value < 250 THEN 'click'
             WHEN value < 350 THEN 'signup' WHEN value < 450 THEN 'purchase'
             ELSE 'error' END"""


@register(
    "agg_mcnemar_test",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN ({_PRED_A}) = event_type THEN 1 ELSE 0 END AS ca,
             CASE WHEN ({_PRED_B}) = event_type THEN 1 ELSE 0 END AS cb
      FROM events
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ca * (1 - cb)) AS BIGINT) AS b,
             CAST(SUM((1 - ca) * cb) AS BIGINT) AS c
      FROM scored
    )
    SELECT n, b, c,
           CASE WHEN b + c = 0 THEN 0.0
                ELSE ROUND(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
                           / (b + c), 6) END AS chi2_mcnemar
    FROM s
    """,
)
def agg_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (continuity-corrected) comparing two classifiers on
    the SAME eval rows: classifier A = the agg_prf threshold rule,
    classifier B = a 50-unit-shifted variant. Only the DISCORDANT cells
    matter — b = A-right/B-wrong, c = A-wrong/B-right — and
    χ² = (|b−c|−1)²/(b+c): the paired test two models sharing one eval
    set require (an unpaired two-proportion z-test double-counts the
    rows both get right and is anticonservative).

    ONE corpus pass computes both predictions and both correctness
    bits per row and partial-aggregates the three counts map-side;
    everything is exact integers until the single final division."""
    ev = table(spark, sf_dir, "events")
    scored = ev.select(
        F.when(F.expr(_PRED_A) == F.col("event_type"), 1).otherwise(0).alias("ca"),
        F.when(F.expr(_PRED_B) == F.col("event_type"), 1).otherwise(0).alias("cb"),
    )
    s = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("ca") * (1 - F.col("cb"))).cast("bigint").alias("b"),
        F.sum((1 - F.col("ca")) * F.col("cb")).cast("bigint").alias("c"),
    )
    absdiff = F.abs(F.col("b") - F.col("c"))
    return s.select(
        "n",
        "b",
        "c",
        F.when(F.col("b") + F.col("c") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                ((absdiff - 1) * (absdiff - 1)).cast("double")
                / (F.col("b") + F.col("c")),
                6,
            )
        )
        .alias("chi2_mcnemar"),
    )
