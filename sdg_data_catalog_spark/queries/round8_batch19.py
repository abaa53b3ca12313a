"""Round-8 operator batch 19: k-sample agreement tests and sequential
lexical diversity.

- ``agg_cochran_q`` — Cochran's Q over the THREE threshold classifiers
  (the agg_fleiss_kappa rater panel) on the same rows: "do the k
  classifiers have the same accuracy?" — the k-classifier
  generalization of McNemar that must be run BEFORE pairwise McNemars
  (the multiple-comparison discipline, model-eval edition).
- ``agg_friedman_test`` — Friedman's rank test with days as blocks and
  event types as treatments: "does the daily traffic ranking of event
  types stay stable?" — the repeated-measures nonparametric ANOVA,
  tie-corrected.
- ``text_mtld`` — MTLD lexical diversity (McCarthy-Jarvis 2010): the
  length-invariant successor of TTR, computed as a genuinely SEQUENTIAL
  per-document fold (factor count resets whenever the running TTR
  drops below 0.72) — text_ttr shrinks with document length by
  construction; MTLD is the number stylometry and quality filters
  actually compare across lengths.

Determinism: Q and the Friedman statistic are exact-integer dataflows
(doubled midrank images keep ties integral); the MTLD fold compares
100·|types| < 72·t in integers at every step and runs as the SAME
left-to-right lambda fold on both engines (Spark F.aggregate / DuckDB
list_reduce).

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_RATER = """CASE WHEN value < 100 + {s} THEN 'view'
            WHEN value < 200 + {s} THEN 'click'
            WHEN value < 300 + {s} THEN 'signup'
            WHEN value < 400 + {s} THEN 'purchase'
            ELSE 'error' END"""

_DAY_US = 86_400_000_000


@register(
    "agg_cochran_q",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN ({_RATER.format(s=0)}) = event_type THEN 1 ELSE 0 END
               AS c1,
             CASE WHEN ({_RATER.format(s=50)}) = event_type THEN 1 ELSE 0 END
               AS c2,
             CASE WHEN ({_RATER.format(s=-50)}) = event_type THEN 1 ELSE 0 END
               AS c3
      FROM events
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c1) AS BIGINT) AS g1,
             CAST(SUM(c2) AS BIGINT) AS g2,
             CAST(SUM(c3) AS BIGINT) AS g3,
             CAST(SUM(c1 + c2 + c3) AS BIGINT) AS sl,
             CAST(SUM((c1 + c2 + c3) * (c1 + c2 + c3)) AS BIGINT) AS sl2
      FROM scored
    )
    SELECT n, g1, g2, g3,
           ROUND(2.0 * (3.0 * (CAST(g1 AS DOUBLE) * g1
                               + CAST(g2 AS DOUBLE) * g2
                               + CAST(g3 AS DOUBLE) * g3)
                        - CAST(sl AS DOUBLE) * sl)
                 / (3.0 * sl - sl2), 6) AS q_stat
    FROM s
    """,
)
def agg_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q for the 3-classifier panel (threshold rule at shifts
    0/+50/−50) scored on the same rows: with G_j the per-classifier
    correct totals and L_i the per-row correct counts,
    Q = (k−1)·[k·ΣG_j² − (ΣG)²] / (k·ΣL − ΣL²) ~ χ²(k−1) under "all
    classifiers equally accurate". ONE corpus pass computes all three
    correctness bits and partial-aggregates the five sufficient sums —
    exact integers (ΣG² stays double-exact to ~9·10¹⁵, i.e. ~10⁸ rows;
    decimal beyond — documented), one final double expression, ROUND
    1e-6. Rows where all three agree (L=0 or k) cancel out of Q exactly
    as they do in McNemar's b/c cells."""
    ev = table(spark, sf_dir, "events")
    scored = ev.select(
        *[
            F.when(F.expr(_RATER.format(s=s)) == F.col("event_type"), 1)
            .otherwise(0)
            .alias(f"c{i}")
            for i, s in ((1, 0), (2, 50), (3, -50))
        ]
    )
    l_i = F.col("c1") + F.col("c2") + F.col("c3")
    s = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c1").cast("bigint").alias("g1"),
        F.sum("c2").cast("bigint").alias("g2"),
        F.sum("c3").cast("bigint").alias("g3"),
        F.sum(l_i).cast("bigint").alias("sl"),
        F.sum(l_i * l_i).cast("bigint").alias("sl2"),
    )
    gsq = (
        F.col("g1").cast("double") * F.col("g1")
        + F.col("g2").cast("double") * F.col("g2")
        + F.col("g3").cast("double") * F.col("g3")
    )
    q = (
        2.0
        * (3.0 * gsq - F.col("sl").cast("double") * F.col("sl"))
        / (3.0 * F.col("sl") - F.col("sl2"))
    )
    return s.select("n", "g1", "g2", "g3", F.round(q, 6).alias("q_stat"))


@register(
    "agg_friedman_test",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, day
    ),
    dense AS (
      SELECT t.event_type, d.day, COALESCE(x.y, 0) AS y
      FROM (SELECT DISTINCT event_type FROM daily) t
      CROSS JOIN (SELECT DISTINCT day FROM daily) d
      LEFT JOIN daily x
        ON x.event_type = t.event_type AND x.day = d.day
    ),
    ranked AS (
      SELECT event_type, day,
             CAST(2 * RANK() OVER (PARTITION BY day ORDER BY y)
                  + COUNT(*) OVER (PARTITION BY day, y) - 1 AS BIGINT)
               AS rank2
      FROM dense
    ),
    dims AS (
      SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
      FROM dense
    ),
    rj AS (
      SELECT event_type, CAST(SUM(rank2) AS BIGINT) AS r2j,
             CAST(SUM(CAST(rank2 AS HUGEINT) * rank2) AS DECIMAL(38,0))
               AS sq2
      FROM ranked GROUP BY event_type
    ),
    s AS (
      SELECT d.n, d.k,
             CAST(SUM(CAST(r.r2j - d.n * (d.k + 1) AS HUGEINT)
                      * (r.r2j - d.n * (d.k + 1))) AS DECIMAL(38,0)) AS num4,
             CAST(SUM(r.sq2) AS DECIMAL(38,0)) AS a2x4
      FROM rj r CROSS JOIN dims d GROUP BY d.n, d.k
    )
    SELECT n AS n_blocks, k AS k_treatments,
           ROUND((k - 1) * CAST(num4 AS DOUBLE)
                 / (CAST(a2x4 AS DOUBLE)
                    - CAST(n AS DOUBLE) * k * (k + 1) * (k + 1)), 6)
             AS friedman_chi2
    FROM s
    """,
)
def agg_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's test with days as blocks and event types as
    treatments, ranked within each day (midranks for ties), densified
    so absent (type, day) cells rank as zero-count days:
    χ²_F = (k−1)·Σ_j (R_j − n(k+1)/2)² / (A₂ − n·k(k+1)²/4), the
    tie-general form. Midranks ride DOUBLED integer images
    (rank2 = 2·min-rank + ties − 1), so R_j sums, the centered squares,
    and A₂ are all exact integers/decimals; the statistic is one double
    expression. The within-day window ranks k=|types| rows per
    partition — bounded by the treatment count, never by corpus rows —
    and the day census is the only corpus-proportional pass."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = (
        ev.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)  # types + days + dense join consume it
    )
    types = daily.select("event_type").distinct()
    days = daily.select("day").distinct()
    dense = (
        types.crossJoin(days)
        .join(daily, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce("y", F.lit(0)).alias("y")
        )
    )
    w_rank = Window.partitionBy("day").orderBy("y")
    w_tie = Window.partitionBy("day", "y")
    ranked = dense.select(
        "event_type",
        (
            2 * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - 1
        )
        .cast("bigint")
        .alias("rank2"),
    )
    dims = dense.agg(
        F.countDistinct("day").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("k"),
    )
    rj = ranked.groupBy("event_type").agg(
        F.sum("rank2").cast("bigint").alias("r2j"),
        F.sum((F.col("rank2") * F.col("rank2")).cast("decimal(38,0)")).alias(
            "sq2"
        ),
    )
    s = (
        rj.crossJoin(F.broadcast(dims))
        .groupBy("n", "k")
        .agg(
            F.sum(
                (
                    (F.col("r2j") - F.col("n") * (F.col("k") + 1)).cast(
                        "decimal(19,0)"
                    )
                    * (F.col("r2j") - F.col("n") * (F.col("k") + 1))
                ).cast("decimal(38,0)")
            ).alias("num4"),
            F.sum("sq2").cast("decimal(38,0)").alias("a2x4"),
        )
    )
    chi2 = (
        (F.col("k") - 1)
        * F.col("num4").cast("double")
        / (
            F.col("a2x4").cast("double")
            - F.col("n").cast("double")
            * F.col("k")
            * (F.col("k") + 1)
            * (F.col("k") + 1)
        )
    )
    return s.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.round(chi2, 6).alias("friedman_chi2"),
    )


_MTLD_THRESHOLD_PCT = 72  # factor completes when 100*|types| < 72*tokens


@register(
    "text_mtld",
    oracle=f"""
    WITH RECURSIVE tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents WHERE doc_id % 20 = 0
    ),
    tw AS (
      SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
      FROM tok
    ),
    -- the fold replays as a RECURSIVE CTE, one token per level, all docs
    -- in lockstep (the ts_holt_linear convention). DuckDB's list_reduce
    -- was tried first and CORRUPTS accumulator state under vectorized
    -- evaluation (same SQL, different answers single-row vs batched), so
    -- the recursion is the trustworthy sequential-fold oracle. The
    -- seen-types set is a space-delimited string + explicit count; space
    -- cannot occur inside a space-split token.
    fold(doc_id, i, n, t, k, s, f) AS (
      SELECT doc_id, 0, len(ws), 0, 0, ' ', 0
      FROM tok WHERE len(ws) > 0
      UNION ALL
      SELECT fo.doc_id, fo.i + 1, fo.n,
             CASE WHEN 100 * (fo.k + CASE WHEN strpos(fo.s, ' ' || tw.w || ' ')
                                               > 0
                                          THEN 0 ELSE 1 END)
                       < {_MTLD_THRESHOLD_PCT} * (fo.t + 1)
                  THEN 0 ELSE fo.t + 1 END,
             CASE WHEN 100 * (fo.k + CASE WHEN strpos(fo.s, ' ' || tw.w || ' ')
                                               > 0
                                          THEN 0 ELSE 1 END)
                       < {_MTLD_THRESHOLD_PCT} * (fo.t + 1)
                  THEN 0
                  ELSE fo.k + CASE WHEN strpos(fo.s, ' ' || tw.w || ' ') > 0
                                   THEN 0 ELSE 1 END END,
             CASE WHEN 100 * (fo.k + CASE WHEN strpos(fo.s, ' ' || tw.w || ' ')
                                               > 0
                                          THEN 0 ELSE 1 END)
                       < {_MTLD_THRESHOLD_PCT} * (fo.t + 1)
                  THEN ' '
                  WHEN strpos(fo.s, ' ' || tw.w || ' ') > 0 THEN fo.s
                  ELSE fo.s || tw.w || ' ' END,
             CASE WHEN 100 * (fo.k + CASE WHEN strpos(fo.s, ' ' || tw.w || ' ')
                                               > 0
                                          THEN 0 ELSE 1 END)
                       < {_MTLD_THRESHOLD_PCT} * (fo.t + 1)
                  THEN fo.f + 1 ELSE fo.f END
      FROM fold fo JOIN tw ON tw.doc_id = fo.doc_id AND tw.i = fo.i + 1
      WHERE fo.i < fo.n
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(f AS BIGINT) AS full_factors,
           ROUND(CASE
             WHEN t = 0
             THEN CAST(n AS DOUBLE) / GREATEST(f, 1)
             WHEN f + (1.0 - CAST(k AS DOUBLE) / GREATEST(t, 1))
                      / (1.0 - {_MTLD_THRESHOLD_PCT} / 100.0) <= 0.0
             THEN 0.0
             ELSE CAST(n AS DOUBLE)
                  / (f + (1.0 - CAST(k AS DOUBLE) / GREATEST(t, 1))
                         / (1.0 - {_MTLD_THRESHOLD_PCT} / 100.0))
             END, 6) AS mtld
    FROM fold WHERE i = n ORDER BY doc_id
    """,
)
def text_mtld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTLD lexical diversity per document (forward pass, threshold
    0.72): walk the token stream keeping a running (tokens, types) for
    the current factor; when TTR drops below 0.72 the factor completes
    and the state resets; MTLD = n_tokens / (factors + partial), the
    partial being (1−TTR)/(1−0.72) of the trailing remnant. TTR
    comparisons are integer cross-multiplications (100·|types| <
    72·tokens) at every step; Spark runs the left-to-right F.aggregate
    lambda fold and the oracle replays the identical fold as a
    recursive CTE, one token per level (DuckDB's list_reduce was tried
    and CORRUPTS accumulator state under vectorized evaluation — same
    SQL, different answers single-row vs batched — so the recursion is
    the trustworthy sequential twin). The statistic is genuinely
    sequential per document yet embarrassingly parallel ACROSS
    documents (no shuffle at all; the doc_id % 20 slice bounds the
    driver comparison, as in text_ttr).
    Unlike TTR, MTLD is document-length-invariant — the number quality
    filters can threshold without a length confound."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    ws = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    # seen-types set as a space-delimited string + explicit count — the
    # SAME encoding as the DuckDB fold (whose list_reduce corrupts
    # list-typed accumulator fields); space cannot occur in a
    # space-split token, so membership via contains() is exact
    acc0 = F.struct(
        F.lit(0).alias("t"),
        F.lit(0).alias("k"),
        F.lit(" ").alias("s"),
        F.lit(0).alias("f"),
    )

    def step(acc, w):
        probe = F.concat(F.lit(" "), w, F.lit(" "))
        seen = F.contains(acc["s"], probe)
        new_k = acc["k"] + F.when(seen, 0).otherwise(1)
        completes = new_k * 100 < _MTLD_THRESHOLD_PCT * (acc["t"] + 1)
        return F.when(
            completes,
            F.struct(
                F.lit(0).alias("t"),
                F.lit(0).alias("k"),
                F.lit(" ").alias("s"),
                (acc["f"] + 1).alias("f"),
            ),
        ).otherwise(
            F.struct(
                (acc["t"] + 1).alias("t"),
                new_k.alias("k"),
                F.when(seen, acc["s"])
                .otherwise(F.concat(acc["s"], w, F.lit(" ")))
                .alias("s"),
                acc["f"].alias("f"),
            )
        )

    folded = docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("n_tokens"),
        F.aggregate(ws, acc0, step).alias("st"),
    ).filter(F.col("n_tokens") > 0)
    nt = F.col("n_tokens").cast("double")
    # greatest(,1) guards keep ANSI division total even in branches the
    # CASE never takes (Spark's subexpression elimination can evaluate a
    # guarded divide eagerly); the CASE semantics are unchanged
    partial = (
        1.0
        - F.col("st.k").cast("double") / F.greatest(F.col("st.t"), F.lit(1))
    ) / (1.0 - _MTLD_THRESHOLD_PCT / 100.0)
    denom = F.col("st.f") + partial
    # denom == 0 is REAL: a doc whose TTR never dips below the threshold
    # (f = 0, trailing TTR = 1) has undefined MTLD — emitted as 0.0
    mtld = (
        F.when(F.col("st.t") == 0, nt / F.greatest(F.col("st.f"), F.lit(1)))
        .when(denom <= 0.0, F.lit(0.0))
        .otherwise(nt / denom)
    )
    return folded.select(
        "doc_id",
        "n_tokens",
        F.col("st.f").cast("bigint").alias("full_factors"),
        F.round(mtld, 6).alias("mtld"),
    ).orderBy("doc_id")
