"""Round-10 operator batch 14: leave-one-source-out influence, A/B
power analysis, and RFM segmentation.

- ``curation_loo_influence`` — data-valuation proxy (leave-one-out at
  the SOURCE grain): how much does each source contribute to the
  unigram-LM likelihood of a fixed probe set? The LOO model for source
  s is the global count table MINUS s's counts — complement-by-
  subtraction, so all 20 LOO models come from ONE (word, source) census
  and never retrain. Per-token FLOOR(10⁶·ln) images sum exactly;
  influence_s = base − LOO_s (positive ⇒ the source improves probe
  likelihood). The cheap stand-in for Data-Shapley-style valuation
  that a curation pipeline can actually afford at corpus scale.
- ``agg_power_analysis`` — the experiment-sizing step: per event type,
  the per-arm sample size needed for 80% power to detect a 2% lift of
  the mean at α = 5%, n = 2σ²(z_crit+z_power)²/δ², from exact
  decimal(38,0) micro-unit moments. The requirement surfaces as a
  FLOOR(10⁶·n) image and the integer ceiling is DERIVED FROM the image
  (img DIV 10⁶ + sign(img mod 10⁶)) — so the reported whole number
  cannot ulp-flip. Completes the experimentation stack (welch / MWU /
  CUPED / SRM / TOST) with the before-the-test calculator.
- ``win_rfm_scores`` — classic RFM segmentation: per user recency
  (days since last purchase vs the corpus watermark), frequency
  (purchase count), monetary (exact micro sum); each dimension ranked
  globally via the two-phase running_total on a unique packed key and
  cut into quintiles with integer arithmetic (5·(r−1)) DIV n; output
  is the bounded 5×5×5 segment census.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_PROBE_MOD = 97
_DAY_US = 86_400_000_000
# FLOOR(1e6·(z_0.025 + z_0.2)) with z values written as literals so both
# engines share the same constant: 1.959964 + 0.841621 = 2.801585
_Z_SUM_SQ_X1E12 = int(2.801585**2 * 1e12)  # computed once in Python


@register(
    "curation_loo_influence",
    oracle=f"""
    WITH w AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    sw AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
        FROM w GROUP BY source, word
    ),
    gw0 AS (SELECT word, CAST(SUM(c) AS BIGINT) AS g FROM sw GROUP BY word),
    -- totals ride as whole-table windows: cross-joining an aggregate CTE
    -- into a row stream de-optimizes to per-row re-evaluation in DuckDB
    -- (the eval_auc_delong lesson, measured 181 s vs 0.2 s)
    gw AS (SELECT word, g,
                  CAST(SUM(g) OVER () AS BIGINT) AS n,
                  CAST(COUNT(*) OVER () AS BIGINT) AS v
           FROM gw0),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM sw GROUP BY source),
    probe AS (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents WHERE doc_id % {_PROBE_MOD} = 0
    ),
    sources AS (SELECT DISTINCT source FROM sw),
    expanded AS (
        SELECT p.word, s.source,
               COALESCE(sw.c, 0) AS c
        FROM probe p
        CROSS JOIN sources s
        LEFT JOIN sw ON sw.word = p.word AND sw.source = s.source
    ),
    loo AS (
        SELECT e.source,
               CAST(COUNT(*) AS BIGINT) AS n_probe_tokens,
               CAST(SUM(CAST(FLOOR(1000000 * ln(
                   (CAST(gw.g - e.c AS DOUBLE) + 1)
                   / (gw.n - st.ns + gw.v))) AS BIGINT)) AS BIGINT)
                 AS loo_logp_x1e6
        FROM expanded e
        JOIN gw ON gw.word = e.word
        JOIN st ON st.source = e.source
        GROUP BY e.source
    ),
    base AS (
        SELECT CAST(SUM(CAST(FLOOR(1000000 * ln(
                   (CAST(gw.g AS DOUBLE) + 1) / (gw.n + gw.v)))
                 AS BIGINT)) AS BIGINT) AS base_logp_x1e6
        FROM probe p JOIN gw ON gw.word = p.word
    )
    SELECT loo.source, loo.n_probe_tokens, loo.loo_logp_x1e6,
           CAST(base.base_logp_x1e6 - loo.loo_logp_x1e6 AS BIGINT)
             AS influence_x1e6
    FROM loo, base
    ORDER BY loo.source
    """,
)
def curation_loo_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out likelihood influence: every LOO unigram
    model derives from ONE (word, source) census by subtraction
    (g(w) − c(w,s), N − N_s) — 20 data-valuation numbers for the price
    of one corpus pass plus a probe×20 expansion (the probe is the
    fixed 1/97 doc_id sample, so the expansion is sample-sized at any
    corpus scale). Per-token FLOOR(10⁶·ln) images sum exactly; the
    smoothing vocabulary V is held at the global value for every model
    (documented choice — LOO changes counts, not the support).
    influence_s = base − LOO_s: positive means the probe set is more
    likely WITH the source in the corpus."""
    docs = table(spark, sf_dir, "documents")
    sw = (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)
    )
    gw = sw.groupBy("word").agg(F.sum("c").cast("bigint").alias("g"))
    st = sw.groupBy("source").agg(F.sum("c").cast("bigint").alias("ns"))
    tot = gw.agg(
        F.sum("g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    probe = docs.filter(F.col("doc_id") % _PROBE_MOD == 0).select(
        F.explode(F.split("text", " ")).alias("word")
    ).localCheckpoint(eager=True)
    sources = sw.select("source").distinct()
    expanded = (
        probe.crossJoin(F.broadcast(sources))
        .join(F.broadcast(sw), ["word", "source"], "left")
        .select("word", "source", F.coalesce("c", F.lit(0)).alias("c"))
    )
    loo = (
        expanded.join(F.broadcast(gw), "word")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probe_tokens"),
            F.sum(
                F.floor(
                    1_000_000
                    * F.log(
                        ((F.col("g") - F.col("c")).cast("double") + 1)
                        / (F.col("n") - F.col("ns") + F.col("v"))
                    )
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("loo_logp_x1e6"),
        )
    )
    base = (
        probe.join(F.broadcast(gw), "word")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.floor(
                    1_000_000
                    * F.log(
                        (F.col("g").cast("double") + 1)
                        / (F.col("n") + F.col("v"))
                    )
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("base_logp_x1e6")
        )
    )
    return (
        loo.crossJoin(F.broadcast(base))
        .select(
            "source",
            "n_probe_tokens",
            "loo_logp_x1e6",
            (F.col("base_logp_x1e6") - F.col("loo_logp_x1e6"))
            .cast("bigint")
            .alias("influence_x1e6"),
        )
        .orderBy("source")
    )


@register(
    "agg_power_analysis",
    oracle=f"""
    WITH m AS (
        SELECT event_type,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS HUGEINT) AS s1,
               CAST(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)
                        * CAST(FLOOR(value * 1e6) AS BIGINT)) AS HUGEINT)
                 AS s2
        FROM events GROUP BY event_type
    ),
    calc AS (
        SELECT event_type, CAST(n AS BIGINT) AS n_observed,
               CAST(FLOOR(1e6 *
                 2.0 * (CAST(n * s2 - s1 * s1 AS DOUBLE)
                        / (CAST(n AS DOUBLE) * n))
                 * {_Z_SUM_SQ_X1E12} / 1e12
                 / ((0.02 * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (0.02 * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
               ) AS BIGINT) AS n_required_x1e6
        FROM m
    )
    SELECT event_type, n_observed, n_required_x1e6,
           CAST(n_required_x1e6 // 1000000
                + CASE WHEN n_required_x1e6 % 1000000 > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS n_required,
           n_required_x1e6 <= CAST(n_observed AS BIGINT) * 1000000
             AS currently_powered
    FROM calc ORDER BY event_type
    """,
)
def agg_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing per event type: per-arm n for 80% power to
    detect a 2% mean lift at two-sided α=5%, n = 2σ²(z_{α/2}+z_β)²/δ²
    with δ = 0.02·mean — computed from exact decimal(38,0) micro-unit
    moments, surfaced as a FLOOR(10⁶·n) image, with the reported whole
    number derived from the image by integer ceiling (cannot ulp-flip).
    `currently_powered` compares the image to the observed count in
    integers. One corpus pass, 5-row output — the before-the-test
    calculator that completes the experimentation stack."""
    ev = table(spark, sf_dir, "events")
    img = F.floor(F.col("value") * 1e6).cast("bigint")
    d38 = "decimal(38,0)"
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(img.cast(d38)).alias("s1"),
        # cast BEFORE the product: a long Σ(img²) accumulator overflows
        # past ~37k rows per type (img² ≈ 2.5e17 each)
        F.sum(img.cast(d38) * img).alias("s2"),
    )
    calc = m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_observed"),
        F.expr(
            f"CAST(FLOOR(1e6 *"
            f" 2.0 * (CAST(n * s2 - s1 * s1 AS DOUBLE)"
            f"        / (CAST(n AS DOUBLE) * n))"
            f" * {_Z_SUM_SQ_X1E12} / 1e12"
            f" / ((0.02 * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
            f"    * (0.02 * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))"
            f") AS BIGINT)"
        ).alias("n_required_x1e6"),
    )
    return calc.select(
        "event_type",
        "n_observed",
        "n_required_x1e6",
        F.expr(
            "CAST(n_required_x1e6 DIV 1000000"
            " + CASE WHEN n_required_x1e6 % 1000000 > 0 THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("n_required"),
        (F.col("n_required_x1e6") <= F.col("n_observed") * 1_000_000).alias(
            "currently_powered"
        ),
    ).orderBy("event_type")


@register(
    "win_rfm_scores",
    oracle=f"""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'
    ),
    wm AS (SELECT MAX(ts_us) AS w FROM p),
    per_user AS (
        SELECT user_id,
               CAST((wm.w - MAX(ts_us)) // {_DAY_US} AS BIGINT) AS recency,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(v) AS BIGINT) AS monetary
        FROM p, wm GROUP BY user_id, wm.w
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM per_user),
    ranked AS (
        SELECT user_id,
               -- LOW recency = good: rank descending so quintile 4 = freshest
               ROW_NUMBER() OVER (ORDER BY recency DESC, user_id) AS rr,
               ROW_NUMBER() OVER (ORDER BY frequency, user_id) AS fr,
               ROW_NUMBER() OVER (ORDER BY monetary, user_id) AS mr
        FROM per_user
    ),
    scored AS (
        SELECT CAST((5 * (rr - 1)) // nu AS INTEGER) AS r_q,
               CAST((5 * (fr - 1)) // nu AS INTEGER) AS f_q,
               CAST((5 * (mr - 1)) // nu AS INTEGER) AS m_q
        FROM ranked, n
    )
    SELECT r_q, f_q, m_q, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM scored GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
)
def win_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation census: recency/frequency/monetary per purchasing
    user, each dimension ranked GLOBALLY through the two-phase
    running_total on a unique packed string key (the agg_roc_auc rank
    convention — range shuffle + broadcast offsets, never one sorted
    partition), quintiles cut with integer (5·(r−1)) DIV n, rolled into
    the bounded 5×5×5 segment table. Higher quintile = better customer
    on every axis (recency ranks descending so quintile 4 = most
    recent)."""
    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") * 1e6).cast("bigint").alias("v"),
    )
    wm = p.agg(F.max("ts_us").alias("w"))
    per_user = (
        p.crossJoin(F.broadcast(wm))
        .groupBy("user_id")
        .agg(
            F.expr(f"CAST((any_value(w) - MAX(ts_us)) DIV {_DAY_US} AS BIGINT)").alias(
                "recency"
            ),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum("v").cast("bigint").alias("monetary"),
        )
        .localCheckpoint(eager=True)
    )
    nu = per_user.count()  # bounded: reads the checkpoint, not the corpus

    def qcol(df, metric, out, descending=False):
        key_metric = (
            (F.lit(10**12) - 1 - F.col(metric)) if descending else F.col(metric)
        )
        guarded = F.when(
            (F.col(metric) >= 0) & (F.col(metric) < 10**12) & (F.col("user_id") < 10**12),
            F.format_string("%013d:%012d", key_metric, F.col("user_id")),
        ).otherwise(
            F.raise_error(F.lit("win_rfm_scores: rank key field overflow"))
        )
        ranked = running_total(df.withColumn("__key", guarded), "__key", F.lit(1), "r")
        return ranked.select(
            "user_id",
            F.expr(f"CAST((5 * (r - 1)) DIV {nu} AS INT)").alias(out),
        )

    rq = qcol(per_user, "recency", "r_q", descending=True)
    fq = qcol(per_user, "frequency", "f_q")
    mq = qcol(per_user, "monetary", "m_q")
    return (
        rq.join(fq, "user_id")
        .join(mq, "user_id")
        .groupBy("r_q", "f_q", "m_q")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("r_q", "f_q", "m_q")
    )
