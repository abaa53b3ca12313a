"""Round-10 operator batch 6: lexical concentration, LM hyperparameter
sweep, multi-rater reliability, and market concentration.

- ``agg_simpson_diversity`` — Simpson concentration index per language
  over the word census: D = Σ nᵢ(nᵢ−1) / (N(N−1)), the probability two
  randomly drawn tokens are the same type. The numerator/denominator
  are exact decimal(38,0) integers and the reported value is the exact
  integer image (10⁹·num) DIV den — no float anywhere. Completes the
  lexical-diversity ladder (heaps / zipf / chao1 / good-turing / mtld).
- ``lm_lambda_sweep`` — the hyperparameter search a LM-quality pipeline
  actually runs: Jelinek-Mercer λ ∈ {0.2, 0.4, 0.6, 0.8} scored on a
  HELD-OUT half (train = even doc_ids, score = odd doc_ids), all four
  λ's riding ONE pass over the joined held-out bigram table as
  conditional aggregates. Unseen-event handling is explicit: a zero
  train count contributes 0 bigram mass and the unigram background is
  add-one smoothed, so ln never sees 0. Per-term FLOOR(10⁶·ln P)
  integer images sum exactly; the winner is flagged in-query.
- ``eval_krippendorff_alpha`` — Krippendorff's α (nominal, 3 raters,
  complete data) for the shifted-threshold rater panel shared with
  ``agg_fleiss_kappa``. For r raters and nominal weights the whole
  statistic collapses to integer algebra on the same one-pass sums
  Fleiss uses: α = 1 − (9n − Σssq)(3n−1) / (2(9n² − Σ s_c²)) — exact
  integers to one final division.
- ``agg_hhi_concentration`` — Herfindahl-Hirschman supplier-revenue
  concentration per nation (the skew readout that says 'this join key
  needs salting'): per-row revenue as a FLOOR(10⁶·price·(1−disc))
  micro-unit image, per-supplier sums and their squares in exact
  decimal(38,0), HHI as one identical double expression from exact
  moments.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_LAMBDAS = (2, 4, 6, 8)  # λ·10 grid for the JM sweep


@register(
    "agg_simpson_diversity",
    oracle="""
    WITH w AS (
        SELECT lang, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    c AS (
        SELECT lang, word, CAST(COUNT(*) AS HUGEINT) AS n
        FROM w GROUP BY lang, word
    ),
    s AS (
        SELECT lang,
               CAST(SUM(n) AS HUGEINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(n * (n - 1)) AS HUGEINT) AS num
        FROM c GROUP BY lang
    )
    SELECT lang,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           n_types,
           CAST((1000000000 * num) // (n_tokens * (n_tokens - 1)) AS BIGINT)
             AS simpson_x1e9
    FROM s ORDER BY lang
    """,
)
def agg_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration per language: the chance two random tokens
    are the same word — high = template-heavy vocabulary, low = diverse.
    One explode + two grouped aggregations (word census → per-lang
    moments), all partial-agg friendly. num ≤ N² stays inside
    decimal(38,0) to N ≈ 10¹⁴ tokens per language — beyond any corpus
    this engine will see; the quotient image is exact integer DIV on
    both engines (Spark decimal DIV ≡ DuckDB HUGEINT //, probed)."""
    docs = table(spark, sf_dir, "documents")
    c = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("n"))
    )
    s = c.groupBy("lang").agg(
        F.sum("n").cast("decimal(38,0)").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.expr("n * (n - 1)")).cast("decimal(38,0)").alias("num"),
    )
    return s.select(
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.expr(
            "CAST((CAST(1000000000 AS DECIMAL(38,0)) * num)"
            " DIV (n_tokens * (n_tokens - CAST(1 AS DECIMAL(38,0))))"
            " AS BIGINT)"
        ).alias("simpson_x1e9"),
    ).orderBy("lang")


def _lambda_sweep_oracle() -> str:
    terms = ", ".join(
        f"CAST(SUM(CAST(FLOOR(1000000 * ln("
        f"0.{lx} * CASE WHEN ca > 0 THEN CAST(c2 AS DOUBLE) / ca ELSE 0.0 END"
        f" + 0.{10 - lx} * (CAST(cb AS DOUBLE) + 1) / (nn + vv)"
        f")) AS BIGINT)) AS BIGINT) AS s{lx}"
        for lx in _LAMBDAS
    )
    rows = " UNION ALL ".join(
        f"SELECT {lx} AS lambda_x10, n_scored, s{lx} AS sum_logp_x1e6,"
        f" CASE WHEN s{lx} = best THEN 1 ELSE 0 END AS is_best FROM agg"
        for lx in _LAMBDAS
    )
    greatest = "GREATEST(" + ", ".join(f"s{lx}" for lx in _LAMBDAS) + ")"
    return f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    train_big AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM tok, UNNEST(range(1, len(t))) AS u(i)
      WHERE doc_id % 2 = 0
    ),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
           FROM train_big GROUP BY w1, w2),
    c1 AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents
            WHERE doc_id % 2 = 0)
      GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(c1) AS DOUBLE) AS nn,
                   CAST(COUNT(*) AS DOUBLE) AS vv FROM c1),
    held AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM tok, UNNEST(range(1, len(t))) AS u(i)
      WHERE doc_id % 2 = 1
    ),
    joined AS (
      SELECT COALESCE(c2.c2, 0) AS c2,
             COALESCE(ca.c1, 0) AS ca,
             COALESCE(cb.c1, 0) AS cb,
             tot.nn, tot.vv
      FROM held
      LEFT JOIN c2 ON c2.w1 = held.w1 AND c2.w2 = held.w2
      LEFT JOIN c1 ca ON ca.w = held.w1
      LEFT JOIN c1 cb ON cb.w = held.w2
      , tot
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_scored, {terms},
             {greatest} AS best
      FROM joined
    )
    SELECT * FROM ({rows}) ORDER BY lambda_x10
    """


@register("lm_lambda_sweep", oracle=_lambda_sweep_oracle())
def lm_lambda_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out λ grid search for the Jelinek-Mercer LM: train the
    bigram/unigram tables on even doc_ids (one pass each, vocabulary-
    sized, checkpointed, broadcast), score every odd-doc bigram under
    all four λ's AS CONDITIONAL AGGREGATES riding one probe pass — the
    sweep costs one corpus scan more than scoring a single λ. Unseen
    bigrams/unigrams get 0 bigram mass and an add-one unigram
    background, so the interpolated probability is strictly positive.
    Each λ's per-term FLOOR(10⁶·ln P) image is one identical double
    expression from exact integer counts on both engines (the
    lm_jm_interpolated_score convention); sums are exact int64. The
    best λ is flagged from the 1-row aggregate — at every corpus size
    the decision table is 4 rows."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    left = F.slice("t", 1, F.size("t") - 1)
    right = F.slice(F.col("t"), F.lit(2), F.size("t") - 1)
    big = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(left, right, lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    train_big = big.filter(F.col("doc_id") % 2 == 0)
    c2 = (
        train_big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
        .localCheckpoint(eager=True)
    )
    c1 = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
        .localCheckpoint(eager=True)
    )
    tot = c1.agg(
        F.sum("c1").cast("double").alias("nn"),
        F.count(F.lit(1)).cast("double").alias("vv"),
    )
    ca = c1.select(F.col("w").alias("w1"), F.col("c1").alias("ca"))
    cb = c1.select(F.col("w").alias("w2"), F.col("c1").alias("cb"))
    joined = (
        big.filter(F.col("doc_id") % 2 == 1)
        .join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(ca), "w1", "left")
        .join(F.broadcast(cb), "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.coalesce("c2", F.lit(0)).alias("c2"),
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
            "nn",
            "vv",
        )
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_scored")]
    for lx in _LAMBDAS:
        p = F.lit(lx / 10.0) * F.when(
            F.col("ca") > 0, F.col("c2").cast("double") / F.col("ca")
        ).otherwise(F.lit(0.0)) + F.lit((10 - lx) / 10.0) * (
            F.col("cb").cast("double") + 1
        ) / (F.col("nn") + F.col("vv"))
        aggs.append(
            F.sum(F.floor(1_000_000 * F.log(p)).cast("bigint"))
            .cast("bigint")
            .alias(f"s{lx}")
        )
    agg = joined.agg(*aggs).withColumn(
        "best", F.greatest(*[F.col(f"s{lx}") for lx in _LAMBDAS])
    )
    stack = ", ".join(f"{lx}, s{lx}" for lx in _LAMBDAS)
    return (
        agg.select(
            "n_scored",
            "best",
            F.expr(
                f"stack({len(_LAMBDAS)}, {stack}) AS (lambda_x10, sum_logp_x1e6)"
            ),
        )
        .select(
            "lambda_x10",
            "n_scored",
            "sum_logp_x1e6",
            F.when(F.col("sum_logp_x1e6") == F.col("best"), 1)
            .otherwise(0)
            .alias("is_best"),
        )
        .orderBy("lambda_x10")
    )


_RATER = """CASE WHEN value < 100 + {s} THEN 'view'
            WHEN value < 200 + {s} THEN 'click'
            WHEN value < 300 + {s} THEN 'signup'
            WHEN value < 400 + {s} THEN 'purchase'
            ELSE 'error' END"""

_CATS = ("view", "click", "signup", "purchase", "error")


@register(
    "eval_krippendorff_alpha",
    oracle=f"""
    WITH rated AS (
      SELECT {_RATER.format(s=0)} AS r1,
             {_RATER.format(s=50)} AS r2,
             {_RATER.format(s=-50)} AS r3
      FROM events
    ),
    peri AS (
      SELECT {' + '.join(
          "(CASE WHEN r1 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r2 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r3 = '" + c + "' THEN 1 ELSE 0 END)"
          + " * (CASE WHEN r1 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r2 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r3 = '" + c + "' THEN 1 ELSE 0 END)"
          for c in _CATS)} AS ssq,
        {', '.join(
          "CASE WHEN r1 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r2 = '" + c + "' THEN 1 ELSE 0 END"
          + " + CASE WHEN r3 = '" + c + "' THEN 1 ELSE 0 END AS n_" + c
          for c in _CATS)}
      FROM rated
    ),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(ssq) AS HUGEINT) AS sum_ssq,
             {', '.join('CAST(SUM(n_' + c + ') AS HUGEINT) AS s_' + c
                        for c in _CATS)}
      FROM peri
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(sum_ssq AS BIGINT) AS sum_ssq,
           CAST(9 * n - sum_ssq AS BIGINT) AS do_num2,
           ROUND(1.0 - CAST((9 * n - sum_ssq) * (3 * n - 1) AS DOUBLE)
                       / CAST(2 * (9 * n * n
                           - ({' + '.join('s_' + c + ' * s_' + c
                                          for c in _CATS)})) AS DOUBLE),
                 6) AS alpha
    FROM s
    """,
)
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's α (nominal metric, 3 raters, complete data) for the
    shifted-threshold rater panel shared with agg_fleiss_kappa — the
    reliability statistic that generalizes to missing data and other
    metrics, reported here in its closed nominal form: with r=3 raters
    the observed disagreement is (9n − Σᵤ Σ_c n_uc²)/2 and the expected
    disagreement (9n² − Σ_c s_c²)/(2(3n−1)) over pooled category totals
    s_c, so α = 1 − (9n−Σssq)(3n−1)/(2(9n²−Σs_c²)) — every term an
    exact integer (decimal(38,0) products; n up to 10¹⁸ safe), one
    double division at the end. Same one-pass sums as Fleiss: ONE
    corpus scan, 1-row output."""
    ev = table(spark, sf_dir, "events")
    rated = ev.select(
        F.expr(_RATER.format(s=0)).alias("r1"),
        F.expr(_RATER.format(s=50)).alias("r2"),
        F.expr(_RATER.format(s=-50)).alias("r3"),
    )
    nij = {
        c: sum(F.when(F.col(r) == c, 1).otherwise(0) for r in ("r1", "r2", "r3"))
        for c in _CATS
    }
    ssq = sum(nij[c] * nij[c] for c in _CATS)
    aggs = [
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(ssq).cast("decimal(38,0)").alias("sum_ssq"),
    ] + [F.sum(nij[c]).cast("decimal(38,0)").alias(f"s_{c}") for c in _CATS]
    s = rated.agg(*aggs)
    se_sq = sum(F.col(f"s_{c}") * F.col(f"s_{c}") for c in _CATS)
    do_num2 = 9 * F.col("n") - F.col("sum_ssq")
    alpha = F.round(
        1.0
        - (do_num2 * (3 * F.col("n") - 1)).cast("double")
        / (2 * (9 * F.col("n") * F.col("n") - se_sq)).cast("double"),
        6,
    )
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_ssq").cast("bigint").alias("sum_ssq"),
        do_num2.cast("bigint").alias("do_num2"),
        alpha.alias("alpha"),
    )


@register(
    "agg_hhi_concentration",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1e6)
                    AS BIGINT) AS rev_micro
        FROM lineitem
    ),
    per_supp AS (
        SELECT s.s_nationkey, rev.l_suppkey,
               CAST(SUM(rev_micro) AS HUGEINT) AS rev_s
        FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
        GROUP BY s.s_nationkey, rev.l_suppkey
    ),
    per_nation AS (
        SELECT s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(rev_s) AS HUGEINT) AS tot,
               CAST(SUM(rev_s * rev_s) AS HUGEINT) AS sum_sq
        FROM per_supp GROUP BY s_nationkey
    )
    SELECT n.n_name AS nation, p.n_suppliers,
           CAST(p.tot AS DOUBLE) AS rev_total_micro,
           ROUND(CAST(p.sum_sq AS DOUBLE)
                 / (CAST(p.tot AS DOUBLE) * CAST(p.tot AS DOUBLE)), 9)
             AS hhi
    FROM per_nation p JOIN nation n ON n.n_nationkey = p.s_nationkey
    ORDER BY nation
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within each
    nation — the canonical market-concentration number, and for an
    engine the per-key skew readout (HHI → 1 means one supplier owns the
    key: salt it). Per-row revenue is the FLOOR(10⁶·price·(1−disc))
    integer image (one identical double product on both engines);
    per-supplier and per-nation moments are exact decimal(38,0) sums
    (Σrev², with rev_s ≤ 10¹⁵ micro, stays inside 38 digits past sf10⁴);
    HHI is one double expression from exact moments, ROUND 1e-9. Shape:
    one lineitem pass → supplier-grain partial agg → broadcast supplier
    dim → nation rollup → broadcast nation names."""
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = li.select(
        "l_suppkey",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1e6)
        .cast("bigint")
        .alias("rev_micro"),
    )
    per_supp = (
        rev.join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("rev_micro").cast("decimal(38,0)").alias("rev_s"))
    )
    per_nation = per_supp.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev_s").cast("decimal(38,0)").alias("tot"),
        F.sum(F.col("rev_s") * F.col("rev_s")).cast("decimal(38,0)").alias("sum_sq"),
    )
    return (
        per_nation.join(
            F.broadcast(nation), per_nation.s_nationkey == nation.n_nationkey
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
            F.col("tot").cast("double").alias("rev_total_micro"),
            F.round(
                F.col("sum_sq").cast("double")
                / (F.col("tot").cast("double") * F.col("tot").cast("double")),
                9,
            ).alias("hhi"),
        )
        .orderBy("nation")
    )
