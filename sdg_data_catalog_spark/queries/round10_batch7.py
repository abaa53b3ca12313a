"""Round-10 operator batch 7: corpus-comparison log-odds, a trained
naive-Bayes classifier, hopping-window streaming top-k, and 2-rater
Cohen's kappa.

- ``agg_log_odds_monroe`` — "Fightin' Words" (Monroe/Colaresi/Quinn
  2008) log-odds with an informative Dirichlet prior: for each source,
  which words are over-used vs the REST of the corpus, z-scored so
  frequent and rare words are comparable. All counts come from one word
  census pass; the prior is the global unigram distribution scaled to
  mass 100; δ and its variance are one identical double expression from
  exact integers, surfaced as FLOOR(10⁶·z) images; top-5 per source via
  a rank window over the (source × vocab) census (never the corpus).
- ``ml_naive_bayes`` — multinomial naive Bayes LANGUAGE classifier
  trained on even doc_ids (add-one smoothing over the 5-language corpus
  set) and evaluated on held-out odd doc_ids, reported as the 5×5
  confusion matrix. Per-word log-likelihood FLOOR(10⁶·ln P) images are
  exact int64 and sum per document; the argmax is an in-row GREATEST
  over 5 score columns with a deterministic first-match tie-break —
  so train, score, and the eval rollup are all inside the hash check.
- ``stream_hopping_topk`` — top-3 event types per 15-minute hopping
  window (5-minute hop): the windowed-leaderboard shape Structured
  Streaming serves with window()+rank; every event lands in 3 windows.
- ``eval_cohens_kappa`` — 2-rater Cohen's kappa for raters r1 (shift 0)
  and r2 (shift +50) of the shared shifted-threshold panel: exact
  integer observed/expected agreement to one final division — the
  2-rater rung under agg_fleiss_kappa / eval_krippendorff_alpha.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_LANGS = ("de", "en", "es", "fr", "zh")  # pinned corpus language set
_PRIOR_MASS = 100.0  # Dirichlet prior mass for the log-odds z-scores
_TOPK_WORDS = 5


@register(
    "agg_log_odds_monroe",
    oracle=f"""
    WITH w AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    sw AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS y
        FROM w GROUP BY source, word
    ),
    gw AS (
        SELECT word, CAST(SUM(y) AS BIGINT) AS gy FROM sw GROUP BY word
    ),
    st AS (
        SELECT source, CAST(SUM(y) AS BIGINT) AS n FROM sw GROUP BY source
    ),
    gt AS (SELECT CAST(SUM(gy) AS BIGINT) AS big_n FROM gw),
    z AS (
        SELECT sw.source, sw.word, sw.y,
               CAST(FLOOR(1000000 * (
                 (ln((sw.y + {_PRIOR_MASS} * gw.gy / gt.big_n)
                     / (st.n + {_PRIOR_MASS} - sw.y
                        - {_PRIOR_MASS} * gw.gy / gt.big_n))
                  - ln((gw.gy - sw.y + {_PRIOR_MASS} * gw.gy / gt.big_n)
                       / (gt.big_n - st.n + {_PRIOR_MASS} - (gw.gy - sw.y)
                          - {_PRIOR_MASS} * gw.gy / gt.big_n)))
                 / sqrt(1.0 / (sw.y + {_PRIOR_MASS} * gw.gy / gt.big_n)
                        + 1.0 / (gw.gy - sw.y
                                 + {_PRIOR_MASS} * gw.gy / gt.big_n))
               )) AS BIGINT) AS z_x1e6
        FROM sw
        JOIN gw ON gw.word = sw.word
        JOIN st ON st.source = sw.source
        , gt
    )
    SELECT source, word, y, z_x1e6
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY z_x1e6 DESC, word) AS rk
        FROM z
    )
    WHERE rk <= {_TOPK_WORDS}
    ORDER BY source, z_x1e6 DESC, word
    """,
)
def agg_log_odds_monroe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source discriminative vocabulary by informative-Dirichlet
    log-odds z-score (Monroe et al. 2008), source vs rest-of-corpus:
    δ_sw = ln[(y+α_w)/(n_s+α₀−y−α_w)] − ln[(y'+α_w)/(N'+α₀−y'−α_w)]
    with α_w the global unigram share scaled to mass α₀=100 and
    variance ≈ 1/(y+α_w) + 1/(y'+α_w). One corpus pass builds the
    (source, word) census; the global-word and per-source totals derive
    from it (vocabulary-sized, broadcast back); z is one identical
    double expression from exact integers on both engines, surfaced as
    the FLOOR(10⁶·z) image. The rank window partitions by source over
    the census table — bounded by vocab × 20 sources, never the corpus."""
    docs = table(spark, sf_dir, "documents")
    sw = (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)
    )
    gw = sw.groupBy("word").agg(F.sum("y").cast("bigint").alias("gy"))
    st = sw.groupBy("source").agg(F.sum("y").cast("bigint").alias("n"))
    gt = gw.agg(F.sum("gy").cast("bigint").alias("big_n"))
    a = _PRIOR_MASS * F.col("gy") / F.col("big_n")
    y, n, gy, big_n = F.col("y"), F.col("n"), F.col("gy"), F.col("big_n")
    delta = F.log(
        (y + a) / (n + F.lit(_PRIOR_MASS) - y - a)
    ) - F.log(
        (gy - y + a)
        / (big_n - n + F.lit(_PRIOR_MASS) - (gy - y) - a)
    )
    var = 1.0 / (y + a) + 1.0 / (gy - y + a)
    z = F.floor(1_000_000 * (delta / F.sqrt(var))).cast("bigint")
    scored = (
        sw.join(F.broadcast(gw), "word")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(gt))
        .select("source", "word", "y", z.alias("z_x1e6"))
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("z_x1e6").desc(), "word")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= _TOPK_WORDS)
        .select("source", "word", "y", "z_x1e6")
        .orderBy("source", F.col("z_x1e6").desc(), "word")
    )


def _nb_oracle() -> str:
    lik = ", ".join(
        f"CAST(FLOOR(1000000 * ln("
        f"(COALESCE(m.c_{lg}, 0) + 1.0) / (lt.n_{lg} + lt.v))) AS BIGINT)"
        f" AS l_{lg}" for lg in _LANGS
    )
    score = ", ".join(
        f"CAST(SUM(COALESCE(l_{lg}, 0)) AS BIGINT)"
        f" + ANY_VALUE(pr.p_{lg}) AS s_{lg}" for lg in _LANGS
    )
    argmax = "CASE " + " ".join(
        f"WHEN s_{lg} >= GREATEST({', '.join('s_' + o for o in _LANGS)})"
        f" THEN '{lg}'" for lg in _LANGS
    ) + " END"
    cols_c = ", ".join(
        f"CAST(SUM(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS c_{lg}" for lg in _LANGS
    )
    cols_n = ", ".join(
        f"CAST(SUM(c_{lg}) AS BIGINT) AS n_{lg}" for lg in _LANGS
    )
    cols_p = ", ".join(
        f"CAST(FLOOR(1000000 * ln(CAST(d_{lg} AS DOUBLE) / d_all)) AS BIGINT)"
        f" AS p_{lg}" for lg in _LANGS
    )
    cols_d = ", ".join(
        f"CAST(SUM(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS d_{lg}" for lg in _LANGS
    )
    return f"""
    WITH train_w AS (
        SELECT lang, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE doc_id % 2 = 0
    ),
    model AS (
        SELECT word, {cols_c} FROM train_w GROUP BY word
    ),
    lt AS (
        SELECT {cols_n}, CAST(COUNT(*) AS BIGINT) AS v FROM model
    ),
    priors_raw AS (
        SELECT {cols_d}, CAST(COUNT(*) AS DOUBLE) AS d_all
        FROM documents WHERE doc_id % 2 = 0
    ),
    pr AS (SELECT {cols_p} FROM priors_raw),
    held AS (
        SELECT doc_id, lang AS actual,
               unnest(string_split(text, ' ')) AS word
        FROM documents WHERE doc_id % 2 = 1
    ),
    lik AS (
        SELECT h.doc_id, h.actual, {lik}
        FROM held h LEFT JOIN model m ON m.word = h.word, lt
    ),
    scored AS (
        SELECT doc_id, ANY_VALUE(actual) AS actual, {score}
        FROM lik, pr GROUP BY doc_id
    ),
    pred AS (
        SELECT actual, {argmax} AS predicted FROM scored
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY actual, predicted
    ORDER BY actual, predicted
    """


@register("ml_naive_bayes", oracle=_nb_oracle())
def ml_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language classifier, trained and evaluated
    inside the engine: per-word per-language counts from the even-doc
    half (ONE pass, vocabulary-sized, checkpointed, broadcast), add-one
    likelihoods and document-count priors as FLOOR(10⁶·ln) integer
    images, held-out odd docs scored by summing images per language
    (exact int64), argmax via in-row GREATEST with the pinned language
    order as tie-break. Output is the 5×5 confusion matrix — train,
    inference, and eval are all inside the external hash check. Shape:
    two corpus passes (train census, probe explode) + vocabulary-sized
    broadcasts; no per-(word,language) row fan-out — the model rides as
    5 columns."""
    docs = table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    train_w = train.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    )
    model = (
        train_w.groupBy("word")
        .agg(
            *[
                F.sum((F.col("lang") == lg).cast("bigint"))
                .cast("bigint")
                .alias(f"c_{lg}")
                for lg in _LANGS
            ]
        )
        .localCheckpoint(eager=True)
    )
    lt = model.agg(
        *[F.sum(f"c_{lg}").cast("bigint").alias(f"n_{lg}") for lg in _LANGS],
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    pr = train.agg(
        *[
            F.floor(
                1_000_000
                * F.log(
                    F.sum((F.col("lang") == lg).cast("bigint")).cast("double")
                    / F.count(F.lit(1)).cast("double")
                )
            )
            .cast("bigint")
            .alias(f"p_{lg}")
            for lg in _LANGS
        ]
    )
    held = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.col("lang").alias("actual"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    lik = held.join(F.broadcast(model), "word", "left").crossJoin(
        F.broadcast(lt)
    )
    lik_cols = [
        F.floor(
            1_000_000
            * F.log(
                (F.coalesce(F.col(f"c_{lg}"), F.lit(0)) + 1.0)
                / (F.col(f"n_{lg}") + F.col("v"))
            )
        )
        .cast("bigint")
        .alias(f"l_{lg}")
        for lg in _LANGS
    ]
    lik = lik.select("doc_id", "actual", *lik_cols)
    scored = (
        lik.groupBy("doc_id")
        .agg(
            F.any_value("actual").alias("actual"),
            *[F.sum(f"l_{lg}").cast("bigint").alias(f"sl_{lg}") for lg in _LANGS],
        )
        .crossJoin(F.broadcast(pr))
        .select(
            "doc_id",
            "actual",
            *[
                (F.col(f"sl_{lg}") + F.col(f"p_{lg}")).alias(f"s_{lg}")
                for lg in _LANGS
            ],
        )
    )
    best = F.greatest(*[F.col(f"s_{lg}") for lg in _LANGS])
    pred = F.when(F.col(f"s_{_LANGS[0]}") >= best, F.lit(_LANGS[0]))
    for lg in _LANGS[1:]:
        pred = pred.when(F.col(f"s_{lg}") >= best, F.lit(lg))
    return (
        scored.select("actual", pred.alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("actual", "predicted")
    )


@register(
    "stream_hopping_topk",
    oracle="""
    WITH hopped AS (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes',
                       time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '10 minutes'])
                 AS window_start,
               event_type
        FROM events
    ),
    counted AS (
        SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM hopped GROUP BY window_start, event_type
    )
    SELECT window_start, event_type, n, CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start
                    ORDER BY n DESC, event_type) AS rk
        FROM counted
    )
    WHERE rk <= 3
    ORDER BY window_start, rk
    """,
)
def stream_hopping_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per 15-minute hopping window with a 5-minute
    hop — the streaming leaderboard: window(size, slide) lands every
    event in 3 overlapping windows; counts partial-aggregate before the
    one shuffle keyed by (window, type); the rank window partitions by
    window_start over the bounded (windows × 5 types) count table. The
    identical operator runs incrementally under readStream + watermark
    (streaming/windows.py conventions) — registered here in its batch
    form so the result is externally hash-checked."""
    ev = table(spark, sf_dir, "events")
    counted = (
        ev.groupBy(
            F.window("ts", "15 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    rk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.col("n").desc(), "event_type"
        )
    )
    return (
        counted.withColumn("rk", rk.cast("int"))
        .filter(F.col("rk") <= 3)
        .orderBy("window_start", "rk")
    )


_RATER = """CASE WHEN value < 100 + {s} THEN 'view'
            WHEN value < 200 + {s} THEN 'click'
            WHEN value < 300 + {s} THEN 'signup'
            WHEN value < 400 + {s} THEN 'purchase'
            ELSE 'error' END"""

_CATS = ("view", "click", "signup", "purchase", "error")


@register(
    "eval_cohens_kappa",
    oracle=f"""
    WITH rated AS (
      SELECT {_RATER.format(s=0)} AS r1, {_RATER.format(s=50)} AS r2
      FROM events
    ),
    s AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS HUGEINT) AS agree,
             {', '.join(
                "CAST(SUM(CASE WHEN r1 = '" + c + "' THEN 1 ELSE 0 END)"
                " AS HUGEINT) AS a_" + c for c in _CATS)},
             {', '.join(
                "CAST(SUM(CASE WHEN r2 = '" + c + "' THEN 1 ELSE 0 END)"
                " AS HUGEINT) AS b_" + c for c in _CATS)}
      FROM rated
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(agree AS BIGINT) AS n_agree,
           ROUND(CAST(n * agree - ({' + '.join(
               'a_' + c + ' * b_' + c for c in _CATS)}) AS DOUBLE)
                 / CAST(n * n - ({' + '.join(
               'a_' + c + ' * b_' + c for c in _CATS)}) AS DOUBLE),
                 6) AS kappa
    FROM s
    """,
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between raters r1 (shift 0) and r2 (shift +50) of
    the shared threshold panel: κ = (p_o − p_e)/(1 − p_e) rearranged to
    the integer form (n·agree − Σ a_c·b_c)/(n² − Σ a_c·b_c) — exact
    decimal(38,0) products to one double division. ONE corpus pass
    (agreement + both marginals as conditional sums), 1-row output."""
    ev = table(spark, sf_dir, "events")
    rated = ev.select(
        F.expr(_RATER.format(s=0)).alias("r1"),
        F.expr(_RATER.format(s=50)).alias("r2"),
    )
    aggs = [
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum((F.col("r1") == F.col("r2")).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("agree"),
    ]
    for c in _CATS:
        aggs.append(
            F.sum((F.col("r1") == c).cast("bigint"))
            .cast("decimal(38,0)")
            .alias(f"a_{c}")
        )
        aggs.append(
            F.sum((F.col("r2") == c).cast("bigint"))
            .cast("decimal(38,0)")
            .alias(f"b_{c}")
        )
    s = rated.agg(*aggs)
    chance = sum(F.col(f"a_{c}") * F.col(f"b_{c}") for c in _CATS)
    kappa = F.round(
        (F.col("n") * F.col("agree") - chance).cast("double")
        / (F.col("n") * F.col("n") - chance).cast("double"),
        6,
    )
    return s.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("agree").cast("bigint").alias("n_agree"),
        kappa.alias("kappa"),
    )
