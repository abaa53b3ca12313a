"""Round-10 operator batch 11: RAKE keyword extraction, Lorenz curve,
autocorrelation period detection, and a quality-feature correlation
matrix.

- ``text_keyword_rake`` — RAKE (Rose et al. 2010) keyword extraction:
  candidate phrases are maximal stopword-free token runs (the pinned
  STOPWORDS list), each word scores degree/frequency over the phrase
  co-occurrence graph, a phrase scores the sum of its words' scores.
  Per-word scores surface as FLOOR(10⁶·deg/freq) integer images so the
  per-phrase sum is exact; top-5 phrases per source by (score, phrase).
  Phrase splitting is IN-ROW array arithmetic (token → token-or-bar →
  re-split) — no per-token window anywhere.
- ``agg_lorenz_curve`` — the Lorenz curve of document length: for each
  decile of documents (by n_chars ascending), the exact share of total
  characters the bottom d/10 holds. Computed from the LENGTH CENSUS
  (one row per distinct n_chars — bounded by max doc length at any
  corpus size), with exact integer interpolation inside the boundary
  bucket: no global sort, no per-doc window. The inequality readout
  behind agg_gini_concentration.
- ``ts_spectral_peak`` — dominant period detector: lag-1..14 integer-
  image autocorrelations of the daily event series and the argmax lag
  ≥ 2 (is_peak flag decided by integer comparison on the images). The
  'is there a weekly cycle' question, answered from the bounded daily
  census.
- ``dq_quality_corr_matrix`` — pairwise Pearson correlations between
  the integer quality features (n_tokens, n_stopwords, n_unique) over
  all documents: exact decimal(38,0) cross-moments in ONE corpus pass,
  each correlation one identical double expression, ROUND 1e-6. The
  feature-redundancy readout for the quality-scoring stage.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.functions.text import STOPWORDS
from sdg_data_catalog_spark.queries.registry import register

_RAKE_TOPK = 5
_ACF_MAX_LAG = 14

_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"


@register(
    "text_keyword_rake",
    oracle=f"""
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS t FROM documents
    ),
    barred AS (
        SELECT source,
               array_to_string(list_transform(t,
                   w -> CASE WHEN w IN {_STOP_SQL} THEN '|' ELSE w END),
                 ' ') AS s
        FROM toks
    ),
    phrases AS (
        SELECT source, trim(p) AS phrase
        FROM (SELECT source, unnest(string_split(s, '|')) AS p FROM barred)
        WHERE trim(p) <> ''
    ),
    words AS (
        SELECT source, phrase,
               unnest(string_split(phrase, ' ')) AS w,
               len(string_split(phrase, ' ')) AS plen
        FROM phrases
    ),
    wscore AS (
        SELECT w,
               CAST(FLOOR(1000000.0 * SUM(plen) / COUNT(*)) AS BIGINT)
                 AS score_x1e6
        FROM words GROUP BY w
    ),
    dscore AS (
        -- identical phrase text => identical score: score once per
        -- DISTINCT phrase (words join with multiplicity within it)
        SELECT phrase, CAST(SUM(ws.score_x1e6) AS BIGINT) AS score_x1e6
        FROM (SELECT phrase, unnest(string_split(phrase, ' ')) AS w
              FROM (SELECT DISTINCT phrase FROM phrases)) dw
        JOIN wscore ws ON ws.w = dw.w
        GROUP BY phrase
    ),
    pscore AS (
        SELECT p.source, p.phrase,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(ANY_VALUE(d.score_x1e6) AS BIGINT) AS score_x1e6
        FROM phrases p JOIN dscore d ON d.phrase = p.phrase
        GROUP BY p.source, p.phrase
    )
    SELECT source, phrase, n_occurrences, score_x1e6
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY score_x1e6 DESC, phrase) AS rk
        FROM pscore
    ) WHERE rk <= {_RAKE_TOPK}
    ORDER BY source, score_x1e6 DESC, phrase
    """,
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keywords per source: stopword-delimited phrase extraction
    (in-row: tokens → stopword-to-bar → re-split — no per-token window),
    word score = degree/frequency over the phrase graph where degree
    sums the lengths of phrases containing the word, phrase score =
    Σ word-score images (exact int64 — per-word FLOOR(10⁶·deg/freq)
    first, so the sum has no float association order). Work shape: one
    phrase explode → word-grain partial agg (vocabulary-sized score
    table, broadcast back) → phrase-grain rollup → per-source top-5 rank
    over the bounded (source × distinct phrase) census."""
    docs = table(spark, sf_dir, "documents")
    barred = docs.select(
        "source",
        F.concat_ws(
            " ",
            F.transform(
                F.split("text", " "),
                lambda w: F.when(
                    w.isin(*STOPWORDS), F.lit("|")
                ).otherwise(w),
            ),
        ).alias("s"),
    )
    phrases = (
        barred.select(
            "source", F.explode(F.split("s", r"\|")).alias("p")
        )
        .select("source", F.trim("p").alias("phrase"))
        .filter(F.col("phrase") != "")
        .localCheckpoint(eager=True)
    )
    words = phrases.select(
        "source",
        "phrase",
        F.explode(F.split("phrase", " ")).alias("w"),
        F.size(F.split("phrase", " ")).alias("plen"),
    )
    wscore = words.groupBy("w").agg(
        F.floor(1_000_000.0 * F.sum("plen") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("score_x1e6")
    )
    # identical phrase text => identical score: score each DISTINCT
    # phrase once (its words join with multiplicity), then attach to the
    # per-(source, phrase) occurrence census
    dscore = (
        phrases.select("phrase")
        .distinct()
        .select("phrase", F.explode(F.split("phrase", " ")).alias("w"))
        .join(F.broadcast(wscore), "w")
        .groupBy("phrase")
        .agg(F.sum("score_x1e6").cast("bigint").alias("score_x1e6"))
    )
    pscore = (
        phrases.join(dscore, "phrase")
        .groupBy("source", "phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.any_value("score_x1e6").cast("bigint").alias("score_x1e6"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.col("score_x1e6").desc(), "phrase"
        )
    )
    return (
        pscore.withColumn("rk", rk)
        .filter(F.col("rk") <= _RAKE_TOPK)
        .select("source", "phrase", "n_occurrences", "score_x1e6")
        .orderBy("source", F.col("score_x1e6").desc(), "phrase")
    )


@register(
    "agg_lorenz_curve",
    oracle="""
    WITH census AS (
        SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(n_chars * COUNT(*) AS BIGINT) AS chars
        FROM documents GROUP BY n_chars
    ),
    cum AS (
        SELECT n_chars, cnt, chars,
               SUM(cnt) OVER (ORDER BY n_chars) AS cum_cnt,
               SUM(chars) OVER (ORDER BY n_chars) AS cum_chars
        FROM census
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(SUM(chars) AS BIGINT) AS total_chars
        FROM census
    ),
    deciles AS (SELECT unnest(generate_series(1, 10)) AS d),
    pts AS (
        SELECT d.d, t.n, t.total_chars,
               (d.d * t.n) // 10 AS k,
               (SELECT CAST(COALESCE(MAX(cum_chars), 0) AS BIGINT)
                FROM cum WHERE cum_cnt <= (d.d * t.n) // 10) AS below,
               (SELECT CAST(COALESCE(MAX(cum_cnt), 0) AS BIGINT)
                FROM cum WHERE cum_cnt <= (d.d * t.n) // 10) AS below_cnt,
               (SELECT CAST(MIN(n_chars) AS BIGINT)
                FROM cum WHERE cum_cnt > (d.d * t.n) // 10) AS bucket_len
        FROM deciles d, tot t
    )
    SELECT CAST(d AS INTEGER) AS decile,
           CAST(k AS BIGINT) AS n_docs_cut,
           CAST(below + (k - below_cnt) * COALESCE(bucket_len, 0) AS BIGINT)
             AS cum_chars,
           CAST(1000000 * (below + (k - below_cnt) * COALESCE(bucket_len, 0))
                // total_chars AS BIGINT) AS share_x1e6
    FROM pts ORDER BY decile
    """,
)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of document length: exact cumulative character share
    of the shortest d/10 of documents, for d = 1..10 — the inequality
    curve behind the Gini number, and the tail-mass readout that sizes
    long-document handling. Built from the LENGTH CENSUS (one grouped
    pass → one row per distinct n_chars, bounded by max doc length, so
    the prefix sums and the decile interpolation run on a metadata-sized
    table with a constant-key window). The boundary decile interpolates
    INSIDE its census bucket with pure integer arithmetic: cum_chars =
    chars_below + (k − cnt_below)·bucket_len."""
    docs = table(spark, sf_dir, "documents")
    census = (
        docs.groupBy("n_chars")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            "n_chars", "cnt", (F.col("n_chars") * F.col("cnt")).alias("chars")
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy(F.spark_partition_id()).orderBy("n_chars")
    cum = census.select(
        "n_chars",
        F.sum("cnt").over(w).alias("cum_cnt"),
        F.sum("chars").over(w).alias("cum_chars"),
    ).localCheckpoint(eager=True)
    tot = census.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("chars").cast("bigint").alias("total_chars"),
    )
    deciles = spark.range(1, 11).select(F.col("id").cast("int").alias("d"))
    pts = deciles.crossJoin(F.broadcast(tot)).select(
        "d", "n", "total_chars", F.expr("d * n DIV 10").alias("k")
    )
    below = (
        pts.join(cum, cum.cum_cnt <= pts.k, "left")
        .groupBy("d", "n", "total_chars", "k")
        .agg(
            F.coalesce(F.max("cum_chars"), F.lit(0)).alias("below"),
            F.coalesce(F.max("cum_cnt"), F.lit(0)).alias("below_cnt"),
        )
    )
    bucket = (
        pts.select("d", "k")
        .join(cum, cum.cum_cnt > F.col("k"), "left")
        .groupBy("d")
        .agg(F.min("n_chars").alias("bucket_len"))
    )
    return (
        below.join(bucket, "d")
        .select(
            F.col("d").alias("decile"),
            F.col("k").cast("bigint").alias("n_docs_cut"),
            (
                F.col("below")
                + (F.col("k") - F.col("below_cnt"))
                * F.coalesce(F.col("bucket_len"), F.lit(0))
            )
            .cast("bigint")
            .alias("cum_chars"),
            F.expr(
                "CAST(1000000 * (below + (k - below_cnt)"
                " * COALESCE(bucket_len, 0)) DIV total_chars AS BIGINT)"
            ).alias("share_x1e6"),
        )
        .orderBy("decile")
    )


@register(
    "ts_spectral_peak",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM daily
    ),
    lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    cross_l AS (
        SELECT l.lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(c.y * p.y) AS BIGINT) AS sxy
        FROM lags l
        JOIN daily c ON TRUE
        JOIN daily p ON p.day = c.day - l.lag
        GROUP BY l.lag
    ),
    acf AS (
        SELECT lag, n_pairs,
               CAST(FLOOR(1000000 * (CAST(sxy AS DOUBLE) / n_pairs
                      - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                    / (CAST(syy AS DOUBLE) / n
                      - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)))
                 AS BIGINT) AS r_x1e6
        FROM cross_l, m
    )
    SELECT CAST(lag AS INTEGER) AS lag, n_pairs, r_x1e6,
           lag >= 2 AND r_x1e6 = (SELECT MAX(r_x1e6) FROM acf WHERE lag >= 2)
             AS is_peak
    FROM acf ORDER BY lag
    """,
)
def ts_spectral_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant-period detector: lag-1..14 autocorrelations of the daily
    event-count series (FLOOR(10⁶·r) images from exact integer moments;
    the mean/variance normalization is one identical double expression),
    with the peak lag ≥ 2 flagged by integer comparison on the images —
    'does this series have a weekly cycle' answered without FFTs. The
    corpus-sized work is one grouped day census; all 14 lag joins run on
    the bounded daily table."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP))"
                " DIV 86400000000 AS BIGINT)"
            ).alias("day")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        .localCheckpoint(eager=True)
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    cur = daily.select(F.col("day").alias("cd"), F.col("y").alias("cy"))
    prev = daily.select(F.col("day").alias("pd"), F.col("y").alias("py"))
    cross_l = (
        lags.crossJoin(cur)
        .join(prev, F.col("pd") == F.col("cd") - F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("cy") * F.col("py")).cast("bigint").alias("sxy"),
        )
    )
    acf = cross_l.crossJoin(F.broadcast(m)).select(
        "lag",
        "n_pairs",
        F.floor(
            1_000_000
            * (
                F.col("sxy").cast("double") / F.col("n_pairs")
                - (F.col("sy").cast("double") / F.col("n"))
                * (F.col("sy").cast("double") / F.col("n"))
            )
            / (
                F.col("syy").cast("double") / F.col("n")
                - (F.col("sy").cast("double") / F.col("n"))
                * (F.col("sy").cast("double") / F.col("n"))
            )
        )
        .cast("bigint")
        .alias("r_x1e6"),
    ).localCheckpoint(eager=True)
    peak = acf.filter(F.col("lag") >= 2).agg(
        F.max("r_x1e6").alias("peak_r")
    )
    return (
        acf.crossJoin(F.broadcast(peak))
        .select(
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            "r_x1e6",
            ((F.col("lag") >= 2) & (F.col("r_x1e6") == F.col("peak_r"))).alias(
                "is_peak"
            ),
        )
        .orderBy("lag")
    )


_QF_SQL = """
SELECT len(string_split(text, ' ')) AS nt,
       len(list_filter(string_split(text, ' '),
           w -> w IN {stop})) AS ns,
       len(list_distinct(string_split(text, ' '))) AS nu
FROM documents
"""


@register(
    "dq_quality_corr_matrix",
    oracle=f"""
    WITH feats AS ({_QF_SQL.format(stop=_STOP_SQL)}),
    m AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(nt) AS HUGEINT) AS st, CAST(SUM(ns) AS HUGEINT) AS ss,
               CAST(SUM(nu) AS HUGEINT) AS su,
               CAST(SUM(nt * nt) AS HUGEINT) AS stt,
               CAST(SUM(ns * ns) AS HUGEINT) AS sss,
               CAST(SUM(nu * nu) AS HUGEINT) AS suu,
               CAST(SUM(nt * ns) AS HUGEINT) AS sts,
               CAST(SUM(nt * nu) AS HUGEINT) AS stu,
               CAST(SUM(ns * nu) AS HUGEINT) AS ssu
        FROM feats
    )
    SELECT pair, ROUND(num / den, 6) AS pearson FROM (
        SELECT 'n_tokens~n_stopwords' AS pair,
               CAST(n * sts - st * ss AS DOUBLE) AS num,
               sqrt(CAST(n * stt - st * st AS DOUBLE)
                    * CAST(n * sss - ss * ss AS DOUBLE)) AS den
        FROM m
        UNION ALL
        SELECT 'n_tokens~n_unique',
               CAST(n * stu - st * su AS DOUBLE),
               sqrt(CAST(n * stt - st * st AS DOUBLE)
                    * CAST(n * suu - su * su AS DOUBLE))
        FROM m
        UNION ALL
        SELECT 'n_stopwords~n_unique',
               CAST(n * ssu - ss * su AS DOUBLE),
               sqrt(CAST(n * sss - ss * ss AS DOUBLE)
                    * CAST(n * suu - su * su AS DOUBLE))
        FROM m
    ) ORDER BY pair
    """,
)
def dq_quality_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between the integer quality features
    n_tokens / n_stopwords / n_unique over all documents — the feature-
    redundancy readout that decides whether a quality scorer needs all
    three signals. ONE corpus pass computes the nine exact decimal(38,0)
    cross-moments; each correlation is one identical double expression
    from exact integers on both engines, ROUND 1e-6; output is a fixed
    3-row matrix at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = docs.select(
        F.size(toks).alias("nt"),
        F.size(F.filter(toks, lambda w: F.array_contains(stop, w))).alias("ns"),
        F.size(F.array_distinct(toks)).alias("nu"),
    )
    d38 = "decimal(38,0)"
    m = feats.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("nt").cast(d38).alias("st"),
        F.sum("ns").cast(d38).alias("ss"),
        F.sum("nu").cast(d38).alias("su"),
        F.sum(F.col("nt") * F.col("nt")).cast(d38).alias("stt"),
        F.sum(F.col("ns") * F.col("ns")).cast(d38).alias("sss"),
        F.sum(F.col("nu") * F.col("nu")).cast(d38).alias("suu"),
        F.sum(F.col("nt") * F.col("ns")).cast(d38).alias("sts"),
        F.sum(F.col("nt") * F.col("nu")).cast(d38).alias("stu"),
        F.sum(F.col("ns") * F.col("nu")).cast(d38).alias("ssu"),
    ).localCheckpoint(eager=True)  # 1 row; 3 selects below must not re-scan

    def corr(pair, sxy, sx, sy, sxx, syy):
        num = (F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        den = F.sqrt(
            (F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
            * (F.col("n") * F.col(syy) - F.col(sy) * F.col(sy)).cast("double")
        )
        return m.select(
            F.lit(pair).alias("pair"), F.round(num / den, 6).alias("pearson")
        )

    out = (
        corr("n_tokens~n_stopwords", "sts", "st", "ss", "stt", "sss")
        .unionAll(corr("n_tokens~n_unique", "stu", "st", "su", "stt", "suu"))
        .unionAll(corr("n_stopwords~n_unique", "ssu", "ss", "su", "sss", "suu"))
    )
    return out.orderBy("pair")
