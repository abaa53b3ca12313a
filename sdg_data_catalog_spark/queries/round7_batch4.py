"""Round-7 batch 4: pretraining-corpus curation and evaluation primitives.

- ``text_gopher_rules`` — the Gopher/MassiveText-style document-quality
  rule battery (word count, mean word length, stopword evidence,
  duplicate-word fraction, symbol ratio), aggregated per (source, lang).
  Every rule is an INTEGER comparison (``2*nw <= total_chars`` instead of
  ``mean >= 2.0``) so the report is exact on both engines.
- ``agg_avg_precision`` — average precision (the step-interpolated
  PR-AUC) via the Mann-Whitney-style global rank: ONE distributed
  running-sum pass carries rank and cumulative-TP together in a single
  packed integer; per-rank precision is fixed-point integer division.
- ``sketch_kmv_jaccard`` — K-minimum-values distinct sketches per
  source, merged pairwise: union-size estimate from the K-th smallest
  hash and a Jaccard estimate from sketch-membership agreement — the
  mergeable-sketch primitive HLL cannot provide (intersections).
- ``curation_domain_mix`` — DoReMi-lite source reweighting: per-source
  token shares vs a uniform target mix, emitted as exact ppm integers
  with a capped sampling weight.
- ``agg_winsorized_mean`` — robust per-group mean with p05/p95
  winsorization; boundary ranks come from a GROUPED two-phase global
  rank (range-repartition + per-(partition, group) offsets), never a
  single-partition window.

Determinism: all rule flags, ranks, and sums are integers; the few
divisions are integer ``DIV``/``//`` at fixed-point resolution, or a
single IEEE double division replicated identically on both engines.

Reference analog: none direct — SURVEY §2.11 north-star surface (the
reference has no corpus-quality battery, AP metric, mergeable sketch
set-ops, mixture reweighting, or robust-statistics operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.functions.text import STOPWORDS
from sdg_data_catalog_spark.queries.registry import register

_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"


def _toks(col: Column) -> Column:
    """Lowercased [a-z]+ tokens, empties removed — the corpus-wide
    tokenization convention (curation_quality._tok_array), in the
    codegen-native regexp_extract_all form."""
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z]+"), 0)


# --------------------------------------------------------------------------
# text_gopher_rules
# --------------------------------------------------------------------------

_GOPHER_ORACLE = f"""
WITH d AS (
  SELECT source, lang, COALESCE(text, '') AS text,
         list_filter(string_split_regex(lower(COALESCE(text, '')), '[^a-z]+'),
                     x -> x <> '') AS t
  FROM documents
),
m AS (
  SELECT source, lang,
         len(t) AS nw,
         COALESCE(list_sum(list_transform(t, x -> length(x))), 0) AS tc,
         len(list_distinct(t)) AS nd,
         len(list_filter(t, x -> x IN {_STOP_SQL})) AS ns,
         len(list_filter(list_distinct(t), x -> x IN {_STOP_SQL})) AS nsd,
         length(lower(text))
           - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS sym,
         length(text) AS nc
  FROM d
)
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN nw BETWEEN 8 AND 512 THEN 1 ELSE 0 END) AS BIGINT)
         AS pass_wordcount,
       CAST(SUM(CASE WHEN 2 * nw <= tc AND tc <= 10 * nw THEN 1 ELSE 0 END)
            AS BIGINT) AS pass_meanlen,
       CAST(SUM(CASE WHEN nsd >= 2 AND 20 * ns >= nw THEN 1 ELSE 0 END)
            AS BIGINT) AS pass_stopword,
       CAST(SUM(CASE WHEN 2 * nd >= nw THEN 1 ELSE 0 END) AS BIGINT)
         AS pass_dupword,
       CAST(SUM(CASE WHEN 10 * sym <= GREATEST(nc, 1) THEN 1 ELSE 0 END)
            AS BIGINT) AS pass_symbol,
       CAST(SUM(CASE WHEN nw BETWEEN 8 AND 512
                      AND 2 * nw <= tc AND tc <= 10 * nw
                      AND nsd >= 2 AND 20 * ns >= nw
                      AND 2 * nd >= nw
                      AND 10 * sym <= GREATEST(nc, 1)
                 THEN 1 ELSE 0 END) AS BIGINT) AS pass_all
FROM m GROUP BY source, lang ORDER BY source, lang
"""


@register("text_gopher_rules", oracle=_GOPHER_ORACLE)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document-quality rule battery, reported per
    (source, lang): word-count bounds [8, 512], mean word length in
    [2, 10], stopword evidence (>=2 distinct stopwords AND >=5% stopword
    tokens), duplicate-word fraction <=50%, symbol ratio <=10%. The
    corpus-slice AUDIT twin of `filter_gopher_rules` (curation_rules.py),
    which emits per-document verdicts on its three base rules; this adds
    the duplicate-word and symbol-ratio families and rolls pass rates up
    to the (source, lang) grain a curation dashboard tracks. Every rule is evaluated as an integer cross-multiplication
    (``2*nw <= total_chars`` not ``tc/nw >= 2.0``) so there is no float
    anywhere in the report. One narrow projection computes all per-doc
    stats from a single token array; the rollup is a partially-aggregated
    groupBy on two low-cardinality keys — at 100 TB this is a map-side
    combine into ~100 output rows, no corpus-sized shuffle."""
    docs = table(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    low = F.lower(text)
    # Every stat is a CODEGEN-NATIVE expression — regexp_extract_all /
    # array_distinct / array_intersect / regexp_replace, no lambda HOFs.
    # The interpreted aggregate/filter form ran outside whole-stage
    # codegen and cost 25 s at the 100x replica; this form is ~12x
    # faster and value-identical (tokens are exactly the [a-z]+ runs,
    # so total token chars = count of a-z chars, and a stopword TOKEN is
    # a stopword delimited by non-letters or string edges).
    t = F.regexp_extract_all(low, F.lit("[a-z]+"), 0)
    stop_tok = (
        "(?:^|[^a-z])(" + "|".join(STOPWORDS) + ")(?=[^a-z]|$)"
    )
    m = docs.select(
        "source",
        "lang",
        F.size(t).alias("nw"),
        F.length(F.regexp_replace(low, "[^a-z]", "")).alias("tc"),
        F.size(F.array_distinct(t)).alias("nd"),
        F.size(F.regexp_extract_all(low, F.lit(stop_tok), 1)).alias("ns"),
        F.size(F.array_intersect(F.array_distinct(t), stop)).alias("nsd"),
        # symbol count via translate-DELETE of the keep-set: identical to
        # the oracle's length - length(regexp_replace(low,'[^a-z0-9 ]',''))
        # but 20x faster — Spark's regexp_replace with a mostly-non-matching
        # negated class measured 24 s at the 100x replica vs 1.3 s here
        F.length(
            F.translate(low, "abcdefghijklmnopqrstuvwxyz0123456789 ", "")
        ).alias("sym"),
        F.length(text).alias("nc"),
    )
    p_nw = F.col("nw").between(8, 512)
    p_mwl = (2 * F.col("nw") <= F.col("tc")) & (F.col("tc") <= 10 * F.col("nw"))
    p_stop = (F.col("nsd") >= 2) & (20 * F.col("ns") >= F.col("nw"))
    p_dup = 2 * F.col("nd") >= F.col("nw")
    p_sym = 10 * F.col("sym") <= F.greatest(F.col("nc"), F.lit(1))

    def cnt(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    return (
        m.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            cnt(p_nw).alias("pass_wordcount"),
            cnt(p_mwl).alias("pass_meanlen"),
            cnt(p_stop).alias("pass_stopword"),
            cnt(p_dup).alias("pass_dupword"),
            cnt(p_sym).alias("pass_symbol"),
            cnt(p_nw & p_mwl & p_stop & p_dup & p_sym).alias("pass_all"),
        )
        .orderBy("source", "lang")
    )


# --------------------------------------------------------------------------
# agg_avg_precision
# --------------------------------------------------------------------------

_BERT_P_SQL = """1.0 / (1.0 + exp(-list_sum(list_transform(range(1, 65),
    i -> CAST(embedding[i] AS DOUBLE)
         * ((((i + 17) * 2654435761) % 1000003 % 97 - 48) / 48.0)))))"""


@register(
    "agg_avg_precision",
    oracle=f"""
    WITH scored AS (
        SELECT vec_id, {_BERT_P_SQL} AS p, label % 2 AS y FROM embeddings
    ),
    ranked AS (
        SELECT y,
               ROW_NUMBER() OVER (ORDER BY FLOOR(p * 1e18) DESC, vec_id) AS k,
               SUM(y) OVER (ORDER BY FLOOR(p * 1e18) DESC, vec_id
                            ROWS UNBOUNDED PRECEDING) AS tp
        FROM scored
    )
    SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST((SUM(CASE WHEN y = 1
                          THEN CAST(tp AS BIGINT) * 1000000000000 // k
                          ELSE 0 END)
                 // (1000000 * SUM(y))) AS DOUBLE) / 1e6 AS ap
    FROM ranked
    """,
)
def agg_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (step-interpolated PR-AUC): rank predictions by
    score descending, AP = mean over positives of precision@rank. The
    global rank runs through `operators/curation.py::running_total`
    (range-repartition + per-partition windows + broadcast prefix
    offsets), and ONE pass carries BOTH rank and cumulative-TP: each row
    contributes the packed integer ``y * 10^9 + 1``, so the running sum
    decomposes as ``k = s % 10^9`` and ``tp = s div 10^9`` — no second
    shuffle. Both engines rank the floored atto-fixed-point image of p
    descending with a vec_id tie-break, and precision@k is the exact
    integer ``tp * 10^12 div k`` — the AP hash is bit-stable. (The 10^9
    packing and 10^12 precision scale bound n at ~10^9 rows in int64;
    beyond that the same plan runs on decimal(38,0).)"""
    from sdg_data_catalog_spark.operators import scoring as SC
    from sdg_data_catalog_spark.operators.curation import running_total

    emb = table(spark, sf_dir, "embeddings")
    scored = SC.classify_embeddings(emb).join(
        emb.select("vec_id", (F.col("label") % 2).alias("y")), "vec_id"
    )
    # descending-p ascending-vec_id total order as an ASCENDING string key
    key = F.format_string(
        "%020d:%012d",
        (F.lit(2_000_000_000_000_000_000) - F.floor(F.col("p_positive") * 1e18))
        .cast("long"),
        F.col("vec_id"),
    )
    packed = F.col("y").cast("long") * F.lit(1_000_000_000) + F.lit(1)
    ranked = running_total(
        scored.withColumn("__key", key), "__key", packed, "s"
    ).select(
        "y",
        (F.col("s") % 1_000_000_000).alias("k"),
        (F.col("s") / F.lit(1_000_000_000)).cast("long").alias("tp"),
    )
    prec_fp = F.expr("tp * 1000000000000 DIV k")
    n_pos = F.sum("y")
    agg = ranked.agg(
        n_pos.cast("bigint").alias("n_pos"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("y") == 1, prec_fp).otherwise(F.lit(0)))
        .cast("long")
        .alias("__ap_fp"),
    )
    return agg.select(
        "n_pos",
        "n",
        (F.expr("__ap_fp DIV (1000000 * n_pos)").cast("double") / 1e6).alias("ap"),
    )


# --------------------------------------------------------------------------
# sketch_kmv_jaccard
# --------------------------------------------------------------------------

_KMV_K = 64

_KMV_ORACLE = f"""
WITH toks AS (
  SELECT source, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
dw AS (
  SELECT DISTINCT source,
         unnest(list_transform(range(1, len(t) - 1),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
  FROM toks WHERE len(t) >= 3
),
h AS (SELECT DISTINCT source, md5(sh) AS h FROM dw),
sk AS (
  SELECT source, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM h QUALIFY rk <= {_KMV_K}
),
est AS (
  SELECT source,
         FLOOR(({_KMV_K} - 1)
               / (('0x' || substr(MAX(CASE WHEN rk = {_KMV_K} THEN h END),
                                  1, 12))::BIGINT / 281474976710656.0)
               * 1e6) / 1e6 AS est_distinct
  FROM sk GROUP BY source
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM (SELECT DISTINCT source FROM sk) a
  JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
),
cand AS (
  SELECT p.source_a, p.source_b, s.h,
         MAX(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.source IN (p.source_a, p.source_b)
  GROUP BY p.source_a, p.source_b, s.h
),
merged AS (
  SELECT source_a, source_b, h, in_a, in_b,
         ROW_NUMBER() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rk
  FROM cand QUALIFY rk <= {_KMV_K}
),
pair_est AS (
  SELECT source_a, source_b,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_common,
         CAST(SUM(in_a * in_b) * 1000000 // {_KMV_K} AS BIGINT)
           AS est_jaccard_ppm,
         FLOOR(({_KMV_K} - 1)
               / (('0x' || substr(MAX(CASE WHEN rk = {_KMV_K} THEN h END),
                                  1, 12))::BIGINT / 281474976710656.0)
               * 1e6) / 1e6 AS est_union
  FROM merged GROUP BY source_a, source_b
)
SELECT p.source_a, p.source_b, p.n_common, p.est_jaccard_ppm, p.est_union,
       ea.est_distinct AS est_distinct_a, eb.est_distinct AS est_distinct_b
FROM pair_est p
JOIN est ea ON ea.source = p.source_a
JOIN est eb ON eb.source = p.source_b
ORDER BY p.source_a, p.source_b
"""


@register("sketch_kmv_jaccard", oracle=_KMV_ORACLE)
def sketch_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketches (K=64, md5 hash space) built
    per source over the 3-word shingle universe (the dedup family's
    shingle convention, operators/dedup.py::shingle_sets), then merged
    pairwise: the union-size estimate is (K-1)/h_K of the merged sketch
    and the Jaccard estimate is the fraction of the merged sketch present
    in BOTH input sketches — the classic KMV set-operation estimator, the
    capability (intersections) HLL sketches cannot express. md5 makes the
    sketch deterministic across runs AND engines; hash order is
    lexicographic on the hex string in both, and h_K's numeric image is
    the first 48 bits. At 100 TB the per-source sketch build is two
    partial-aggregated shuffles (shingle join + distinct) feeding a
    bounded per-source top-K; everything after the sketch tables is
    ~sources² × K rows — driver-scale, the point of sketching."""
    from sdg_data_catalog_spark.operators import dedup as D

    docs = table(spark, sf_dir, "documents")
    dw = (
        D.shingles(docs.select("doc_id", "text"))
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", F.md5("sh").alias("h"))
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        dw.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .localCheckpoint(eager=True)  # tiny (sources × K); many consumers
    )

    def est_distinct(hcol: Column) -> Column:
        v = F.conv(F.substring(hcol, 1, 12), 16, 10).cast("long") / F.lit(
            281474976710656.0
        )
        return F.floor(F.lit(_KMV_K - 1) / v * 1e6) / 1e6

    est = sk.groupBy("source").agg(
        est_distinct(F.max(F.when(F.col("rk") == _KMV_K, F.col("h")))).alias(
            "est_distinct"
        )
    )
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
    )
    cand = (
        pairs.join(
            sk.select("source", "h"),
            (F.col("source") == F.col("source_a"))
            | (F.col("source") == F.col("source_b")),
        )
        .groupBy("source_a", "source_b", "h")
        .agg(
            F.max(F.when(F.col("source") == F.col("source_a"), 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col("source") == F.col("source_b"), 1).otherwise(0)).alias(
                "in_b"
            ),
        )
    )
    wm = Window.partitionBy("source_a", "source_b").orderBy("h")
    merged = cand.withColumn("rk", F.row_number().over(wm)).filter(
        F.col("rk") <= _KMV_K
    )
    pair_est = merged.groupBy("source_a", "source_b").agg(
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_common"),
        F.expr(f"CAST(SUM(in_a * in_b) * 1000000 DIV {_KMV_K} AS BIGINT)").alias(
            "est_jaccard_ppm"
        ),
        est_distinct(F.max(F.when(F.col("rk") == _KMV_K, F.col("h")))).alias(
            "est_union"
        ),
    )
    return (
        pair_est.join(
            F.broadcast(est.withColumnRenamed("est_distinct", "est_distinct_a")),
            F.col("source") == F.col("source_a"),
        )
        .drop("source")
        .join(
            F.broadcast(
                est.withColumnRenamed("est_distinct", "est_distinct_b")
            ),
            F.col("source") == F.col("source_b"),
        )
        .drop("source")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "est_jaccard_ppm",
            "est_union",
            "est_distinct_a",
            "est_distinct_b",
        )
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------------------------------------
# curation_domain_mix
# --------------------------------------------------------------------------


@register(
    "curation_domain_mix",
    oracle="""
    WITH d AS (
      SELECT source,
             len(list_filter(
               string_split_regex(lower(COALESCE(text, '')), '[^a-z]+'),
               x -> x <> '')) AS nw
      FROM documents
    ),
    g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(nw) AS BIGINT) AS tokens
          FROM d GROUP BY source),
    t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS n_sources FROM g)
    SELECT g.source, g.n_docs, g.tokens,
           CAST(g.tokens * 1000000 // t.total AS BIGINT) AS share_ppm,
           CAST(1000000 // t.n_sources AS BIGINT) AS target_ppm,
           CAST(LEAST((1000000 // t.n_sources) * 1000000
                      // GREATEST(g.tokens * 1000000 // t.total, 1),
                      5000000) AS BIGINT) AS weight_ppm
    FROM g CROSS JOIN t ORDER BY g.source
    """,
)
def curation_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-lite domain-mixture reweighting: per-source token share vs
    a uniform target mix, with the resampling weight target/actual capped
    at 5x — the knob a pretraining pipeline turns to rebalance scraped
    domains before sampling. All shares and weights are exact ppm
    integers (floor division), so the report hash-matches across engines.
    Scale shape: one narrow projection (token counts from the standard
    [a-z]+ tokenization), a partially-aggregated groupBy to ~sources
    rows, and a broadcast of the 1-row total — no corpus-sized shuffle
    anywhere."""
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "source", F.size(_toks(F.coalesce(F.col("text"), F.lit("")))).alias("nw")
    )
    g = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nw").cast("bigint").alias("tokens"),
        )
        .localCheckpoint(eager=True)  # |sources| rows; total + output consume it
    )
    t = g.agg(
        F.sum("tokens").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.expr("CAST(tokens * 1000000 DIV total AS BIGINT)").alias("share_ppm"),
            F.expr("CAST(1000000 DIV n_sources AS BIGINT)").alias("target_ppm"),
            F.expr(
                "CAST(LEAST((1000000 DIV n_sources) * 1000000"
                " DIV GREATEST(tokens * 1000000 DIV total, 1),"
                " 5000000) AS BIGINT)"
            ).alias("weight_ppm"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# agg_winsorized_mean
# --------------------------------------------------------------------------


def _grouped_rank(
    df: DataFrame, group_col: str, order_cols: list[str], out_col: str
) -> DataFrame:
    """Per-group global rank without a per-group corpus-wide sort window:
    range-repartition on (group, *order), rank within each (partition,
    group) slice, then add per-(partition, group) prefix offsets computed
    from a tiny driver-side aggregate — the grouped generalization of
    operators/curation.py::running_total. Scales like a sort even when a
    single group holds most of the corpus."""
    cols = [F.col(group_col)] + [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(32, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = (
        ranged.groupBy("__pid", group_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    acc: dict[str, int] = {}
    offsets = {}
    for r in sorted(counts, key=lambda r: (r[group_col], r["__pid"])):
        key = f"{r['__pid']}:{r[group_col]}"
        offsets[key] = acc.get(r[group_col], 0)
        acc[r[group_col]] = offsets[key] + r["c"]
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("__pid", group_col).orderBy(*order_cols)
    okey = F.concat_ws(":", F.col("__pid").cast("string"), F.col(group_col))
    return ranged.withColumn(
        out_col, F.row_number().over(w) + F.coalesce(omap[okey], F.lit(0))
    ).drop("__pid")


@register(
    "agg_winsorized_mean",
    oracle="""
    WITH v AS (
      SELECT event_type, event_id,
             CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    r AS (
      SELECT event_type, img,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY img, event_id) AS rk,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    b AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MAX(CASE WHEN rk = GREATEST(1, n * 5 // 100) THEN img END) AS lo,
             MAX(CASE WHEN rk = n - GREATEST(1, n * 5 // 100) + 1
                 THEN img END) AS hi
      FROM r GROUP BY event_type
    )
    SELECT r.event_type, b.n,
           CAST(b.lo AS DOUBLE) / 1e6 AS p05,
           CAST(b.hi AS DOUBLE) / 1e6 AS p95,
           CAST(SUM(LEAST(GREATEST(r.img, b.lo), b.hi)) // b.n AS DOUBLE)
             / 1e6 AS winsorized_mean,
           CAST(SUM(r.img) // b.n AS DOUBLE) / 1e6 AS raw_mean
    FROM r JOIN b ON r.event_type = b.event_type
    GROUP BY r.event_type, b.n, b.lo, b.hi
    ORDER BY r.event_type
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group mean: clamp each value to its group's exact
    [p05, p95] order statistics, then average — the outlier-resistant
    aggregate a metrics pipeline uses where a single bad row would move a
    plain mean. Values are ranked and clamped on their micro-unit integer
    image, so boundaries, clamps, and sums are all exact integers; the
    mean is one floor division. The per-group rank is a GROUPED two-phase
    global rank (`_grouped_rank`): range-repartition on (group, value,
    id), per-slice windows, broadcast prefix offsets — a group holding
    90% of the corpus still ranks in parallel across partitions, where a
    naive `Window.partitionBy(group)` would sort it on one task."""
    from pyspark import StorageLevel

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1e6).cast("long").alias("img"),
    )
    ranked = _grouped_rank(ev, "event_type", ["img", "event_id"], "rk").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_g = ranked.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    lo_rk = F.greatest(F.lit(1), F.expr("n * 5 DIV 100"))
    bounds = (
        ranked.join(F.broadcast(n_g), "event_type")
        .filter(
            (F.col("rk") == lo_rk) | (F.col("rk") == F.col("n") - lo_rk + 1)
        )
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.min(
                F.when(F.col("rk") == lo_rk, F.col("img"))
            ).alias("lo"),
            F.max(
                F.when(F.col("rk") == F.col("n") - lo_rk + 1, F.col("img"))
            ).alias("hi"),
        )
    )
    out = (
        ranked.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "n", "lo", "hi")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("img"), F.col("lo")), F.col("hi"))
            ).alias("wsum"),
            F.sum("img").alias("rsum"),
        )
        .select(
            "event_type",
            "n",
            (F.col("lo").cast("double") / 1e6).alias("p05"),
            (F.col("hi").cast("double") / 1e6).alias("p95"),
            (F.expr("wsum DIV n").cast("double") / 1e6).alias("winsorized_mean"),
            (F.expr("rsum DIV n").cast("double") / 1e6).alias("raw_mean"),
        )
        .orderBy("event_type")
    )
    return out
