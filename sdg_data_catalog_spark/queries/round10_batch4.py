"""Round-10 operator batch 4: approximate string matching and
rank-frequency law fitting.

- ``join_editdistance_blocked`` — typo/variant pairing over the corpus
  vocabulary via FastSS deletion-neighborhood blocking (Bocek et al.
  2007): two words are within edit distance 1 iff their 1-deletion
  neighborhoods (word included) intersect, so candidates come from ONE
  equi-join on deletion keys — never an all-pairs vocabulary scan — and
  a JVM-side levenshtein verifies. The record-linkage rung between
  exact dedup and MinHash.
- ``agg_zipf_fit`` — Zipf's-law exponent per language: log-log OLS of
  frequency on rank over the top-30 word ranks. The third leg of the
  vocabulary-statistics triad (text_heaps_law: growth curve,
  agg_chao1_richness: unseen mass, this: head shape) that decides
  whether a corpus slice looks like natural language.

Determinism: deletion keys and edit distances are exact string/integer
computations; Zipf ranks tie-break on the word; ln() terms enter as
FLOOR(·10⁶) images of exact integer counts and OLS runs on those
integer images only. Reference analog: none direct — SURVEY §2.11
north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


@register(
    "join_editdistance_blocked",
    oracle="""
    WITH vocab AS (
        SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    keys AS (
        SELECT w, w AS k FROM vocab
        UNION
        SELECT w, unnest(list_transform(
                   generate_series(1, len(w)),
                   i -> substr(w, 1, i - 1) || substr(w, i + 1))) AS k
        FROM vocab
    ),
    cand AS (
        SELECT DISTINCT a.w AS word_a, b.w AS word_b
        FROM keys a JOIN keys b ON a.k = b.k AND a.w < b.w
    )
    SELECT word_a, word_b,
           CAST(levenshtein(word_a, word_b) AS BIGINT) AS dist
    FROM cand
    WHERE levenshtein(word_a, word_b) = 1
    ORDER BY word_a, word_b
    """,
)
def join_editdistance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vocabulary word pairs at edit distance exactly 1, found with
    FastSS deletion-neighborhood blocking: each word emits itself plus
    its |w| one-deletion variants as join keys; ed(u,v) ≤ 1 ⟹ the key
    sets intersect (substitution → shared deletion at the edited
    position; insertion/deletion → one side's deletion equals the
    other), so one equi-join on the key column generates every
    candidate and `levenshtein` (JVM-side codegen) verifies. Key volume
    is Σ|w|+1 per DISTINCT word — bounded by vocabulary, not corpus —
    and the join shuffles on short-string keys; an all-pairs verify
    would be |vocab|² levenshteins. The approximate-string-matching
    rung of the record-linkage ladder."""
    docs = table(spark, sf_dir, "documents")
    vocab = docs.select(F.explode(F.split("text", " ")).alias("w")).distinct()
    deletions = vocab.select(
        "w",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w)),"
                " i -> concat(substring(w, 1, i - 1), substring(w, i + 1)))"
            )
        ).alias("k"),
    )
    keys = (
        vocab.select("w", F.col("w").alias("k"))
        .unionAll(deletions)
        .distinct()
        # vocabulary-sized (Σ|w|+1 keys) — checkpoint once so the self-join
        # does not re-expand the corpus scan on both sides (the registry
        # scan gate allows ≤2 scans per corpus table)
        .localCheckpoint(eager=False)
    )
    a = keys.select(F.col("w").alias("word_a"), "k")
    b = keys.select(F.col("w").alias("word_b"), "k")
    cand = (
        a.join(b, "k")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        .distinct()
    )
    dist = F.levenshtein("word_a", "word_b")
    return (
        cand.withColumn("dist", dist.cast("bigint"))
        .filter(F.col("dist") == 1)
        .orderBy("word_a", "word_b")
    )


_ZIPF_TOP = 30


@register(
    "agg_zipf_fit",
    oracle=f"""
    WITH wc AS (
        SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY lang, w
    ),
    ranked AS (
        SELECT lang, c,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY c DESC, w) AS r
        FROM wc
    ),
    pts AS (
        SELECT lang,
               FLOOR(1e6 * ln(CAST(r AS DOUBLE))) AS x,
               FLOOR(1e6 * ln(CAST(c AS DOUBLE))) AS y
        FROM ranked WHERE r <= {_ZIPF_TOP}
    ),
    fit AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pts GROUP BY lang
    )
    SELECT lang, n,
           CAST(FLOOR(1e6 * (CAST(n * sxy - sx * sy AS DOUBLE)
                             / (n * sxx - sx * sx))) AS BIGINT)
             AS slope_x1e6,
           CAST(FLOOR((sy - FLOOR(1e6 * (CAST(n * sxy - sx * sy AS DOUBLE)
                                         / (n * sxx - sx * sx)))
                            * CAST(sx AS DOUBLE) / 1e6)
                      / n) AS BIGINT) AS intercept_x1e6
    FROM fit ORDER BY lang
    """,
)
def agg_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent per language: OLS slope of FLOOR(1e6·ln c) on
    FLOOR(1e6·ln r) over the top-30 word ranks (count-desc, word-asc
    tie-break — deterministic on both engines). Natural text fits slope
    ≈ −1; spam/template corpora flatten or cliff. All OLS moments are
    exact integer sums of the floored log images, so the fitted slope is
    a deterministic function of exact integers; the rank window
    partitions by lang over the VOCABULARY relation (bounded sublinear
    in corpus size — the same justification as text_heaps_law's
    checkpoint table). Completes the vocabulary triad: Heaps (growth),
    Chao1 (unseen mass), Zipf (head shape)."""
    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    r = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.col("c").desc(), "w")
    )
    pts = (
        wc.withColumn("r", r)
        .filter(F.col("r") <= _ZIPF_TOP)
        .select(
            "lang",
            F.floor(1e6 * F.log(F.col("r").cast("double"))).alias("x"),
            F.floor(1e6 * F.log(F.col("c").cast("double"))).alias("y"),
        )
    )
    fit = pts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    slope = F.floor(
        1e6
        * (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        )
    ).cast("bigint")
    intercept = F.floor(
        (
            F.col("sy")
            - slope * F.col("sx").cast("double") / 1e6
        )
        / F.col("n")
    ).cast("bigint")
    return fit.select(
        "lang", "n", slope.alias("slope_x1e6"), intercept.alias("intercept_x1e6")
    ).orderBy("lang")
