"""Round-9 operator batch 1: data-mixing and corpus-audit operators an
LLM training-data pipeline runs between curation and epoch planning.

- ``curation_mix_temperature`` — temperature-scaled source sampling
  weights (the multilingual-corpus re-balancing rule of XLM-R, Conneau
  et al. 2019: q_d ∝ p_d^τ, τ=0.7) plus the effective-epoch count each
  source runs at under a fixed token budget — the knob that decides
  how hard low-resource sources are oversampled.
- ``curation_doremi_weights`` — DoReMi-style domain reweighting (Xie
  et al. 2023): one exponentiated-gradient step from uniform on the
  per-domain EXCESS loss (proxy − reference), the published recipe for
  learning domain weights without training on every mixture.
- ``curation_cartography`` — dataset cartography (Swayamdipta et al.
  2020): per-document confidence/variability over K=5 scoring epochs,
  rolled up into the easy-to-learn / hard-to-learn / ambiguous regions
  that decide what to keep, relabel, or downweight.
- ``text_code_detect`` — code-vs-prose detection per document (symbol
  density + keyword hits, integer cross-product verdicts); the
  code-fraction audit every mixed web corpus needs before setting a
  code mixing ratio.
- ``dq_unicode_audit`` — per-source codepoint-class profile (ASCII
  letters, digits, non-ASCII, U+FFFD replacement characters) — the
  mojibake / encoding-health gate run at ingest.

Determinism: model losses and epoch scores are md5-derived integers
(the rank_al_* table convention); every cross-source normalization sums
FLOOR(·10⁹) integer images (exp/ln chains run on exact integer inputs,
identical on both engines — the curation_cluster_balance precedent);
verdicts compare integer cross-products, never float thresholds.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_CHAR_BUDGET = 10_000_000  # mix-planning char budget (stands in for tokens)


def _md5_mod(col, salt: str, mod: int):
    """md5(col || salt) -> integer in [0, mod) — identical on both engines
    (DuckDB twin: ('0x' || substr(md5(x || salt), 1, 15))::BIGINT % mod)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(col.cast("string"), F.lit(salt))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % mod
    )


@register(
    "curation_mix_temperature",
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sz
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(sz) AS BIGINT) AS total FROM s),
    w AS (
      SELECT s.source, s.n_docs, s.sz, t.total,
             CAST(FLOOR(exp(0.7 * ln(CAST(s.sz AS DOUBLE) / t.total)) * 1e9)
                  AS BIGINT) AS pw_img
      FROM s CROSS JOIN t
    ),
    z AS (SELECT CAST(SUM(pw_img) AS BIGINT) AS zsum FROM w)
    SELECT w.source, w.n_docs, w.sz AS n_chars_total,
           ROUND(CAST(w.sz AS DOUBLE) / w.total, 6) AS p_natural,
           ROUND(CAST(w.pw_img AS DOUBLE) / z.zsum, 6) + 0.0 AS q_temp,
           ROUND(CAST(w.pw_img AS DOUBLE) / z.zsum * {_CHAR_BUDGET} / w.sz, 6)
             AS effective_epochs
    FROM w CROSS JOIN z ORDER BY w.source
    """,
)
def curation_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights: q_d ∝ p_d^τ (τ=0.7,
    the XLM-R multilingual rebalancing rule — Conneau et al. 2019,
    arXiv:1911.02116) over per-source char mass, plus the effective
    epoch count q_d·BUDGET/size_d each source runs at under a fixed
    char budget — >1 means the source repeats, the number epoch
    planning reads first. p_d^τ is exp(τ·ln p) on exact integer inputs
    (identical IEEE chain both engines), and the normalizer sums
    FLOOR(·10⁹) integer images so the cross-source sum is exact. One
    |sources|-row aggregate; two broadcast 1-row totals."""
    s = (
        table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sz"),
        )
        .localCheckpoint(eager=True)  # |sources| rows; totals + output
    )
    t = s.agg(F.sum("sz").cast("bigint").alias("total"))
    w = s.crossJoin(F.broadcast(t)).withColumn(
        "pw_img",
        F.floor(
            F.exp(0.7 * F.log(F.col("sz").cast("double") / F.col("total")))
            * 1e9
        ).cast("bigint"),
    )
    z = w.agg(F.sum("pw_img").cast("bigint").alias("zsum"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            F.col("sz").alias("n_chars_total"),
            F.round(F.col("sz").cast("double") / F.col("total"), 6).alias(
                "p_natural"
            ),
            (
                F.round(F.col("pw_img").cast("double") / F.col("zsum"), 6)
                + 0.0
            ).alias("q_temp"),
            F.round(
                F.col("pw_img").cast("double")
                / F.col("zsum")
                * _CHAR_BUDGET
                / F.col("sz"),
                6,
            ).alias("effective_epochs"),
        )
        .orderBy("source")
    )


@register(
    "curation_doremi_weights",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':proxy'),
                                  1, 15)) AS BIGINT) % 4001 AS lp_milli,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ref'),
                                  1, 15)) AS BIGINT) % 3001 AS lr_milli
      FROM documents
    ),
    g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(lp_milli) AS BIGINT) AS sp,
             CAST(SUM(lr_milli) AS BIGINT) AS sr
      FROM d GROUP BY source
    ),
    w AS (
      SELECT source, n_docs, sp, sr,
             CAST(FLOOR(exp(CAST(sp - sr AS DOUBLE) / (n_docs * 1000.0))
                        * 1e9) AS BIGINT) AS w_img
      FROM g
    ),
    z AS (SELECT CAST(SUM(w_img) AS BIGINT) AS zsum FROM w)
    SELECT w.source, w.n_docs,
           ROUND(CAST(w.sp AS DOUBLE) / (w.n_docs * 1000.0), 6)
             AS avg_proxy_nats,
           ROUND(CAST(w.sr AS DOUBLE) / (w.n_docs * 1000.0), 6)
             AS avg_ref_nats,
           ROUND(CAST(w.sp - w.sr AS DOUBLE) / (w.n_docs * 1000.0), 6) + 0.0
             AS excess_nats,
           ROUND(CAST(w.w_img AS DOUBLE) / z.zsum, 6) AS domain_weight
    FROM w CROSS JOIN z ORDER BY w.source
    """,
)
def curation_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi domain reweighting (Xie et al. 2023, arXiv:2305.10429),
    one exponentiated-gradient step from uniform: each domain's weight
    is exp(η·excess_d) normalized, where excess_d is the domain's mean
    proxy-model loss minus its mean reference-model loss (η=1) — domains
    the proxy finds HARD relative to the reference get upweighted. The
    stand-in per-doc losses are md5-derived milli-nat integers (exact
    DECIMAL sums, so the domain means are single identical double
    chains); the weight normalizer sums FLOOR(exp(·)·10⁹) integer
    images. One corpus pass, |domains|-row algebra."""
    d = table(spark, sf_dir, "documents").select(
        "source",
        _md5_mod(F.col("doc_id"), ":proxy", 4001).alias("lp_milli"),
        _md5_mod(F.col("doc_id"), ":ref", 3001).alias("lr_milli"),
    )
    g = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("lp_milli").cast("bigint").alias("sp"),
            F.sum("lr_milli").cast("bigint").alias("sr"),
        )
        .localCheckpoint(eager=True)  # |sources| rows
    )
    w = g.withColumn(
        "w_img",
        F.floor(
            F.exp((F.col("sp") - F.col("sr")).cast("double") / (F.col("n_docs") * 1000.0))
            * 1e9
        ).cast("bigint"),
    )
    z = w.agg(F.sum("w_img").cast("bigint").alias("zsum"))
    nd1000 = F.col("n_docs") * 1000.0
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            F.round(F.col("sp").cast("double") / nd1000, 6).alias("avg_proxy_nats"),
            F.round(F.col("sr").cast("double") / nd1000, 6).alias("avg_ref_nats"),
            (
                F.round((F.col("sp") - F.col("sr")).cast("double") / nd1000, 6)
                + 0.0
            ).alias("excess_nats"),
            F.round(F.col("w_img").cast("double") / F.col("zsum"), 6).alias(
                "domain_weight"
            ),
        )
        .orderBy("source")
    )


@register(
    "curation_cartography",
    oracle="""
    WITH sc AS (
      SELECT d.doc_id,
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#'
                                      || CAST(k.i AS VARCHAR)), 1, 15))
                  AS BIGINT) % 1000 AS h
      FROM documents d CROSS JOIN range(5) k(i)
    ),
    per_doc AS (
      SELECT doc_id, CAST(SUM(h) AS BIGINT) AS s1,
             CAST(SUM(h * h) AS BIGINT) AS s2
      FROM sc GROUP BY doc_id
    ),
    cls AS (
      SELECT doc_id, s1,
             5 * s2 - s1 * s1 AS var_num,
             CAST(FLOOR(sqrt(CAST(5 * s2 - s1 * s1 AS DOUBLE)) / 4995 * 1e6)
                  AS BIGINT) AS var_img,
             CASE WHEN 16 * (5 * s2 - s1 * s1) >= 25 * 999 * 999
                    THEN 'ambiguous'
                  WHEN 2 * s1 >= 4995 THEN 'easy'
                  ELSE 'hard' END AS region
      FROM per_doc
    )
    SELECT region, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(s1) AS DOUBLE) / (COUNT(*) * 4995.0), 6)
             AS avg_confidence,
           ROUND(CAST(SUM(var_img) AS DOUBLE) / (COUNT(*) * 1e6), 6)
             AS avg_variability
    FROM cls GROUP BY region ORDER BY region
    """,
)
def curation_cartography(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset cartography (Swayamdipta et al. 2020, arXiv:2009.10795):
    each document's CONFIDENCE (mean correctness score over K=5 epochs)
    and VARIABILITY (population std of those scores) place it in the
    easy-to-learn / hard-to-learn / ambiguous map regions — the triage
    that decides what to keep (easy), audit for label noise (hard), or
    prize for generalization (ambiguous). Epoch scores are md5-derived
    integers in [0,999], so s1/s2 are exact; region boundaries are pure
    integer cross-products (2·s1 ≥ K·999 for conf ≥ ½; 16·(K·s2−s1²) ≥
    25·999² for std ≥ ¼); the per-doc variability enters the rollup as
    a FLOOR(·10⁶) image of a sqrt on exact integers. K scores come from
    one explode — map-side; the only shuffle is the per-doc aggregate
    and the 3-row region rollup."""
    sc = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(4))).alias("i")
    ).select(
        "doc_id",
        _md5_mod(
            F.concat(F.col("doc_id").cast("string"), F.lit("#"), F.col("i").cast("string")),
            "",
            1000,
        ).alias("h"),
    )
    per_doc = sc.groupBy("doc_id").agg(
        F.sum("h").cast("bigint").alias("s1"),
        F.sum(F.col("h") * F.col("h")).cast("bigint").alias("s2"),
    )
    var_num = 5 * F.col("s2") - F.col("s1") * F.col("s1")
    cls = per_doc.select(
        "s1",
        F.floor(F.sqrt(var_num.cast("double")) / 4995 * 1e6)
        .cast("bigint")
        .alias("var_img"),
        F.when(16 * var_num >= 25 * 999 * 999, "ambiguous")
        .when(2 * F.col("s1") >= 4995, "easy")
        .otherwise("hard")
        .alias("region"),
    )
    return (
        cls.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(
                F.sum("s1").cast("double") / (F.count(F.lit(1)) * 4995.0), 6
            ).alias("avg_confidence"),
            F.round(
                F.sum("var_img").cast("double") / (F.count(F.lit(1)) * 1e6), 6
            ).alias("avg_variability"),
        )
        .orderBy("region")
    )


_CODE_SALT_SQL = (
    "' def f' || CAST(doc_id AS VARCHAR) || '(x): return (x * '"
    " || CAST(doc_id % 7 AS VARCHAR) || '); // id=' || CAST(doc_id AS VARCHAR)"
    " || ' {arr[' || CAST(doc_id % 5 AS VARCHAR) || ']};'"
)


@register(
    "text_code_detect",
    oracle=f"""
    WITH seeded AS (
      SELECT source,
             CASE WHEN doc_id % 4 = 0 THEN text || {_CODE_SALT_SQL}
                  ELSE text END AS t
      FROM documents
    ),
    h AS (
      SELECT source, length(t) AS n,
             len(regexp_extract_all(t, '[{{}}()\\[\\];=<>]')) AS sym,
             (CASE WHEN contains(t, ' def ') THEN 1 ELSE 0 END
              + CASE WHEN contains(t, 'return') THEN 1 ELSE 0 END
              + CASE WHEN contains(t, 'import ') THEN 1 ELSE 0 END) AS kw
      FROM seeded
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN 40 * sym > n AND kw >= 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_code_docs,
           ROUND(CAST(SUM(sym) AS DOUBLE) * 1000 / SUM(n), 6)
             AS sym_per_1k_chars,
           CAST(SUM(kw) AS BIGINT) AS kw_hits
    FROM h GROUP BY source ORDER BY source
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose audit per source: symbol density ({{}}()[];=<>
    per char) and code-keyword hits (' def ', 'return', 'import '),
    verdict 40·symbols > chars AND ≥1 keyword — integer cross-products,
    no float thresholds. Every 4th document is salted with a
    deterministic doc_id-derived code snippet (same expression both
    engines — the curation_pii_risk_report convention) so the audit
    exercises mixed sources on the synthetic corpus. This is the
    code-fraction number a mixed web corpus needs before choosing a
    code mixing ratio (code data measurably moves reasoning metrics —
    the audit must come first). Map-side regexp counts; one
    |sources|-row aggregate."""
    salted = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.col("text"),
            F.lit(" def f"),
            F.col("doc_id").cast("string"),
            F.lit("(x): return (x * "),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("); // id="),
            F.col("doc_id").cast("string"),
            F.lit(" {arr["),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("]};"),
        ),
    ).otherwise(F.col("text"))
    kw = (
        F.when(F.col("t").contains(" def "), 1).otherwise(0)
        + F.when(F.col("t").contains("return"), 1).otherwise(0)
        + F.when(F.col("t").contains("import "), 1).otherwise(0)
    )
    h = (
        table(spark, sf_dir, "documents")
        .select("source", salted.alias("t"))
        .select(
            "source",
            F.length("t").alias("n"),
            F.regexp_count(F.col("t"), F.lit(r"[{}()\[\];=<>]")).alias("sym"),
            kw.alias("kw"),
        )
    )
    return (
        h.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when((40 * F.col("sym") > F.col("n")) & (F.col("kw") >= 1), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_code_docs"),
            F.round(F.sum("sym").cast("double") * 1000 / F.sum("n"), 6).alias(
                "sym_per_1k_chars"
            ),
            F.sum("kw").cast("bigint").alias("kw_hits"),
        )
        .orderBy("source")
    )


_UNI_SALT_SQL = (
    "' café 中文语料 naïve résumé'"
    " || CASE WHEN doc_id % 10 = 0 THEN ' ��' ELSE '' END"
)


@register(
    "dq_unicode_audit",
    oracle=f"""
    WITH seeded AS (
      SELECT source,
             CASE WHEN doc_id % 5 = 0 THEN text || {_UNI_SALT_SQL}
                  ELSE text END AS t
      FROM documents
    ),
    h AS (
      SELECT source, length(t) AS n,
             len(regexp_extract_all(t, '[A-Za-z]')) AS ascii_letters,
             len(regexp_extract_all(t, '[0-9]')) AS digits,
             len(regexp_extract_all(t, '[^\\x00-\\x7f]')) AS non_ascii,
             len(regexp_extract_all(t, '�')) AS repl
      FROM seeded
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(ascii_letters) AS DOUBLE) / SUM(n), 6)
             AS ascii_letter_ratio,
           ROUND(CAST(SUM(digits) AS DOUBLE) / SUM(n), 6) AS digit_ratio,
           ROUND(CAST(SUM(non_ascii) AS DOUBLE) * 10000 / SUM(n), 6)
             AS non_ascii_per_10k,
           CAST(SUM(repl) AS BIGINT) AS replacement_chars,
           CAST(SUM(CASE WHEN repl > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_mojibake
    FROM h GROUP BY source ORDER BY source
    """,
)
def dq_unicode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source encoding-health profile: ASCII-letter and digit
    ratios, non-ASCII codepoints per 10k chars, and U+FFFD replacement
    characters (each one is a decode that already went wrong upstream —
    the mojibake gate every multilingual ingest runs). Every 5th
    document is salted with deterministic accented/CJK text and every
    10th additionally with U+FFFD, so the audit exercises non-trivial
    classes on the ASCII synthetic corpus. Both engines count CODE
    POINTS (Spark length()/DuckDB length() and regexp classes are
    codepoint-wise on UTF-8). Map-side regexp counts; one
    |sources|-row aggregate."""
    salt = F.concat(
        F.col("text"),
        F.lit(" café 中文语料 naïve résumé"),
        F.when(F.col("doc_id") % 10 == 0, F.lit(" ��")).otherwise(
            F.lit("")
        ),
    )
    seeded = table(spark, sf_dir, "documents").select(
        "source",
        F.when(F.col("doc_id") % 5 == 0, salt).otherwise(F.col("text")).alias("t"),
    )
    h = seeded.select(
        "source",
        F.length("t").alias("n"),
        F.regexp_count(F.col("t"), F.lit("[A-Za-z]")).alias("ascii_letters"),
        F.regexp_count(F.col("t"), F.lit("[0-9]")).alias("digits"),
        F.regexp_count(F.col("t"), F.lit(r"[^\x00-\x7F]")).alias("non_ascii"),
        F.regexp_count(F.col("t"), F.lit("�")).alias("repl"),
    )
    return (
        h.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_chars"),
            F.round(F.sum("ascii_letters").cast("double") / F.sum("n"), 6).alias(
                "ascii_letter_ratio"
            ),
            F.round(F.sum("digits").cast("double") / F.sum("n"), 6).alias(
                "digit_ratio"
            ),
            F.round(
                F.sum("non_ascii").cast("double") * 10000 / F.sum("n"), 6
            ).alias("non_ascii_per_10k"),
            F.sum("repl").cast("bigint").alias("replacement_chars"),
            F.sum(F.when(F.col("repl") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_with_mojibake"),
        )
        .orderBy("source")
    )
