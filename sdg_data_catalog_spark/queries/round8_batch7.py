"""Round-8 operator batch 7: weighting diagnostics, sketch calibration,
and windowed collocations.

- `agg_effective_sample_size`: Kish ESS of the SoftDedup weighting —
  the number that says what a reweighted corpus is WORTH in iid
  samples. For 1/cluster_size weights the algebra collapses exactly:
  sum(w) over docs = #clusters, sum(w^2) = sum over clusters of 1/c,
  so ESS = K^2 / sum(1/c) — computed from the cluster-size census.
- `dedup_minhash_est_vs_exact`: calibration audit of the MinHash
  estimator on the LSH candidate pairs — estimated Jaccard (fraction
  of agreeing signature components) beside the exact shingle Jaccard,
  with the absolute error. The readout that justifies (or indicts) a
  chosen K before a 100-TB dedup run trusts the sketch.
- `text_window_npmi`: normalized PMI over a +/-2 token co-occurrence
  window — the collocation measure word-embedding and phrase work
  actually uses (adjacent-bigram PMI misses "hash ... join" with one
  token between; NPMI's [-1,1] range is comparable across corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.functions.hashing import (
    MINHASH_K,
    MINHASH_P,
    minhash_value_sql,
)
from sdg_data_catalog_spark.operators import dedup as D
from sdg_data_catalog_spark.queries.dedup_similarity import (
    _BANDS_SQL,
    _CORPUS_SQL,
    _near_dup_corpus,
    _SHINGLE_SQL,
    _SIG_SQL,
    _XP_SQL,
)
from sdg_data_catalog_spark.queries.registry import register

_FP_SQL = "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"


@register(
    "agg_effective_sample_size",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id % 3 = 0
    ),
    sig AS (SELECT doc_id, {_FP_SQL} AS h FROM corpus),
    c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS cs FROM sig GROUP BY h),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(cs) AS BIGINT) AS n,
             SUM(CAST(FLOOR(1e12 / cs) AS BIGINT)) AS inv
      FROM c
    )
    SELECT n AS n_docs, k AS n_clusters,
           FLOOR(CAST(k AS DOUBLE) * k / (CAST(inv AS DOUBLE) / 1e12) * 1e6)
             / 1e6 AS ess,
           FLOOR(CAST(k AS DOUBLE) * k / (CAST(inv AS DOUBLE) / 1e12)
                 / n * 1e6) / 1e6 AS ess_ratio
    FROM s
    """,
)
def agg_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of the SoftDedup 1/cluster_size
    weighting (Kish 1965: ESS = (sum w)^2 / sum w^2): what the
    reweighted corpus is worth in unweighted iid documents — THE
    downstream number for curation_soft_dedup_weights (a corpus of 1.5M
    rows at ESS 0.9M buys 0.9M documents of gradient signal). For
    1/c weights the sums collapse per CLUSTER: each c-sized cluster
    contributes exactly 1 to sum(w) and 1/c to sum(w^2), so
    ESS = K^2 / sum_clusters(1/c) — everything computes on the
    cluster-size census, one corpus pass upstream.

    Exactness: sum(1/c) is an integer sum of per-cluster floor(1e12/c)
    images (exact rationals — the dq_benford convention), never an
    order-sensitive float sum; two double divisions at the end."""
    docs = table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    sig = corpus.select(
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
        ).alias("h")
    )
    c = sig.groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("cs"))
    s = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("cs").cast("bigint").alias("n"),
        F.sum(F.floor(F.lit(1e12) / F.col("cs")).cast("bigint")).alias("inv"),
    )
    ess = (
        F.col("k").cast("double")
        * F.col("k")
        / (F.col("inv").cast("double") / 1e12)
    )
    return s.select(
        F.col("n").alias("n_docs"),
        F.col("k").alias("n_clusters"),
        (F.floor(ess * 1e6) / 1e6).alias("ess"),
        (F.floor(ess / F.col("n") * 1e6) / 1e6).alias("ess_ratio"),
    )


@register(
    "dedup_minhash_est_vs_exact",
    oracle=f"""
    WITH {_CORPUS_SQL},
    {_SHINGLE_SQL},
    {_XP_SQL},
    {_SIG_SQL},
    {_BANDS_SQL},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT doc_a, doc_b,
             ({" + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(MINHASH_K))})
               AS n_agree
      FROM cand
      JOIN sig sa ON sa.doc_id = cand.doc_a
      JOIN sig sb ON sb.doc_id = cand.doc_b
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT est.doc_a, est.doc_b,
           ROUND(CAST(n_agree AS DOUBLE) / {MINHASH_K}, 6) AS jaccard_est,
           ROUND(CAST(COALESCE(common.c, 0) AS DOUBLE)
                 / (sa.n_sh + sb.n_sh - COALESCE(common.c, 0)), 6)
             AS jaccard_exact,
           ROUND(abs(CAST(n_agree AS DOUBLE) / {MINHASH_K}
                     - CAST(COALESCE(common.c, 0) AS DOUBLE)
                       / (sa.n_sh + sb.n_sh - COALESCE(common.c, 0))), 6)
             AS abs_err
    FROM est
    LEFT JOIN common ON common.doc_a = est.doc_a AND common.doc_b = est.doc_b
    JOIN sizes sa ON sa.doc_id = est.doc_a
    JOIN sizes sb ON sb.doc_id = est.doc_b
    """,
)
def dedup_minhash_est_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration audit: for every LSH candidate pair, the
    sketch-estimated Jaccard (agreeing components / K={MINHASH_K})
    beside the exact shingle Jaccard and |error| — the readout that
    decides whether K is large enough BEFORE a 100-TB dedup run trusts
    the estimator (E[est] = J with sd sqrt(J(1-J)/K); a fat error tail
    here means raise K or verify candidates exactly).

    Plan: signatures + candidate pairs come from the checkpointed
    operators (one corpus pass); the exact side keeps each doc's
    DISTINCT shingle set in-row (one more corpus pass, checkpointed) and
    computes |S(a)∩S(b)| per CANDIDATE row with native
    array_intersect/size — candidate-output-sized work, no inverted
    self-join (r15, see the inline note). All counts integer; both
    Jaccards and the error are identical double expressions."""
    docs = table(spark, sf_dir, "documents")
    corpus = _near_dup_corpus(docs)
    sigs = D.minhash_signatures(corpus).localCheckpoint(eager=True)
    band_keys = [
        F.concat_ws(
            "|",
            F.lit(str(b)),
            *[
                F.col(f"h{b * D.LSH_ROWS + j}").cast("string")
                for j in range(D.LSH_ROWS)
            ],
        )
        for b in range(D.LSH_BANDS)
    ]
    bands = sigs.select("doc_id", F.explode(F.array(*band_keys)).alias("band_key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    n_agree = sum(
        (
            (F.col(f"sa.h{i}") == F.col(f"sb.h{i}")).cast("int")
            for i in range(1, MINHASH_K)
        ),
        (F.col("sa.h0") == F.col("sb.h0")).cast("int"),
    )
    est = (
        cand.join(sigs.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(sigs.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", n_agree.alias("n_agree"))
    )
    # r15 (guide §2.4, measured): the exact side used to run the FULL
    # inverted-index shingle self-join (every intersecting pair's common
    # count — Σ_sh df² rows through a shuffle) and LEFT-join the
    # candidates into it, computing millions of counts the output never
    # reads. The audit only needs counts for the CANDIDATE pairs, so the
    # per-doc DISTINCT shingle sets stay in-row (shingle_sets — one
    # corpus pass, checkpointed for the two joins) and each candidate row
    # computes |S(a)∩S(b)| with the native array_intersect/size
    # expressions: exact integers, candidate-output-sized work, identical
    # divisions. Non-intersecting candidates get c=0 from the empty
    # intersection — exactly the retired COALESCE(c, 0). Every candidate
    # doc has ≥1 shingle by construction (no signature row without
    # shingles → never a candidate), so the inner set joins drop nothing.
    # 4.265 → 2.581 s min-of-5 at sf0.1 (ab_op, same window); oracle
    # hash-green at sf0.001/0.01/0.1.
    ssets = (
        D.shingle_sets(corpus)
        .filter(F.size("shs") > 0)
        .localCheckpoint(eager=True)
    )
    jest = F.col("n_agree").cast("double") / MINHASH_K
    c0 = F.col("c")
    jexact = c0.cast("double") / (F.col("na") + F.col("nb") - c0)
    return (
        est.join(
            ssets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a")),
            "doc_a",
        )
        .join(
            ssets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            F.size(F.array_intersect("shs_a", "shs_b")).cast("bigint").alias("c"),
            F.size("shs_a").cast("bigint").alias("na"),
            F.size("shs_b").cast("bigint").alias("nb"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(jest, 6).alias("jaccard_est"),
            F.round(jexact, 6).alias("jaccard_exact"),
            F.round(F.abs(jest - jexact), 6).alias("abs_err"),
        )
    )


_NPMI_W = 2  # co-occurrence window (tokens to the right)
_NPMI_MIN = 10


@register(
    "text_window_npmi",
    oracle=f"""
    WITH toks AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
    pairs AS (
      {" UNION ALL ".join(f"SELECT t[i] AS w1, t[i + {o}] AS w2 FROM toks, UNNEST(range(1, greatest(len(t) - {o}, 0) + 1)) AS u(i)" for o in range(1, _NPMI_W + 1))}
    ),
    pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY w1, w2),
    tp AS (SELECT SUM(c) AS tp FROM pc),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS u
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    tu AS (SELECT SUM(u) AS tu FROM uni)
    SELECT w1, w2, c AS pair_count,
           FLOOR(ln((CAST(c AS DOUBLE) * tu * tu)
                    / (CAST(tp AS DOUBLE) * a.u * b.u))
                 / (-ln(CAST(c AS DOUBLE) / tp)) * 1e6) / 1e6 AS npmi
    FROM pc
    JOIN uni a ON a.w = w1
    JOIN uni b ON b.w = w2, tp, tu
    WHERE c >= {_NPMI_MIN} AND w1 <> w2
    ORDER BY npmi DESC, w1 ASC, w2 ASC
    LIMIT 20
    """,
)
def text_window_npmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized PMI collocations over a +/-{_NPMI_W}-token window:
    npmi = pmi / -ln p(a,b), in [-1, 1] — the collocation measure
    phrase-mining and embedding work standardizes on (Bouma 2009).
    `text_collocations`' adjacent-bigram PMI misses skip-gram pairs
    ("hash ... join"); the window catches them, and NPMI's bounded
    range is comparable across corpora and window sizes (raw PMI
    inflates for rare pairs).

    Plan: ordered pairs generate IN-ROW per offset (zip_with over
    shifted slices — no positional self-join, no explode of positions),
    one map-side-combinable pair count, unigram counts and the two
    scalar totals broadcast. ln arithmetic is one identical expression
    from exact integer counts, floored 1e-6; top-20 is
    TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), " ").alias("t"))
    pair_arrays = [
        F.zip_with(
            F.slice("t", 1, F.greatest(F.size("t") - o, F.lit(0))),
            F.slice(F.col("t"), F.lit(o + 1), F.greatest(F.size("t") - o, F.lit(0))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )
        for o in range(1, _NPMI_W + 1)
    ]
    pairs = toks.select(
        F.explode(F.flatten(F.array(*pair_arrays))).alias("p")
    ).select("p.w1", "p.w2")
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # pair census: filter + total consume it
    )
    tp = pc.agg(F.sum("c").alias("tp"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("u"))
        .localCheckpoint(eager=True)  # both join sides consume it
    )
    tu = uni.agg(F.sum("u").alias("tu"))
    a = uni.select(F.col("w").alias("w1"), F.col("u").alias("ua"))
    b = uni.select(F.col("w").alias("w2"), F.col("u").alias("ub"))
    pmi = F.log(
        (F.col("c").cast("double") * F.col("tu") * F.col("tu"))
        / (F.col("tp").cast("double") * F.col("ua") * F.col("ub"))
    )
    npmi = pmi / (-F.log(F.col("c").cast("double") / F.col("tp")))
    return (
        pc.filter((F.col("c") >= _NPMI_MIN) & (F.col("w1") != F.col("w2")))
        .join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(tp))
        .crossJoin(F.broadcast(tu))
        .withColumn("npmi_raw", F.floor(npmi * 1e6) / 1e6)
        .orderBy(F.col("npmi_raw").desc(), F.asc("w1"), F.asc("w2"))
        .limit(20)
        .select("w1", "w2", F.col("c").alias("pair_count"), F.col("npmi_raw").alias("npmi"))
    )
