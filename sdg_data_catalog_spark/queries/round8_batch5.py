"""Round-8 operator batch 5: soft dedup weighting, Neyman-optimal
stratified sampling, and mutual information.

- `curation_soft_dedup_weights`: SoftDeDup — downweight duplicates by
  1/cluster_size instead of dropping them (He et al. 2024, "SoftDedup:
  an Efficient Data Reweighting Method for Speeding Up Language Model
  Pre-training"): removal loses the distributional signal that a
  passage is COMMON; reweighting keeps total corpus coverage while
  equalizing per-content gradient mass.
- `sample_stratified_neyman`: stratified sampling with Neyman-optimal
  allocation n_h ∝ N_h·S_h — the variance-minimizing budget split
  across strata (Neyman 1934), where uniform-per-stratum and
  proportional allocation both waste budget on low-variance strata.
  Selection inside each stratum is md5-ranked (the split_stratified
  convention) so the sample is engine- and run-reproducible.
- `agg_mutual_information`: MI(source; lang) in nats plus both
  entropies and the normalized MI — the dependence strength the chi2
  test (agg_chisq_independence) only thresholds: chi2 says WHETHER the
  mix depends on source, MI says HOW MUCH (in information units).

Float-summation discipline: every order-sensitive sum of log terms is
an exact integer sum of per-term 1e-12 floors (the dq_benford
convention); everything upstream is exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_FP_SQL = "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"


@register(
    "curation_soft_dedup_weights",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id % 3 = 0
    ),
    sig AS (
      SELECT doc_id, {_FP_SQL} AS h,
             len(string_split(text, ' ')) AS n_tokens
      FROM corpus
    ),
    c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM sig GROUP BY h)
    SELECT sig.doc_id, c.cluster_size,
           ROUND(1.0 / c.cluster_size, 6) AS weight,
           FLOOR(CAST(n_tokens AS DOUBLE) / c.cluster_size * 1e6) / 1e6
             AS effective_tokens
    FROM sig JOIN c USING (h)
    """,
)
def curation_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup: every document keeps a training weight 1/cluster_size,
    where clusters are bag-of-words content-fingerprint groups (the
    dedup_incremental identity; every 3rd doc is planted as an exact
    twin so clusters exist). Hard dedup (dedup_apply_canonical) keeps
    one copy at weight 1 — losing the "this content is common" signal;
    soft dedup keeps every copy at gradient mass summing to 1 per
    cluster, the reweighting form recent pretraining pipelines prefer
    for mild duplication. `effective_tokens` = n_tokens/cluster_size is
    the number token-budget planning consumes.

    Plan: ONE corpus pass computes fingerprint + token count
    (checkpointed — the cluster count and the join-back both consume
    it); the cluster-size table is content-cardinality-sized and joins
    back on the 32-byte hash. Weights are exact integer reciprocals."""
    docs = table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    sig = corpus.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
        ).alias("h"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    ).localCheckpoint(eager=True)
    c = sig.groupBy("h").agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
    return sig.join(c, "h").select(
        "doc_id",
        "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size"), 6).alias("weight"),
        (
            F.floor(
                F.col("n_tokens").cast("double") / F.col("cluster_size") * 1e6
            )
            / 1e6
        ).alias("effective_tokens"),
    )


_NEYMAN_N = 200


@register(
    "sample_stratified_neyman",
    oracle=f"""
    WITH m AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS nh,
             CAST(SUM(n_chars) AS BIGINT) AS s1,
             CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS s2
      FROM documents GROUP BY source
    ),
    sd AS (
      SELECT source, nh,
             sqrt(CAST(nh * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
               / nh AS sh
      FROM m
    ),
    tot AS (SELECT SUM(nh * sh) AS t FROM sd),
    alloc AS (
      SELECT source, nh,
             LEAST(CAST(FLOOR({_NEYMAN_N} * nh * sh / t) AS BIGINT), nh)
               AS n_alloc
      FROM sd, tot
    ),
    ranked AS (
      SELECT d.doc_id, d.source, d.n_chars, a.n_alloc,
             ROW_NUMBER() OVER (PARTITION BY d.source
                 ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS r
      FROM documents d JOIN alloc a USING (source)
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           n_alloc
    FROM ranked WHERE r <= n_alloc
    """,
)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample with NEYMAN-optimal allocation: stratum h gets
    n_h = floor(n_total * N_h*S_h / sum N_h*S_h) slots (capped at N_h)
    — the allocation that minimizes the stratified-mean variance for a
    fixed budget (Neyman 1934): high-variance strata earn more budget,
    uniform strata less; proportional allocation is the special case of
    equal variances. In-stratum selection is the md5-ranked window
    (split_stratified convention), so the exact same rows come out on
    every engine and run.

    Exactness: per-stratum variance from exact integer moments
    (decimal/HUGEINT n*S2 - S1^2 — S1^2 overflows int64 past ~3e9-char
    strata), S_h via one double sqrt, allocation compared as
    identically-derived doubles then floored to integers. Plan: one
    combinable moment pass (|strata| rows, checkpointed), allocations
    broadcast back, ONE per-stratum ranked window over the corpus."""
    docs = table(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(
            F.col("n_chars").cast("decimal(19,0)") * F.col("n_chars").cast("decimal(19,0)")
        ).alias("s2"),
    ).localCheckpoint(eager=True)  # |strata| rows; feeds sd + the total
    sd = m.select(
        "source",
        "nh",
        (
            F.sqrt(
                (
                    F.col("nh").cast("decimal(19,0)") * F.col("s2")
                    - F.col("s1").cast("decimal(19,0)") * F.col("s1").cast("decimal(19,0)")
                ).cast("double")
            )
            / F.col("nh")
        ).alias("sh"),
    )
    tot = sd.agg(F.sum(F.col("nh") * F.col("sh")).alias("t"))
    alloc = sd.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.floor(_NEYMAN_N * F.col("nh") * F.col("sh") / F.col("t")).cast(
                "bigint"
            ),
            F.col("nh"),
        ).alias("n_alloc"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.join(F.broadcast(alloc), "source")
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= F.col("n_alloc"))
        .select("doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"), "n_alloc")
    )


@register(
    "agg_mutual_information",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    ns AS (SELECT source, SUM(n) AS n_s FROM c GROUP BY source),
    nl AS (SELECT lang, SUM(n) AS n_l FROM c GROUP BY lang),
    nt AS (SELECT SUM(n) AS n FROM c),
    terms AS (
      SELECT c.source, c.lang,
             CAST(FLOOR(CAST(c.n AS DOUBLE) / nt.n
                        * ln(CAST(c.n AS DOUBLE) * nt.n / (ns.n_s * nl.n_l))
                        * 1e12) AS BIGINT) AS mi_t
      FROM c JOIN ns USING (source) JOIN nl USING (lang), nt
    ),
    hs AS (
      SELECT SUM(CAST(FLOOR(-CAST(n_s AS DOUBLE) / nt.n
                            * ln(CAST(n_s AS DOUBLE) / nt.n) * 1e12)
                      AS BIGINT)) AS h
      FROM ns, nt
    ),
    hl AS (
      SELECT SUM(CAST(FLOOR(-CAST(n_l AS DOUBLE) / nt.n
                            * ln(CAST(n_l AS DOUBLE) / nt.n) * 1e12)
                      AS BIGINT)) AS h
      FROM nl, nt
    )
    SELECT CAST((SELECT n FROM nt) AS BIGINT) AS n_docs,
           CAST(SUM(mi_t) AS DOUBLE) / 1e12 AS mi_nats,
           CAST((SELECT h FROM hs) AS DOUBLE) / 1e12 AS h_source,
           CAST((SELECT h FROM hl) AS DOUBLE) / 1e12 AS h_lang,
           FLOOR(CAST(SUM(mi_t) AS DOUBLE)
                 / LEAST((SELECT h FROM hs), (SELECT h FROM hl))
                 * 1e6) / 1e6 AS nmi
    FROM terms
    """,
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between source and language, in nats, with
    both marginal entropies and the normalized MI (MI / min(H_s, H_l))
    — the EFFECT-SIZE companion to agg_chisq_independence: chi2 decides
    whether source and language are dependent; MI measures how much, in
    units a curator can compare across corpora (NMI=0 independent, 1 =
    one determines the other). High source-language MI means per-source
    language filters are redundant; near-zero means every source needs
    its own.

    Exactness: the (source x lang) census is exact integer counts
    (checkpointed; three marginal consumers); each log term is floored
    to a 1e-12 integer image and SUMMED AS INTEGERS (the dq_benford
    convention — never an order-sensitive float sum), then scaled back
    once. One corpus pass; everything downstream is |sources| x |langs|
    rows."""
    docs = table(spark, sf_dir, "documents")
    c = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    ns = c.groupBy("source").agg(F.sum("n").alias("n_s"))
    nl = c.groupBy("lang").agg(F.sum("n").alias("n_l"))
    nt = c.agg(F.sum("n").alias("n"))
    mi_t = F.floor(
        F.col("n").cast("double")
        / F.col("nt_n")
        * F.log(
            F.col("n").cast("double") * F.col("nt_n") / (F.col("n_s") * F.col("n_l"))
        )
        * 1e12
    ).cast("bigint")
    terms = (
        c.join(F.broadcast(ns), "source")
        .join(F.broadcast(nl), "lang")
        .crossJoin(F.broadcast(nt.select(F.col("n").alias("nt_n"))))
        .select(mi_t.alias("mi_t"))
    )
    h_term = lambda col, n: F.floor(  # noqa: E731
        -col.cast("double") / n * F.log(col.cast("double") / n) * 1e12
    ).cast("bigint")
    hs = (
        ns.crossJoin(F.broadcast(nt.select(F.col("n").alias("nt_n"))))
        .agg(F.sum(h_term(F.col("n_s"), F.col("nt_n"))).alias("h"))
    )
    hl = (
        nl.crossJoin(F.broadcast(nt.select(F.col("n").alias("nt_n"))))
        .agg(F.sum(h_term(F.col("n_l"), F.col("nt_n"))).alias("h"))
    )
    mi = terms.agg(F.sum("mi_t").alias("mi"))
    return (
        mi.crossJoin(F.broadcast(hs.select(F.col("h").alias("h_s"))))
        .crossJoin(F.broadcast(hl.select(F.col("h").alias("h_l"))))
        .crossJoin(F.broadcast(nt))
        .select(
            F.col("n").cast("bigint").alias("n_docs"),
            (F.col("mi").cast("double") / 1e12).alias("mi_nats"),
            (F.col("h_s").cast("double") / 1e12).alias("h_source"),
            (F.col("h_l").cast("double") / 1e12).alias("h_lang"),
            (
                F.floor(
                    F.col("mi").cast("double")
                    / F.least("h_s", "h_l").cast("double")
                    * 1e6
                )
                / 1e6
            ).alias("nmi"),
        )
    )
