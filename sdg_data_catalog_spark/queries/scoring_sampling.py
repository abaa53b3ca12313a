"""Registered surface for the UDF/model-scoring operators (§2.10),
sampling/splits (§2.7), and gazetteer matching (§2.3 join_gazetteer).

Python-model operators (trie spans, torch-shaped scorers, LDA, seeded
sampling) are rows-only checks by design (SURVEY.md §5.2: keep those few
and thin); everything with deterministic math gets a full oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import gazetteer as G
from sdg_data_catalog_spark.operators import sampling as SM
from sdg_data_catalog_spark.operators import scoring as SC
from sdg_data_catalog_spark.queries.registry import register

GAZETTEER = (
    "table scan",
    "hash join",
    "sort merge",
    "stream batch",
    "window agg",
    "data",
    "customer",
)

_GAZ_VALUES = ", ".join(f"('{n}')" for n in GAZETTEER)


@register(
    "join_gazetteer",
    oracle=f"""
    WITH gaz(name) AS (VALUES {_GAZ_VALUES})
    SELECT doc_id, name
    FROM documents JOIN gaz ON contains(text, name)
    """,
)
def join_gazetteer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment join: which gazetteer names appear in which docs
    (fastmatch.py name-hit subset, offset-free so it oracles exactly)."""
    docs = table(spark, sf_dir, "documents")
    names = spark.createDataFrame([(n,) for n in GAZETTEER], "name string")
    return G.match_names_join(docs, names)


@register("gazetteer_spans")  # char offsets: UDF-only (§2.3: no oracle for spans)
def gazetteer_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return G.match_spans(docs, list(GAZETTEER)).select(
        "doc_id", F.explode("matches").alias("m")
    ).select("doc_id", "m.match", "m.start", "m.end")


@register(
    "udaf_norm",
    oracle="""
    SELECT c_nationkey, c_custkey,
           ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
                 / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_nationkey), 4) AS z
    FROM customer
    """,
)
def udaf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise z-score via applyInPandas (GROUPED_MAP) — the pandas
    (v - mean)/std(ddof=1) must equal SQL window mean/stddev_samp, which
    the oracle asserts."""
    cust = table(spark, sf_dir, "customer").select(
        "c_nationkey", F.col("c_custkey").alias("row_key"), "c_acctbal"
    )
    out = SC.group_normalize(cust, key="c_nationkey", value="c_acctbal")
    return out.select(
        "c_nationkey", F.col("row_key").alias("c_custkey"), F.round("z", 4).alias("z")
    )


@register("udf_vectorize")  # broadcast-vocab lookup: rows-only (dict is engine-side)
def udf_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    vocab = SC.build_vocab(docs, size=100)
    return SC.vectorize(docs, vocab)


@register("udf_ner_score")  # model-scoring dataflow: rows-only
def udf_ner_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return SC.ner_score(docs)


@register(
    "udf_bert_classify",
    oracle="""
    SELECT vec_id,
           ROUND(1.0 / (1.0 + exp(-list_sum(list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * ((((i + 17) * 2654435761) % 1000003 % 97 - 48) / 48.0))))), 6) AS p_positive,
           CASE WHEN 1.0 / (1.0 + exp(-list_sum(list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE)
                      * ((((i + 17) * 2654435761) % 1000003 % 97 - 48) / 48.0))))) > 0.5
                THEN 1 ELSE 0 END AS label_pred
    FROM embeddings
    """,
)
def udf_bert_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch classification head via mapInPandas; fixed weights make even
    this Python-side model oracle-checkable."""
    emb = table(spark, sf_dir, "embeddings")
    return SC.classify_embeddings(emb).select(
        "vec_id", F.round("p_positive", 6).alias("p_positive"), "label_pred"
    )


@register("udtf_lda")  # MLlib LDA: seeded but engine-internal → rows-only
def udtf_lda(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return SC.lda_topics(docs, k=8, seed=100)


@register("split_stratified")  # Spark-RNG sample: rows-only (fractions tested in pytest)
def split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    train, test = SM.stratified_split(docs, "lang", 0.85, key_cols=["doc_id"])
    return (
        train.select("lang", F.lit("train").alias("split"))
        .unionByName(test.select("lang", F.lit("test").alias("split")))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register("sample_frac")  # Spark-RNG sample: rows-only
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return SM.sample_fraction(orders, 0.1).select("o_orderkey")


@register("udf_coherence")  # MLlib LDA perplexity sweep: engine-internal → rows-only
def udf_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-selection sweep (TM_2 cells 17-20: compute_coherence_values over
    a topic-count grid). MLlib has no c_v coherence; the selection metric is
    logPerplexity (lower = better), swept over k on a bounded sample — the
    driver loops over k (a handful of fits), each fit itself distributed."""
    docs = table(spark, sf_dir, "documents")
    return SC.coherence_sweep(docs, ks=(2, 4, 8), seed=100)
