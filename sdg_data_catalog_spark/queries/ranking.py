"""Active-learning ranking surface (SURVEY.md §2.5) + array math (§2.8).

The reference scores every unlabeled paragraph with a BiLSTM-CRF and ranks
by uncertainty (dataset_ner/active_learning.py: least-confidence :62-77,
length-normalized :80-97, least-token-prob :100-119, max-token-prob
:122-143, entropy :146-199, longest :48-59) using np.argpartition top-k.

Here the scoring model is swapped for a deterministic per-token pseudo-
probability p(t) = (md5_int(t) % 997 + 1) / 998 so the ranking OPERATORS —
higher-order array folds + global top-k (TakeOrderedAndProject) — are fully
oracle-checkable; the real model plugs in via operators/scoring.py
(mapInPandas) without changing any ranking code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.functions.hashing import md5_int
from sdg_data_catalog_spark.queries.registry import register

K = 25

# probability array per document, Spark side
def _probs(text: Column) -> Column:
    return F.transform(
        F.split(text, " "),
        lambda t: (md5_int(t) % 997 + 1) / F.lit(998.0),
    )


# probability array per document, DuckDB side (kept adjacent to avoid drift)
_PROBS_SQL = (
    "list_transform(string_split(text, ' '),"
    " t -> (('0x' || substr(md5(t), 1, 15))::BIGINT % 997 + 1) / 998.0)"
)

_SUM_LOG_SQL = f"list_sum(list_transform({_PROBS_SQL}, p -> ln(p)))"
_ENTROPY_SQL = f"-list_sum(list_transform({_PROBS_SQL}, p -> p * ln(p)))"


def _sum_log(probs: Column) -> Column:
    return F.aggregate(probs, F.lit(0.0), lambda acc, p: acc + F.log(p))


def _entropy(probs: Column) -> Column:
    return -F.aggregate(probs, F.lit(0.0), lambda acc, p: acc + p * F.log(p))


@register(
    "rank_al_lc",
    oracle=f"""
    SELECT doc_id, ROUND({_SUM_LOG_SQL}, 6) AS path_score
    FROM documents
    ORDER BY {_SUM_LOG_SQL} ASC, doc_id ASC
    LIMIT {K}
    """,
)
def rank_al_lc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-confidence: k smallest log-path scores (active_learning.py:62-77)."""
    docs = table(spark, sf_dir, "documents")
    score = _sum_log(_probs(F.col("text")))
    return (
        docs.select("doc_id", score.alias("path_score"))
        .orderBy(F.col("path_score").asc(), F.col("doc_id").asc())
        .limit(K)
        .withColumn("path_score", F.round("path_score", 6))
    )


@register(
    "rank_al_nlc",
    oracle=f"""
    SELECT doc_id,
           ROUND({_SUM_LOG_SQL} / len(string_split(text, ' ')), 6) AS norm_score
    FROM documents
    ORDER BY {_SUM_LOG_SQL} / len(string_split(text, ' ')) ASC, doc_id ASC
    LIMIT {K}
    """,
)
def rank_al_nlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-normalized least-confidence (active_learning.py:80-97)."""
    docs = table(spark, sf_dir, "documents")
    probs = _probs(F.col("text"))
    score = _sum_log(probs) / F.size(probs)
    return (
        docs.select("doc_id", score.alias("norm_score"))
        .orderBy(F.col("norm_score").asc(), F.col("doc_id").asc())
        .limit(K)
        .withColumn("norm_score", F.round("norm_score", 6))
    )


@register(
    "rank_al_ltp",
    oracle=f"""
    SELECT doc_id, ROUND(list_min({_PROBS_SQL}), 6) AS min_token_prob
    FROM documents
    ORDER BY list_min({_PROBS_SQL}) ASC, doc_id ASC
    LIMIT {K}
    """,
)
def rank_al_ltp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-token-probability (active_learning.py:100-119): array_min +
    ascending top-k."""
    docs = table(spark, sf_dir, "documents")
    score = F.array_min(_probs(F.col("text")))
    return (
        docs.select("doc_id", score.alias("min_token_prob"))
        .orderBy(F.col("min_token_prob").asc(), F.col("doc_id").asc())
        .limit(K)
        .withColumn("min_token_prob", F.round("min_token_prob", 6))
    )


@register(
    "rank_al_te",
    oracle=f"""
    SELECT doc_id, ROUND({_ENTROPY_SQL}, 6) AS total_entropy
    FROM documents
    ORDER BY {_ENTROPY_SQL} DESC, doc_id ASC
    LIMIT {K}
    """,
)
def rank_al_te(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-entropy ranking, k most uncertain (active_learning.py:174-199)."""
    docs = table(spark, sf_dir, "documents")
    score = _entropy(_probs(F.col("text")))
    return (
        docs.select("doc_id", score.alias("total_entropy"))
        .orderBy(F.col("total_entropy").desc(), F.col("doc_id").asc())
        .limit(K)
        .withColumn("total_entropy", F.round("total_entropy", 6))
    )


@register(
    "rank_al_mte",
    oracle=f"""
    SELECT doc_id,
           ROUND({_ENTROPY_SQL} / len(string_split(text, ' ')), 6) AS mean_entropy
    FROM documents
    ORDER BY {_ENTROPY_SQL} / len(string_split(text, ' ')) DESC, doc_id ASC
    LIMIT {K}
    """,
)
def rank_al_mte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-token-entropy (active_learning.py:146-171)."""
    docs = table(spark, sf_dir, "documents")
    probs = _probs(F.col("text"))
    score = _entropy(probs) / F.size(probs)
    return (
        docs.select("doc_id", score.alias("mean_entropy"))
        .orderBy(F.col("mean_entropy").desc(), F.col("doc_id").asc())
        .limit(K)
        .withColumn("mean_entropy", F.round("mean_entropy", 6))
    )


@register(
    "rank_al_long",
    oracle=f"""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    ORDER BY len(string_split(text, ' ')) DESC, doc_id ASC
    LIMIT {K}
    """,
)
def rank_al_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-sequence selection (active_learning.py:48-59) — sort by
    length desc + limit → TakeOrderedAndProject, no full sort."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens"))
        .orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
        .limit(K)
    )


# --- array math on embeddings (§2.8 math_softmax / math_logsumexp) --------

_EMB_D_SQL = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_LSE_SQL = (
    f"(list_max({_EMB_D_SQL})"
    f" + ln(list_sum(list_transform({_EMB_D_SQL}, x -> exp(x - list_max({_EMB_D_SQL}))))))"
)


@register(
    "math_logsumexp",
    oracle=f"""
    SELECT vec_id, ROUND({_LSE_SQL}, 6) AS lse
    FROM embeddings
    """,
)
def math_logsumexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerically-stable logsumexp (dataset_ner/crf.py:5-11) as a
    higher-order fold: max + ln(sum(exp(x - max)))."""
    emb = table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mx = F.array_max(xd)
    lse = mx + F.log(
        F.aggregate(
            F.transform(xd, lambda x: F.exp(x - mx)), F.lit(0.0), lambda a, x: a + x
        )
    )
    return emb.select("vec_id", F.round(lse, 6).alias("lse"))


@register(
    "rank_al_mtp",
    oracle=f"""
    SELECT vec_id,
           ROUND(exp(list_max({_EMB_D_SQL}) - {_LSE_SQL}), 6) AS max_softmax_prob
    FROM embeddings
    ORDER BY exp(list_max({_EMB_D_SQL}) - {_LSE_SQL}) ASC, vec_id ASC
    LIMIT {K}
    """,
)
def rank_al_mtp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-softmax-probability uncertainty (active_learning.py:122-143 with
    the softmax of :138-140): max softmax prob = exp(max - logsumexp);
    k least-confident rows."""
    emb = table(spark, sf_dir, "embeddings")
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mx = F.array_max(xd)
    lse = mx + F.log(
        F.aggregate(
            F.transform(xd, lambda x: F.exp(x - mx)), F.lit(0.0), lambda a, x: a + x
        )
    )
    score = F.exp(mx - lse)
    return (
        emb.select("vec_id", score.alias("max_softmax_prob"))
        .orderBy(F.col("max_softmax_prob").asc(), F.col("vec_id").asc())
        .limit(K)
        .withColumn("max_softmax_prob", F.round("max_softmax_prob", 6))
    )


# --- §2.8 vectorize/pad/truncate (SQL-expressible udf_vectorize twin) -----

_PAD_LEN = 32
_IDS_SQL = (
    "list_transform(string_split(text, ' '),"
    " t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 10000)"
)


@register(
    "vectorize_pad",
    oracle=f"""
    SELECT doc_id,
           array_to_string(
             CASE WHEN len({_IDS_SQL}) >= {_PAD_LEN}
                  THEN {_IDS_SQL}[1:{_PAD_LEN}]
                  ELSE list_concat({_IDS_SQL},
                       list_transform(range(1, {_PAD_LEN} + 1 - len({_IDS_SQL})), x -> 0))
             END, ',') AS token_ids
    FROM documents
    """,
)
def vectorize_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text → fixed-length token-id vector (utils/utils.py:18-25
    sentences_to_vec: tokenize + vocab lookup + truncate/pad to max_seq_len;
    arr_pad/arr_truncate). Vocab lookup is the md5 hash-trick here; the
    broadcast-vocab variant lives in operators/scoring.py. Surfaced
    ','-joined for canon safety (the in-array form is the internal shape)."""
    docs = table(spark, sf_dir, "documents")
    ids = F.transform(F.split(F.col("text"), " "), lambda t: md5_int(t) % 10000)
    padded = F.when(F.size(ids) >= _PAD_LEN, F.slice(ids, 1, _PAD_LEN)).otherwise(
        F.concat(ids, F.array_repeat(F.lit(0).cast("bigint"), _PAD_LEN - F.size(ids)))
    )
    joined = F.array_join(F.transform(padded, lambda x: x.cast("string")), ",")
    return docs.select("doc_id", joined.alias("token_ids"))
