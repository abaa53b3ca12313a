"""Model-scoring dataflow surface (SURVEY.md §2.10): the reference's ML
stages re-expressed as Arrow-vectorized UDF operators.

The reference runs BiLSTM-CRF / BERT inference in per-process DataLoader
loops (ner_pipeline.py:338-375, model_optimization.py:46-61). Spark shape:
broadcast the model ONCE per executor, stream Arrow batches through
mapInPandas — never per-row Python.

Models here are tiny deterministic stand-ins (md5-derived token probs,
fixed-weight logistic head) so tests can verify the DATAFLOW exactly; a
real torch model drops into the same mapInPandas body unchanged
(torch.load inside the generator, before the batch loop).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAD_LEN = 32
OOV_ID = 0


def _md5_int(token: str) -> int:
    """Python twin of functions.hashing.md5_int (first 15 hex digits)."""
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16)


def token_prob(token: str) -> float:
    """Python twin of queries/ranking._probs."""
    return (_md5_int(token) % 997 + 1) / 998.0


def build_vocab(corpus: DataFrame, size: int = 100) -> dict[str, int]:
    """Deterministic vocab: top-`size` tokens by (count desc, token asc),
    ids 1..size; 0 reserved for OOV (ner_pipeline.py:111-115 vocab map)."""
    rows = (
        corpus.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(size)
        .collect()
    )
    return {r["w"]: i + 1 for i, r in enumerate(rows)}


def vectorize(corpus: DataFrame, vocab: dict[str, int], pad_len: int = PAD_LEN) -> DataFrame:
    """udf_vectorize (utils/utils.py:18-25): tokenize → broadcast-vocab
    lookup → truncate/pad. Arrow-batched scalar pandas_udf; the vocab dict
    rides the closure and is broadcast with the task, deserialized once per
    worker."""
    sc = corpus.sparkSession.sparkContext
    bc_vocab = sc.broadcast(vocab)

    @F.pandas_udf(ArrayType(IntegerType()))
    def vec(texts: pd.Series) -> pd.Series:
        v = bc_vocab.value

        def one(text: str) -> list[int]:
            ids = [v.get(w, OOV_ID) for w in text.split(" ")][:pad_len]
            return ids + [0] * (pad_len - len(ids))

        return texts.map(one)

    return corpus.select("doc_id", vec(F.col("text")).alias("token_ids"))


NER_SCORE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("path_score", DoubleType()),
        StructField("n_entities", IntegerType()),
        StructField("entity_tokens", ArrayType(StringType())),
    ]
)


def ner_score(corpus: DataFrame, batch_size: int = 256) -> DataFrame:
    """udf_ner_score (ner_pipeline.py:338-375 eval(): batch Viterbi decode
    → scores/paths). mapInPandas streams Arrow batches; the 'model' is the
    deterministic token-prob table, entities are tokens containing 'data'
    (the reference's candidate heuristic). path_score reproduces the SQL
    twin rank_al_lc exactly — asserted in tests.

    Batch sizing: a real model would bound GPU/host memory by re-chunking
    INSIDE the UDF (below) — never by mutating the session-wide Arrow
    batch conf as a plan-build side effect, which would silently shrink
    every other operator's batches for the rest of the session."""

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a real model would be loaded once here (before the loop)
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):  # model-side re-chunk
                chunk = pdf.iloc[lo : lo + batch_size]
                out = []
                for doc_id, text in zip(chunk["doc_id"], chunk["text"]):
                    toks = text.split(" ")
                    score = sum(math.log(token_prob(t)) for t in toks)
                    ents = [t for t in toks if "data" in t]
                    out.append((doc_id, score, len(ents), ents))
                yield pd.DataFrame(out, columns=[f.name for f in NER_SCORE_SCHEMA.fields])

    return corpus.select("doc_id", "text").mapInPandas(score_batches, NER_SCORE_SCHEMA)


CLASSIFY_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("p_positive", DoubleType()),
        StructField("label_pred", IntegerType()),
    ]
)


def classify_embeddings(embeddings: DataFrame) -> DataFrame:
    """udf_bert_classify (model_optimization.py:46-61): encoder + dense
    head + sigmoid. Stand-in: fixed deterministic weight vector (the j=0
    LSH plane) over the embedding — same mapInPandas shape as a real
    encoder head."""
    weights = [
        ((((i + 17) * 2654435761) % 1000003) % 97 - 48) / 48.0 for i in range(1, 65)
    ]

    def classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        w = np.array(weights)
        for pdf in batches:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            logit = mat @ w
            p = 1.0 / (1.0 + np.exp(-logit))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "p_positive": p,
                    "label_pred": (p > 0.5).astype("int32"),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(classify, CLASSIFY_SCHEMA)


def group_normalize(df: DataFrame, key: str, value: str) -> DataFrame:
    """udaf_norm (SNIPPETS.md [1] GROUPED_MAP pattern): z-score per group
    via applyInPandas. Note: groups must fit in one worker's memory — for
    billion-row groups use window mean/stddev instead (same result, no
    materialized group)."""
    schema = StructType(
        [
            StructField(key, df.schema[key].dataType),
            StructField("row_key", LongType()),
            StructField("z", DoubleType()),
        ]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value]
        return pd.DataFrame(
            {key: pdf[key], "row_key": pdf["row_key"], "z": (v - v.mean()) / v.std()}
        )

    return df.groupBy(key).applyInPandas(norm, schema)


def lda_topics(corpus: DataFrame, k: int = 8, vocab_size: int = 64, seed: int = 100) -> DataFrame:
    """udtf_lda (TM_2 cells 22,30-33: gensim LDA k=8 random_state=100) via
    MLlib — CountVectorizer → LDA → per-doc topic distribution, joined back
    by doc_id exactly like the notebook's positional join but keyed."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    toks = corpus.select("doc_id", F.split(F.col("text"), " ").alias("tokens"))
    cv = CountVectorizer(inputCol="tokens", outputCol="tf", vocabSize=vocab_size, minDF=1.0)
    model = cv.fit(toks)
    tf = model.transform(toks)
    lda = LDA(k=k, seed=seed, featuresCol="tf", maxIter=10)
    topics = lda.fit(tf).transform(tf)
    # JVM-side vector→array conversion — not a per-row Python UDF
    from pyspark.ml.functions import vector_to_array

    return topics.select(
        "doc_id", vector_to_array(F.col("topicDistribution")).alias("topic_dist")
    )


def coherence_sweep(corpus: DataFrame, ks=(2, 4, 8), vocab_size: int = 64, seed: int = 100, sample_rows: int = 300) -> DataFrame:
    """udf_coherence (TM_2 cells 17-20: coherence over k=2..40 step 6).
    Fits one seeded MLlib LDA per k on a deterministic bounded sample and
    reports logPerplexity per k. The grid loop is driver-side (few items);
    every fit is a distributed job."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    spark = corpus.sparkSession
    sample = corpus.orderBy("doc_id").limit(sample_rows)
    toks = sample.select("doc_id", F.split(F.col("text"), " ").alias("tokens"))
    cv = CountVectorizer(inputCol="tokens", outputCol="tf", vocabSize=vocab_size, minDF=1.0)
    tf = cv.fit(toks).transform(toks)
    tf = tf.cache()
    rows = []
    for k in ks:
        model = LDA(k=int(k), seed=seed, featuresCol="tf", maxIter=5).fit(tf)
        rows.append((int(k), float(model.logPerplexity(tf))))
    tf.unpersist()
    return spark.createDataFrame(rows, "k INT, log_perplexity DOUBLE")
