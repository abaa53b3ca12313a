"""Round-12 batch 1: census promotions and audit twins.

- ``lda_input_census`` — full-oracle twin pinning udtf_lda's feature
  pipeline (r11 verdict #5, the text_compression_census precedent):
  MLlib LDA internals stay rows-only by declared design, but everything
  FEEDING the model is deterministic and SQL-expressible — the exact
  ``split(text, ' ')`` tokenization CountVectorizer consumes, per-term
  corpus frequency and document frequency, and the top-``vocab_size``
  vocabulary under a deterministic (tf DESC, token ASC) tie-break.
  tests/test_round12_batch1.py asserts the fitted CountVectorizer's
  vocabulary is exactly this census's token set, so a green driver row
  certifies the whole deterministic half of the LDA pipeline against
  DuckDB while the Gibbs half keeps its property tests.

Reference analog: sdg_data_catalog notebooks TM_2 cells 22,30-33 (gensim
LDA over a CountVectorizer-style term matrix); the census pins the term
matrix, not the sampler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_LDA_VOCAB = 64  # matches operators/scoring.py::lda_topics vocab_size


@register(
    "lda_input_census",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS token
      FROM documents
    ),
    c AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY token
    ),
    r AS (
      SELECT token, tf, df,
             ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS rank
      FROM c
    )
    SELECT token, tf, df, CAST(rank AS INTEGER) AS rank
    FROM r WHERE rank <= {_LDA_VOCAB} ORDER BY rank
    """,
)
def lda_input_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic half of udtf_lda, hash-certified: the exact
    whitespace tokenization CountVectorizer consumes (split keeps empty
    tokens — both engines agree), per-term corpus tf + doc frequency,
    and the top-64 vocabulary under (tf DESC, token ASC). The top-64 is
    a TakeOrderedAndProject (distributed heap, no global sort or
    single-partition window over the vocabulary — the shape that holds
    when the vocabulary is billions of terms); the rank column comes
    from a window over the 64 surviving rows only."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("token"),
    )
    c = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    top = c.orderBy(F.desc("tf"), F.asc("token")).limit(_LDA_VOCAB)
    w = Window.orderBy(F.desc("tf"), F.asc("token"))  # 64 rows — bounded
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("token", "tf", "df", "rank")
        .orderBy("rank")
    )
