"""Retrieval + curation surface, round-2 extension: semantic dedup
(SemDeDup), exact-substring span dedup, BM25 ranking, sliding-window
chunking, and PMI collocations.

These extend the LLM-training-data operator family (BASELINE.json north
star; same tier as queries/dedup_similarity.py). The reference catalog
mines academic text with keyword relevance scoring
(/root/reference/dataset_ner/ner_pipeline.py text scoring surface); BM25
and collocations are the corpus-statistics generalization of that, and the
dedup rungs extend the ladder at the semantic / substring granularities
the token-level rungs can't see.

Every operator is a declarative DataFrame composition (no Python in the
hot path); every oracle recomputes the same math in DuckDB with the same
expression grouping so double-precision results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import similarity as S
from sdg_data_catalog_spark.queries.registry import register

# --- SemDeDup: embedding-space semantic dedup ------------------------------

_SEM_CELLS = 8
_SEM_TAU = 0.4


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform(range(1, 65), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
    )


@register(
    "dedup_semantic",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cell_id, embedding AS c_emb FROM embeddings
        WHERE vec_id < {_SEM_CELLS}
    ),
    scored AS (
        SELECT v.vec_id, cents.cell_id,
               {_cos_sql("v.embedding", "c_emb")} AS cs
        FROM embeddings v CROSS JOIN cents
    ),
    assigned AS (
        SELECT vec_id, cell_id FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cs DESC, cell_id ASC) = 1
    ),
    dropped AS (
        SELECT DISTINCT a.vec_id
        FROM assigned a
        JOIN assigned b ON a.cell_id = b.cell_id AND b.vec_id < a.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        WHERE {_cos_sql("ea.embedding", "eb.embedding")} >= {_SEM_TAU}
    )
    SELECT s.vec_id, s.cell_id,
           s.vec_id NOT IN (SELECT vec_id FROM dropped) AS is_kept
    FROM assigned s
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings, then inside each
    cluster drop every vector that has a cosine >= tau neighbor with a
    smaller id (deterministic survivor rule). Cluster assignment is a
    broadcast join against a tiny centroid table (deterministic codebook:
    first `_SEM_CELLS` vectors, as ivf_centroids) — the embedding table
    never shuffles for assignment. The pair scan is an equi-join on
    cell_id, so candidate cost is sum of squared CLUSTER sizes, not N² —
    exactly why SemDeDup clusters first. At 100 TB the per-cluster join is
    further bounded by the block-GEMM kernel (operators/similarity.py::
    cosine_neardup_pairs); here clusters are small enough for the
    expression path, which keeps the whole plan JVM-side."""
    emb = table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < _SEM_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("centroid")
    )
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "cs", S.cosine(F.col("embedding"), F.col("centroid"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("cell_id").asc())
    # assignment feeds both sides of the per-cell pair join AND the final
    # projection — one materialization pass instead of re-expanding the
    # scan+assign subtree 3x (audited 6 embeddings scans)
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell_id")
        .localCheckpoint(eager=True)
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"), "cell_id"
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"), "cell_id"
    )
    dropped = (
        a.join(b, "cell_id")
        .filter(F.col("id_b") < F.col("id_a"))
        .filter(S.cosine(F.col("ea"), F.col("eb")) >= F.lit(_SEM_TAU))
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cell_id",
        F.coalesce(~F.col("dropped"), F.lit(True)).alias("is_kept"),
    )


# --- exact-substring span dedup (Lee et al. 2022 at n-gram granularity) ----

_SPAN = 10

_NEAR_CORPUS_SQL = """
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               substr(text, strpos(text, ' ') + 1) AS text
        FROM documents
    )
"""


@register(
    "dedup_substring",
    oracle=f"""
    WITH {_NEAR_CORPUS_SQL},
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    sp AS (
        SELECT doc_id, md5(array_to_string(t[i : i + {_SPAN - 1}], ' ')) AS h
        FROM toks,
             UNNEST(range(1, greatest(len(t) - {_SPAN - 1}, 0) + 1)) AS u(i)
    ),
    dup AS (
        SELECT h, 1 AS isd FROM (
            SELECT h, COUNT(DISTINCT doc_id) AS nd FROM sp GROUP BY h
        ) WHERE nd >= 2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COALESCE(SUM(isd), 0) AS BIGINT) AS n_dup_spans,
           ROUND(CAST(COALESCE(SUM(isd), 0) AS DOUBLE) / COUNT(*), 6) AS dup_frac
    FROM sp LEFT JOIN dup USING (h)
    GROUP BY doc_id
    """,
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication audit: every {_SPAN}-token sliding span,
    flagged when the identical span occurs in >= 2 distinct documents — the
    n-gram-granularity form of suffix-array substring dedup ("Deduplicating
    Training Data Makes Language Models Better", Lee et al. 2022; the
    suffix-array construction doesn't distribute, the sliding-hash form
    does). Runs on the near-dup corpus (orig + first-token-dropped copy) so
    cross-document duplicated spans genuinely exist. Dataflow: spans hash
    map-side and ONLY the 32-byte hash shuffles (count-distinct-docs
    per hash with partial aggregation), then one hash equi-join back and a
    per-doc re-agg. Output is the per-document duplication profile
    (span coverage fraction) a curation pipeline thresholds on."""
    docs = table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    # Guard: sequence(1, 0) in Spark yields a DESCENDING [1, 0] (step -1 is
    # inferred), and slice(_, 0, _) then throws — short docs must map to an
    # empty span list, matching DuckDB's empty range(1, 1).
    spans = F.expr(
        f"CASE WHEN size(split(text, ' ')) >= {_SPAN} THEN"
        f" transform(sequence(1, size(split(text, ' ')) - {_SPAN - 1}),"
        f" i -> md5(array_join(slice(split(text, ' '), i, {_SPAN}), ' ')))"
        f" ELSE array() END"
    )
    sp = corpus.select("doc_id", F.explode(spans).alias("h"))
    # ONE corpus pass: per-(hash, doc) occurrence counts, then the distinct
    # document count per hash as a window over that compact grouped frame.
    # The previous dup-hash self-join re-read the corpus for each side
    # (audited 4 document scans); both shuffles here move only the 32-byte
    # hash table, never the text.
    per_doc_hash = sp.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("h"))
    flagged = per_doc_hash.withColumn("isd", (nd >= 2).cast("int"))
    return flagged.groupBy("doc_id").agg(
        F.sum("c").alias("n_spans"),
        F.sum(F.col("c") * F.col("isd")).alias("n_dup_spans"),
        F.round(
            F.sum(F.col("c") * F.col("isd")).cast("double") / F.sum("c"), 6
        ).alias("dup_frac"),
    )


# --- BM25 ranking ----------------------------------------------------------

_BM25_TERMS = ("join", "hash", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "text_bm25",
    oracle=f"""
    WITH dl AS (
        SELECT doc_id, CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS dl
        FROM documents
    ),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
              FROM documents)
        WHERE w IN {_BM25_TERMS!r}
        GROUP BY doc_id, w
    ),
    dfreq AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS dfreq FROM tf GROUP BY w),
    scored AS (
        SELECT tf.doc_id, tf.w,
               ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
                 * tf * ({_BM25_K1} + 1.0)
                 / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
                   AS s
        FROM tf
        JOIN dfreq USING (w)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
    ),
    per_doc AS (
        SELECT doc_id,
               COALESCE(MAX(CASE WHEN w = 'join' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN w = 'hash' THEN s END), 0.0)
             + COALESCE(MAX(CASE WHEN w = 'vector' THEN s END), 0.0) AS score,
               CAST(COUNT(*) AS BIGINT) AS n_terms
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, ROUND(score, 6) AS score, n_terms
    FROM per_doc ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document ranking for a fixed query (k1={_BM25_K1}, b={_BM25_B})
    — the retrieval-side scoring a data catalog needs for "find documents
    about X" (the reference scores keyword relevance per paper;
    /root/reference/dataset_ner/ner_pipeline.py candidate filtering).
    Corpus stats (N, avgdl) are a 1-row broadcast; document frequencies a
    |terms|-row broadcast; the only data-proportional shuffle is the
    (doc_id, term) tf aggregation — map-side combinable, and at 100 TB the
    posting-list layout (bucketed by term) makes even that co-located. The
    per-doc score sums terms in a FIXED order (one conditional max per
    query term) so double addition is reproducible across engines; top-20
    is TakeOrderedAndProject (no global sort)."""
    docs = table(spark, sf_dir, "documents")
    # doc-length table feeds the corpus stats AND the score join — one
    # narrow materialization pass (16 bytes/doc) instead of re-expanding
    # the corpus scan per reference (audited 4 document scans)
    dl = docs.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).cast("double").alias("dl")
    ).localCheckpoint(eager=True)
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    toks = docs.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    tf = (
        toks.filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("dfreq"))
    idf = F.log(
        (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5) + 1.0
    )
    s = (
        idf
        * F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("s", s)
    )
    term_sum = sum(
        (
            F.coalesce(F.max(F.when(F.col("w") == t, F.col("s"))), F.lit(0.0))
            for t in _BM25_TERMS[1:]
        ),
        F.coalesce(F.max(F.when(F.col("w") == _BM25_TERMS[0], F.col("s"))), F.lit(0.0)),
    )
    per_doc = scored.groupBy("doc_id").agg(
        term_sum.alias("score_raw"), F.count(F.lit(1)).alias("n_terms")
    )
    return (
        per_doc.orderBy(F.col("score_raw").desc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", F.round("score_raw", 6).alias("score"), "n_terms")
    )


# --- sliding-window chunking (RAG / context-window prep) -------------------

_CHUNK = 32
_STRIDE = 24


@register(
    "etl_chunk_sliding",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents
    ),
    nchunks AS (
        SELECT doc_id, t, n,
               1 + CAST(ceil(greatest(n - {_CHUNK}, 0) / {_STRIDE}.0) AS BIGINT)
                   AS nc
        FROM toks
    )
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
           CAST(i * {_STRIDE} + 1 AS BIGINT) AS start_tok,
           CAST(LEAST({_CHUNK}, n - i * {_STRIDE}) AS BIGINT) AS n_tokens,
           md5(array_to_string(
               t[i * {_STRIDE} + 1 : i * {_STRIDE} + {_CHUNK}], ' ')) AS chunk_hash
    FROM nchunks, UNNEST(range(0, nc)) AS u(i)
    """,
)
def etl_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking ({_CHUNK}-token windows, stride {_STRIDE},
    {_CHUNK - _STRIDE}-token overlap) — the RAG / context-window prep step:
    every document becomes overlapping retrieval units whose ids and
    boundaries are pure per-row arithmetic. No shuffle at all: chunk count,
    offsets, and hashes are map-side expressions (plan has no Exchange), so
    the operator scales with scan bandwidth. The final chunk is the short
    tail (n_tokens < {_CHUNK}) rather than a re-aligned window, which keeps
    chunk boundaries stable under document append."""
    docs = table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    chunks = docs.select(
        "doc_id",
        t.alias("t"),
        F.size(t).cast("bigint").alias("n"),
    ).withColumn(
        "nc",
        (1 + F.ceil(F.greatest(F.col("n") - _CHUNK, F.lit(0)) / float(_STRIDE))).cast(
            "bigint"
        ),
    )
    return chunks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("nc") - 1)).alias(
            "chunk_id"
        ),
        "t",
        "n",
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * _STRIDE + 1).alias("start_tok"),
        F.least(F.lit(_CHUNK).cast("bigint"), F.col("n") - F.col("chunk_id") * _STRIDE)
        .alias("n_tokens"),
        F.md5(
            F.array_join(
                F.slice(
                    F.col("t"), (F.col("chunk_id") * _STRIDE + 1).cast("int"), _CHUNK
                ),
                " ",
            )
        ).alias("chunk_hash"),
    )


# --- PMI collocations ------------------------------------------------------

_PMI_MIN_COUNT = 10


@register(
    "text_collocations",
    oracle=f"""
    WITH toks AS (
        SELECT string_split(lower(text), ' ') AS t FROM documents
    ),
    uni AS (
        SELECT w, CAST(COUNT(*) AS DOUBLE) AS c
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ),
    n_uni AS (SELECT SUM(c) AS nu FROM uni),
    bi AS (
        SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c_ab
        FROM (
            SELECT t[i] AS w1, t[i + 1] AS w2
            FROM toks, UNNEST(range(1, len(t))) AS u(i)
        ) GROUP BY w1, w2
    ),
    n_bi AS (SELECT SUM(c_ab) AS nb FROM bi)
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS pair_count,
           ROUND(ln((c_ab * nu * nu) / (nb * a.c * b.c)), 6) AS pmi
    FROM bi
    JOIN uni a ON a.w = w1
    JOIN uni b ON b.w = w2
    CROSS JOIN n_uni CROSS JOIN n_bi
    WHERE c_ab >= {_PMI_MIN_COUNT}
    ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20
    """,
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: which adjacent word
    pairs co-occur more than unigram frequencies predict — the statistical
    phrase-detection step (word2vec-style phrase merging, terminology
    extraction for a catalog). One pass produces both count tables
    (map-side combinable shuffles on word / word-pair); unigram counts and
    the two scalar totals broadcast back onto the pair table, so the only
    data-proportional shuffle is the bigram aggregation itself. The PMI
    expression keeps one fixed multiplication grouping on both engine
    sides so doubles compare bit-identically; top-20 is
    TakeOrderedAndProject."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.lower("text"), " ").alias("t"))
    # both count tables are vocab-sized — materialize each once; uni feeds
    # three references (total + both join sides) and the bigram table two
    # (filtered pairs + total), which re-expanded the corpus scan 5x in
    # the audited plan
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    n_uni = uni.agg(F.sum("c").alias("nu"))
    # guard: a 1-token doc would make sequence(1, 0) descend and index
    # t[-1]/t[1] out of range; the oracle's range(1, len(t)) is empty for
    # len=1 and so must this be (r13 shingle-hazard sweep)
    bigrams = toks.select(
        F.expr(
            "CASE WHEN size(t) >= 2 THEN"
            " transform(sequence(1, size(t) - 1), i -> struct(t[i - 1] AS w1, t[i] AS w2))"
            " ELSE array() END"
        ).alias("bs")
    ).select(F.explode("bs").alias("b"))
    bi_counts = (
        bigrams.select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c_ab"))
        .localCheckpoint(eager=True)
    )
    bi = bi_counts.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
    n_bi_full = bi_counts.groupBy().agg(F.sum("c_ab").alias("nb"))
    a = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    b = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    pmi = F.log(
        (F.col("c_ab") * F.col("nu") * F.col("nu"))
        / (F.col("nb") * F.col("c_a") * F.col("c_b"))
    )
    return (
        bi.join(F.broadcast(a), "w1")
        .join(F.broadcast(b), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi_full))
        .withColumn("pmi_raw", pmi)
        .orderBy(F.col("pmi_raw").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("bigint").alias("pair_count"),
            F.round("pmi_raw", 6).alias("pmi"),
        )
    )
