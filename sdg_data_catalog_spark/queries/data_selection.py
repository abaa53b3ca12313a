"""Data-selection and retrieval-evaluation operators (round 5).

The curation ladder's decision layer: given the signals the rest of the
engine computes (lexical scores, embeddings, language mixes, token
streams), these operators decide WHAT to keep, fuse, or flag — the
published methods LLM data pipelines actually run:

- `rank_rrf`         — reciprocal-rank fusion of a lexical and a semantic
                       ranking (Cormack et al., SIGIR'09) — the hybrid-
                       retrieval default in production RAG stacks.
- `agg_ndcg`         — NDCG@10 retrieval quality against label-match
                       relevance (Järvelin & Kekäläinen, TOIS'02).
- `emb_matryoshka_recall` — recall@10 of a 16-dim prefix-truncated
                       ranking vs the full 64-dim ranking (Kusupati et
                       al., "Matryoshka Representation Learning",
                       NeurIPS'22) — the measurement behind shipping
                       truncated embeddings.
- `curation_dsir`    — hashed n-gram importance weights for target-
                       distribution data selection (Xie et al., "Data
                       Selection for Language Models via Importance
                       Resampling", NeurIPS'23).
- `lm_watermark_greenlist` — green-list z-score watermark detection
                       (Kirchenbauer et al., ICML'23), context width 1.
- `ts_anomaly_mad`   — median-absolute-deviation robust anomaly days on
                       ingest volume (the robust twin of dq_anomaly_days'
                       mean/σ z-score — one wild day does not drag the
                       baseline the way it drags a mean).

Cross-engine determinism: token split / md5-bucket arithmetic follow the
repo conventions (feat_hashing_tf, lm_bigram_score); every float SUM that
feeds a hashed comparison is an ORDERED sequential fold (Spark
array_sort+aggregate ≡ DuckDB list_sum(list(x ORDER BY k))), never a
partial-agg SUM whose accumulation order differs between engines.

Reference analog: the reference pipeline selects paragraphs with ad-hoc
keyword scores (`paper_classification/data_preparation.py`); these are
the scale-correct replacements a Spark user would run instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators.similarity import round6
from sdg_data_catalog_spark.queries.registry import register

# Deterministic 64-dim query vector (the udf_bert_classify integer-derived
# weight pattern — reproducible bit-for-bit in any engine, no RNG).
_QVEC = [(((i + 29) * 2654435761) % 1000003 % 97 - 48) / 48.0 for i in range(64)]
_QVEC_SQL = "[" + ", ".join(repr(x) for x in _QVEC) + "]"


def _dot64(col, weights):
    # NOTE r14: an unrolled left-assoc element_at chain (bit-identical
    # fold order, codegen'd) was A/B'd and REJECTED — rank_rrf
    # 0.56 → 0.84 s at sf0.1: wide unrolled chains push the generated
    # method past HotSpot's JIT size threshold and run as uncompiled
    # bytecode, slower than this interpreted HOF fold.
    return F.aggregate(
        F.zip_with(col, F.array(*[F.lit(w) for w in weights]),
                   lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda a, x: a + x,
    )


_RRF_TOP_C = 1000  # per-retriever candidate-list truncation


@register(
    "rank_rrf",
    oracle=f"""
    WITH joined AS (
      SELECT d.doc_id,
             len(list_filter(string_split_regex(lower(d.text), '[^a-z]+'),
                             t -> t = 'data')) AS lex_tf,
             list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE) * ({_QVEC_SQL})[i])) AS sem
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    lex AS (
      SELECT doc_id, rn AS lex_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY lex_tf DESC, doc_id ASC) AS rn
        FROM joined) WHERE rn <= {_RRF_TOP_C}
    ),
    sem AS (
      SELECT doc_id, rn AS sem_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY sem DESC, doc_id ASC) AS rn
        FROM joined) WHERE rn <= {_RRF_TOP_C}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.lex_rank, sem.sem_rank,
             COALESCE(1.0 / (60 + lex.lex_rank), 0)
               + COALESCE(1.0 / (60 + sem.sem_rank), 0) AS rrf
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id,
           CAST(lex_rank AS INTEGER) AS lex_rank,
           CAST(sem_rank AS INTEGER) AS sem_rank,
           ROUND(fused.rrf, 6) AS rrf
    FROM fused
    -- qualified fused.rrf: the bare name would bind to the ROUND(...) output
    -- alias, ordering by the ROUNDED score while the Spark plan orders by
    -- the unrounded one — a <1e-6 gap at the top-20 boundary could then
    -- select different rows
    ORDER BY fused.rrf DESC, doc_id ASC
    LIMIT 20
    """,
)
def rank_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings — lexical (term
    frequency of the query term, map-side token filter) and semantic
    (embedding dot product with the fixed query vector) — rrf(d) =
    Σ 1/(k + rank_i(d)), k=60, over each retriever's TOP-C candidate
    list (C=1000), the parameter-free fusion that wins when score SCALES
    are incomparable but rank orders both carry signal. The truncation
    is enforced BY CONSTRUCTION (r6): each list is cut with
    TakeOrderedAndProject (per-partition local top-C, then a C-row
    driver-side merge — never a corpus-wide window), ranks are assigned
    on the ≤C survivors with an explicit bounded-input single-partition
    window, and the lists fuse by full outer join with absent ranks
    contributing 0 — the standard truncated-RRF semantics. At 100 TB
    nothing in this plan grows past C rows after the scans. Both ranks
    carry unique tie-breaks, so the fused order is total."""
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    toks = F.split(F.lower("text"), "[^a-z]+")
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "doc_id",
        F.size(F.filter(toks, lambda t: t == F.lit("data"))).alias("lex_tf"),
        _dot64(F.col("embedding"), _QVEC).alias("sem"),
    )

    def _toplist(score_col: str, rank_name: str) -> DataFrame:
        top = (
            joined.select("doc_id", score_col)
            .orderBy(F.desc(score_col), F.asc("doc_id"))
            .limit(_RRF_TOP_C)  # TakeOrderedAndProject — no global window
            .coalesce(1)  # bounded (≤ C rows); one partition by construction
        )
        # partition on the (constant, non-foldable) physical partition id —
        # a true single-partition window with no WindowExec warning
        w = Window.partitionBy(F.spark_partition_id()).orderBy(
            F.desc(score_col), F.asc("doc_id")
        )
        return top.select(
            "doc_id", F.row_number().over(w).cast("int").alias(rank_name)
        )

    lex = _toplist("lex_tf", "lex_rank")
    sem = _toplist("sem", "sem_rank")
    fused = lex.join(sem, "doc_id", "full_outer")
    rrf = F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0)) + F.coalesce(
        1.0 / (60 + F.col("sem_rank")), F.lit(0.0)
    )
    return (
        fused.select("doc_id", "lex_rank", "sem_rank", F.round(rrf, 6).alias("rrf"))
        .orderBy(rrf.desc(), F.asc("doc_id"))
        .limit(20)
    )


_COS_FOLD = """list_sum(list_transform(range(1, 65),
    i -> (CAST(q.embedding[i] AS DOUBLE)
          / sqrt(list_sum(list_transform(q.embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))))
       * (CAST(c.embedding[i] AS DOUBLE)
          / sqrt(list_sum(list_transform(c.embedding, y -> CAST(y AS DOUBLE)*CAST(y AS DOUBLE)))))))"""


@register(
    "agg_ndcg",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             CASE WHEN q.label = c.label THEN 1 ELSE 0 END AS rel,
             {_COS_FOLD} AS cos_sim
      FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
    ),
    top AS (
      SELECT query_id, rel, rnk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_sim DESC, cand_id ASC) AS rnk
        FROM scored) WHERE rnk <= 10
    ),
    agg AS (
      SELECT query_id,
             CAST(SUM(rel) AS BIGINT) AS n_rel,
             list_sum(list(rel * ln(CAST(2 AS DOUBLE)) / ln(CAST(1 + rnk AS DOUBLE))
                           ORDER BY rnk)) AS dcg
      FROM top GROUP BY query_id
    )
    SELECT query_id, n_rel,
           ROUND(CASE WHEN n_rel > 0 THEN dcg /
                 list_sum(list_transform(range(1, CAST(n_rel AS INTEGER) + 1),
                     i -> ln(CAST(2 AS DOUBLE)) / ln(CAST(1 + i AS DOUBLE))))
                 ELSE CAST(0 AS DOUBLE) END, 6) AS ndcg_10
    FROM agg
    """,
)
def agg_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per query over the exact cosine top-10, with label-match
    binary relevance (a candidate is relevant iff it shares the query's
    class label) — the ranking-quality metric every retrieval/reranker
    change is judged by. DCG sums rel/log2(1+rank) in rank order via an
    ORDERED fold (never an unordered SUM of doubles — partial-agg order
    is engine- and schedule-dependent); IDCG for binary relevance is the
    closed form Σ_{{i≤n_rel}} 1/log2(1+i), computed from the INTEGER
    relevant count. The query side is 10 broadcast rows; candidates
    stream partition-parallel through the rank window — brute-force here,
    but the metric consumes any top-k table (plug in the IVF/PQ paths for
    the approximate variants)."""
    from sdg_data_catalog_spark.operators import similarity as S

    emb = table(spark, sf_dir, "embeddings")
    # r14 (guide §4.2): per-pair normalize+cosine through the Arrow
    # per-dimension fold (S.unit_cos_pairs — bit-identical chain;
    # 43.8 → 2.7 s (min-of-3) at the 100× replica). candidates_from=0 scores the
    # whole corpus; the self-pair filter is unchanged.
    scored = (
        S.unit_cos_pairs(emb, 10, candidates_from=0)
        .filter(F.col("cand_id") != F.col("anchor_id"))
        .select(
            F.col("anchor_id").alias("query_id"),
            "cand_id",
            F.when(F.col("a_label") == F.col("c_label"), 1).otherwise(0).alias("rel"),
            F.col("cos").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    top = scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)
    ln2 = F.log(F.lit(2.0))
    term = F.col("rel") * ln2 / F.log(1.0 + F.col("rnk"))
    agg = top.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("rnk"), term.alias("t")))),
                lambda s: s.getField("t"),
            ),
            F.lit(0.0), lambda a, x: a + x,
        ).alias("dcg"),
    )
    idcg = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.col("n_rel").cast("int")),
            lambda i: ln2 / F.log(1.0 + i.cast("double")),
        ),
        F.lit(0.0), lambda a, x: a + x,
    )
    return agg.select(
        "query_id", "n_rel",
        F.round(
            F.when(F.col("n_rel") > 0, F.col("dcg") / idcg).otherwise(F.lit(0.0)), 6
        ).alias("ndcg_10"),
    )


@register(
    "emb_matryoshka_recall",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_sum(list_transform(range(1, 65), i -> q.emb[i] * c.emb[i]))
               / (sqrt(list_sum(list_transform(q.emb, y -> y*y)))
                  * sqrt(list_sum(list_transform(c.emb, y -> y*y)))) AS cos_full,
             list_sum(list_transform(range(1, 17), i -> q.emb[i] * c.emb[i]))
               / (sqrt(list_sum(list_transform(range(1, 17), i -> q.emb[i]*q.emb[i])))
                  * sqrt(list_sum(list_transform(range(1, 17), i -> c.emb[i]*c.emb[i])))) AS cos_16
      FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
    ),
    top_full AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_full DESC, cand_id ASC) AS r FROM pairs) WHERE r <= 10
    ),
    top_16 AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cos_16 DESC, cand_id ASC) AS r FROM pairs) WHERE r <= 10
    )
    SELECT f.query_id,
           CAST(COUNT(t.cand_id) AS BIGINT) AS n_common,
           COUNT(t.cand_id) / CAST(10 AS DOUBLE) AS recall_at_10
    FROM top_full f LEFT JOIN top_16 t
      ON t.query_id = f.query_id AND t.cand_id = f.cand_id
    GROUP BY f.query_id
    """,
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: recall@10 of the 16-dim PREFIX of each
    embedding against the full 64-dim cosine ranking — the number that
    decides whether the serving tier can ship 4× smaller vectors. Both
    rankings are computed in one pass over the same candidate join (two
    fold expressions per pair, no second scan), then the top-10 sets
    intersect via an equi-join on (query, candidate). Recall is an exact
    integer/10 — no float-sum hashing risk. At 100 TB the candidate join
    is replaced by any registered ANN path; the audit's shape (two
    rankings → windowed top-k → set intersection) is unchanged."""
    emb = table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("emb"),
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("c_emb"))

    def fold(col):
        return F.aggregate(col, F.lit(0.0), lambda a, x: a + x)

    def dotn(n):
        return fold(F.transform(
            F.sequence(F.lit(1), F.lit(n)),
            lambda i: F.element_at("q_emb", i) * F.element_at("c_emb", i),
        ))

    def norm_prefix(col, n):
        return F.sqrt(fold(F.transform(
            F.sequence(F.lit(1), F.lit(n)),
            lambda i: F.element_at(col, i) * F.element_at(col, i),
        )))

    cos_full = dotn(64) / (
        F.sqrt(fold(F.transform("q_emb", lambda y: y * y)))
        * F.sqrt(fold(F.transform("c_emb", lambda y: y * y)))
    )
    cos_16 = dotn(16) / (norm_prefix("q_emb", 16) * norm_prefix("c_emb", 16))
    # both rankings window over the SAME scored pair table — materialize
    # it once (|queries| x N rows, the set being ranked anyway) instead of
    # re-running the candidate join per ranking (audited 4 embeddings
    # scans before)
    pairs = (
        c.join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cos_full.alias("cos_full"), cos_16.alias("cos_16"))
        .localCheckpoint(eager=True)
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("cos_full"), F.asc("cand_id"))
    w16 = Window.partitionBy("query_id").orderBy(F.desc("cos_16"), F.asc("cand_id"))
    top_full = (
        pairs.withColumn("r", F.row_number().over(wf))
        .filter(F.col("r") <= 10).select("query_id", "cand_id")
    )
    top_16 = (
        pairs.withColumn("r", F.row_number().over(w16))
        .filter(F.col("r") <= 10).select("query_id", "cand_id")
    )
    hit = top_16.withColumn("hit", F.lit(1))
    return (
        top_full.join(hit, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("hit").cast("bigint").alias("n_common"),
            (F.count("hit") / F.lit(10.0)).alias("recall_at_10"),
        )
    )


_DSIR_B = 128  # hashed feature buckets


@register(
    "curation_dsir",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {_DSIR_B}
                  AS BIGINT) AS bucket
      FROM (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
        FROM documents)
      WHERE tok <> ''
    ),
    raw AS (SELECT bucket, COUNT(*) AS ca FROM toks GROUP BY bucket),
    tgt AS (SELECT bucket, COUNT(*) AS ct FROM toks WHERE lang = 'en' GROUP BY bucket),
    tot AS (SELECT (SELECT COUNT(*) FROM toks) AS ta,
                   (SELECT COUNT(*) FROM toks WHERE lang = 'en') AS tt),
    lr AS (
      SELECT raw.bucket,
             ln(CAST(COALESCE(tgt.ct, 0) + 1 AS DOUBLE) / (tot.tt + {_DSIR_B}))
           - ln(CAST(raw.ca + 1 AS DOUBLE) / (tot.ta + {_DSIR_B})) AS logratio
      FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket CROSS JOIN tot
    ),
    per_doc AS (
      SELECT t.doc_id, t.bucket, ANY_VALUE(t.lang) AS lang,
             COUNT(*) * ANY_VALUE(lr.logratio) AS term
      FROM toks t JOIN lr ON lr.bucket = t.bucket
      GROUP BY t.doc_id, t.bucket
    ),
    wts AS (
      SELECT doc_id, ANY_VALUE(lang) AS lang,
             list_sum(list(term ORDER BY bucket)) AS w
      FROM per_doc GROUP BY doc_id
    )
    SELECT doc_id, lang, FLOOR(w * 1e6) / 1e6 AS dsir_logweight
    FROM wts
    ORDER BY w DESC, doc_id ASC
    LIMIT 50
    """,
)
def curation_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: log p_target(x) − log p_raw(x) over hashed
    unigram features (Xie et al., NeurIPS'23) — rank raw-corpus documents
    by how target-like they are (target = the 'en' slice here) and keep
    the top of the list. The two feature distributions are add-one-
    smoothed count ratios over a FIXED {_DSIR_B}-bucket hashed space: no
    vocabulary table at any corpus size, the bucket stats are two
    broadcast-sized aggregates, and the per-document weight is one
    ordered fold over its own bucket counts. Plan: explode → combinable
    (doc, bucket) count → broadcast log-ratio join → per-doc ordered fold
    → TakeOrdered top-50. Every input to the fold is an exact integer
    count ratio; the fold order (bucket asc) is pinned on both engines.

    r15 measured-and-REJECTED: an Arrow mapInPandas bucket-count kernel
    (per-batch np.unique over the token stream + per-distinct-token md5
    memo, complete (doc, bucket) rows with no explode and no count
    Exchange) measured min-of-N 2.77/3.24 s vs 2.56/2.68/3.02 s for this
    form at the 100x replica (same window, interleaved) — the
    object-dtype np.unique sort over ~100M tokens costs more than the
    JVM's codegen'd per-occurrence md5 + partially-aggregated count, so
    the explode form stays."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok"),
    ).filter(F.col("tok") != "")
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % _DSIR_B
    ).alias("bucket")
    tb = toks.select("doc_id", "lang", bucket)
    # ONE pass over the exploded tokens: everything downstream (bucket
    # marginals, totals, per-doc terms) derives from the (doc, bucket)
    # count table, which is persisted — the previous form consumed the
    # explode+md5 subtree four times (raw/tgt/tot/per_doc), which at the
    # 100× tier meant four passes over 100M hashed tokens (35 s+; this
    # form is one pass). Counts are exact integers, so re-deriving the
    # marginals from cnt is bit-identical to counting the tokens directly.
    from pyspark import StorageLevel

    cnt = (
        tb.groupBy("doc_id", "bucket")
        .agg(F.any_value("lang").alias("lang"), F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    is_en = F.col("lang") == "en"
    bstats = cnt.groupBy("bucket").agg(
        F.sum("n").alias("ca"),
        F.sum(F.when(is_en, F.col("n")).otherwise(F.lit(0))).alias("ct"),
    )
    tot = bstats.agg(F.sum("ca").alias("ta"), F.sum("ct").alias("tt"))
    lr = (
        bstats.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log((F.col("ct") + 1).cast("double") / (F.col("tt") + _DSIR_B))
                - F.log((F.col("ca") + 1).cast("double") / (F.col("ta") + _DSIR_B))
            ).alias("logratio"),
        )
    )
    per_doc = (
        cnt.join(F.broadcast(lr), "bucket")
        .select("doc_id", "bucket", "lang", (F.col("n") * F.col("logratio")).alias("term"))
    )
    wts = per_doc.groupBy("doc_id").agg(
        F.any_value("lang").alias("lang"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("bucket"), F.col("term").alias("t")))),
                lambda s: s.getField("t"),
            ),
            F.lit(0.0), lambda a, x: a + x,
        ).alias("w"),
    )
    return (
        wts.select(
            "doc_id", "lang", (F.floor(F.col("w") * 1e6) / 1e6).alias("dsir_logweight"), "w"
        )
        .orderBy(F.desc("w"), F.asc("doc_id"))
        .limit(50)
        .select("doc_id", "lang", "dsir_logweight")
    )


@register(
    "lm_watermark_greenlist",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split_regex(lower(text), '[^a-z]+') AS toks
      FROM documents
    ),
    counted AS (
      SELECT doc_id,
             len(list_filter(range(1, len(toks)),
                 i -> toks[i] <> '' AND toks[i+1] <> '')) AS n_pairs,
             len(list_filter(range(1, len(toks)),
                 i -> toks[i] <> '' AND toks[i+1] <> ''
                      AND CAST(('0x' || substr(md5(toks[i] || '|' || toks[i+1]), 1, 8))
                               AS BIGINT) % 2 = 0)) AS n_green
      FROM t WHERE len(toks) >= 2
    )
    SELECT doc_id, CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_green AS BIGINT) AS n_green,
           FLOOR((2.0 * n_green - n_pairs) / sqrt(CAST(n_pairs AS DOUBLE)) * 1e6)
             / 1e6 AS z_score,
           (2.0 * n_green - n_pairs) / sqrt(CAST(n_pairs AS DOUBLE)) > 2.0
             AS watermarked
    FROM counted WHERE n_pairs >= 20
    """,
)
def lm_watermark_greenlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Green-list watermark detection (Kirchenbauer et al., ICML'23): with
    a context-1 watermark, each token is 'green' iff
    hash(prev_token, token) lands in the green half of the vocabulary;
    watermarked text shows a green fraction far above 1/2. The detector
    is the one-proportion z-score z = (2g − n)/√n over a document's n
    adjacent token pairs, flagged at z > 2. Entirely map-side: the pair
    scan, md5 green test, and both counts are per-row array expressions
    (no explode, no shuffle at all — the 100 TB plan is a single pass),
    and z is one double expression over two exact integers. Docs with
    <20 pairs are excluded (the z approximation is meaningless there)."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), "[^a-z]+")
    d = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    idx = F.sequence(F.lit(1), F.size("toks") - 1)

    def pair_ok(i):
        return (F.element_at("toks", i) != "") & (
            F.element_at("toks", F.lit(1) + i) != ""
        )

    def green(i):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.element_at("toks", i),
                        F.lit("|"),
                        F.element_at("toks", F.lit(1) + i),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        return pair_ok(i) & (h % 2 == 0)

    counted = d.select(
        "doc_id",
        F.size(F.filter(idx, pair_ok)).cast("bigint").alias("n_pairs"),
        F.size(F.filter(idx, green)).cast("bigint").alias("n_green"),
    ).filter(F.col("n_pairs") >= 20)
    z = (2.0 * F.col("n_green") - F.col("n_pairs")) / F.sqrt(
        F.col("n_pairs").cast("double")
    )
    return counted.select(
        "doc_id", "n_pairs", "n_green",
        (F.floor(z * 1e6) / 1e6).alias("z_score"),
        (z > 2.0).alias("watermarked"),
    )


@register(
    "ts_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             COUNT(*) AS n
      FROM events GROUP BY event_type, day
    ),
    med AS (
      SELECT event_type, quantile_cont(CAST(n AS DOUBLE), 0.5) AS med
      FROM daily GROUP BY event_type
    ),
    mad AS (
      SELECT d.event_type,
             ANY_VALUE(m.med) AS med,
             quantile_cont(abs(d.n - m.med), 0.5) AS mad
      FROM daily d JOIN med m ON m.event_type = d.event_type
      GROUP BY d.event_type
    )
    SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n,
           ROUND(m.med, 6) AS med, ROUND(m.mad, 6) AS mad,
           ROUND(abs(d.n - m.med), 6) AS deviation,
           abs(d.n - m.med) > 3.0 * CAST(1.4826 AS DOUBLE) * m.mad
             AS is_anomaly
    FROM daily d JOIN mad m ON m.event_type = d.event_type
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust ingest-volume anomaly days per event type via median
    absolute deviation: |count − median| > 3·1.4826·MAD (1.4826 scales
    MAD to σ under normality). The robust twin of dq_anomaly_days'
    mean/σ z-score — one wild day inflates a mean AND its σ enough to
    hide itself; it cannot drag a median. Exactness across engines: the
    daily counts are integers, both medians are the standard linear
    interpolation of integer order statistics (exact halves/quarters in
    doubles — Spark percentile ≡ DuckDB quantile_cont), and the flag
    compares exactly-representable values. The aggregate frame is
    |types|×|days| — metadata-sized at any event volume; the only
    corpus-wide work is the combinable daily count."""
    ev = table(spark, sf_dir, "events")
    # |types| x |days| rows; feeds the median, the MAD join, and the final
    # join — one combinable corpus pass, not three (audited 3 events scans)
    daily = ev.groupBy(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=True)
    med = daily.groupBy("event_type").agg(
        F.percentile(F.col("n").cast("double"), F.lit(0.5)).alias("med")
    )
    mad = (
        daily.join(med, "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.percentile(
                F.abs(F.col("n") - F.col("med")), F.lit(0.5)
            ).alias("mad"),
        )
    )
    dev = F.abs(F.col("n") - F.col("med"))
    return daily.join(F.broadcast(mad), "event_type").select(
        "event_type", "day", F.col("n").cast("bigint").alias("n"),
        F.round("med", 6).alias("med"), F.round("mad", 6).alias("mad"),
        F.round(dev, 6).alias("deviation"),
        (dev > 3.0 * F.lit(1.4826) * F.col("mad")).alias("is_anomaly"),
    )


@register(
    "curation_pareto_front",
    oracle="""
    WITH scored AS (
      SELECT doc_id, n_chars,
             len(list_distinct(list_filter(
                 string_split_regex(lower(text), '[^a-z]+'), t -> t <> '')))
               / CAST(len(list_filter(
                 string_split_regex(lower(text), '[^a-z]+'), t -> t <> ''))
                 AS DOUBLE) AS ttr
      FROM documents
      WHERE len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                            t -> t <> '')) > 0
    ),
    swept AS (
      SELECT doc_id, n_chars, ttr,
             MAX(ttr) OVER (ORDER BY n_chars DESC
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_ge,
             MAX(ttr) OVER (ORDER BY n_chars DESC
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_gt
      FROM scored
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           ROUND(ttr, 6) AS ttr
    FROM swept
    WHERE NOT (m_ge > ttr) AND (m_gt IS NULL OR m_gt < ttr)
    """,
)
def curation_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-front document selection over two quality objectives —
    length (n_chars) and lexical diversity (type-token ratio) — the
    multi-objective keep-set no single weighted score can express: a doc
    survives iff NO other doc is at least as good on both axes and
    strictly better on one. Computed with the classic sweep, not an
    O(N²) dominance join: order by n_chars desc, then a doc is
    dominated iff max(ttr) over docs with n_chars ≥ its own exceeds its
    ttr (m_ge, CURRENT ROW range frame — self can never exceed itself)
    or max(ttr) over STRICTLY greater n_chars ties it (m_gt, 1 PRECEDING
    range frame over the integer key). Both objectives are exact integer
    ratios, and RANGE frames over an integer key have identical ANSI
    semantics in both engines. Runs as the TWO-PHASE sweep: phase 1
    sweeps each shard in parallel (window partitioned by shard id — a
    doc dominated by a shard-mate is dominated globally, so dropping it
    is safe; every globally non-dominated doc survives its shard), phase
    2 re-sweeps only the unioned local fronts — front-sized, not
    corpus-sized — so no corpus-wide single-partition window ever runs.
    Phase 2's result is exactly the one-pass global front."""
    docs = table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
    scored = docs.select(
        "doc_id", "n_chars",
        (F.size(F.array_distinct(toks)) / F.size(toks).cast("double")).alias("ttr"),
    ).filter(F.size(toks) > 0)

    def _sweep(df: DataFrame, part_col: str) -> DataFrame:
        w_ge = (
            Window.partitionBy(part_col)
            .orderBy(F.desc("n_chars"))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_gt = (
            Window.partitionBy(part_col)
            .orderBy(F.desc("n_chars"))
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        swept = df.select(
            "doc_id", "n_chars", "ttr", part_col,
            F.max("ttr").over(w_ge).alias("m_ge"),
            F.max("ttr").over(w_gt).alias("m_gt"),
        )
        return swept.filter(
            ~(F.col("m_ge") > F.col("ttr"))
            & (F.col("m_gt").isNull() | (F.col("m_gt") < F.col("ttr")))
        ).select("doc_id", "n_chars", "ttr")

    # Phase 1: shard-local fronts in parallel. Any hash sharding is
    # correct — a local dominator is a global dominator.
    sharded = scored.withColumn("shard", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(32)))
    local_front = _sweep(sharded, "shard")
    # Phase 2: exact global front over the (front-sized) union of local
    # fronts, coalesced to one partition; the constant physical partition
    # id is a non-foldable partition key, so the bounded single-partition
    # window is explicit and warning-free.
    merged = local_front.coalesce(1).withColumn("g", F.spark_partition_id())
    return _sweep(merged, "g").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"),
        F.round("ttr", 6).alias("ttr"),
    )


@register(
    "agg_source_vocab_jaccard",
    oracle=f"""
    WITH sb AS (
      SELECT DISTINCT source,
             CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % {128}
                  AS BIGINT) AS bucket
      FROM (
        SELECT source,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
        FROM documents)
      WHERE tok <> ''
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM sb GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM sb a JOIN sb b ON a.bucket = b.bucket AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
           ROUND(n_common / CAST(sa.n + sb2.n - n_common AS DOUBLE), 6)
             AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = src_a
    JOIN sizes sb2 ON sb2.source = src_b
    """,
)
def agg_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources, as Jaccard similarity
    of their occupied hashed-vocab buckets — the domain-similarity matrix
    curators read before mixing sources (two crawls with near-identical
    vocabularies add less diversity than their row counts suggest). The
    hashed space caps every per-source set at 128 buckets REGARDLESS of
    corpus size, so the pairwise join is |sources|²·128 at worst —
    metadata-sized — while the corpus is touched exactly once by the
    combinable DISTINCT. Jaccard = |∩| / (|A| + |B| − |∩|), all exact
    integers until the final division."""
    docs = table(spark, sf_dir, "documents")
    # r14 A/B'd and REJECTED: regexp_extract_all('[a-z]+') tokenization
    # (the curation_quality idiom) measured 6.56 → 6.87 s at the 100×
    # replica — this op is bound by the (source, bucket) DISTINCT and the
    # per-token md5, not the split, and the extract-all array build costs
    # more than the empty-token filter it removes here.
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok")
    ).filter(F.col("tok") != "")
    # sb is metadata-sized (<= |sources| x 128 rows) and feeds sizes plus
    # both join sides — materialize once so the corpus is touched exactly
    # once, as the docstring promises (audited 4 document scans before)
    sb = (
        toks.select(
            "source",
            (F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % 128)
            .alias("bucket"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sb.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = sb.select(F.col("source").alias("src_a"), "bucket")
    b = sb.select(F.col("source").alias("src_b"), "bucket")
    inter = (
        a.join(b, "bucket")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    sb2 = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb2), "src_b")
        .select(
            "src_a", "src_b", F.col("n_common").cast("bigint").alias("n_common"),
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


@register(
    "ts_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             COUNT(*) AS n
      FROM events GROUP BY event_type, day
    ),
    m AS (
      SELECT event_type,
             CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS d_days
      FROM daily GROUP BY event_type
    ),
    cum AS (
      SELECT d.event_type, d.day, m.d_days,
             SUM(d.n * m.d_days - m.total) OVER (PARTITION BY d.event_type
                 ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS s
      FROM daily d JOIN m ON m.event_type = d.event_type
    ),
    stat AS (
      SELECT event_type, day,
             (s - MIN(s) OVER (PARTITION BY event_type
                 ORDER BY day ROWS UNBOUNDED PRECEDING))
               / CAST(d_days AS DOUBLE) AS lift
      FROM cum
    )
    SELECT event_type, day AS change_day,
           FLOOR(lift * 1e6) / 1e6 AS cusum_stat
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY lift DESC, day ASC) AS rn
      FROM stat) WHERE rn = 1
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM upward-changepoint detection on daily ingest volume: the
    cumulative sum of (count − mean) drifts down before a level shift
    and climbs after it, so the day maximizing S_t − min_{u≤t} S_u is
    the most likely changepoint and the lift is the evidence (Page 1954,
    the sequential-analysis classic). Everything is windowed — running
    sum and running min over the day order, then an argmax row per type
    with an earliest-day tie-break; the aggregate frame is |types|×|days|
    so the windows never see raw events. Determinism: the running sum is
    kept in INTEGERS by scaling through the day count — Σ(n·D − total)
    instead of Σ(n − total/D) — because a windowed SUM of doubles is a
    segment-tree combine in some engines (not a left fold) and could
    drift an ulp; the single division to doubles happens after the
    order-free integer MIN."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = daily.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("d_days"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.join(F.broadcast(m), "event_type").select(
        "event_type", "day", "d_days",
        F.sum(F.col("n") * F.col("d_days") - F.col("total")).over(w_cum).alias("s"),
    )
    stat = cum.select(
        "event_type", "day",
        ((F.col("s") - F.min("s").over(w_cum)) / F.col("d_days").cast("double")).alias("lift"),
    )
    w_rank = Window.partitionBy("event_type").orderBy(F.desc("lift"), F.asc("day"))
    return (
        stat.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            "event_type", F.col("day").alias("change_day"),
            (F.floor(F.col("lift") * 1e6) / 1e6).alias("cusum_stat"),
        )
    )


def _kcenter_oracle(k: int = 10) -> str:
    """Unrolled greedy k-center (farthest-point traversal): like the MMR
    oracle, the inherently sequential argmax loop becomes k chained
    MATERIALIZED CTEs. Every distance is the same sequential fold on both
    engines and the per-candidate distance-to-set is a MIN (order-free
    comparison), so the selection reproduces bit-for-bit."""
    dist = """list_sum(list_transform(range(1, 65),
                 j -> (e.emb[j] - c.emb[j]) * (e.emb[j] - c.emb[j])))"""
    parts = ["""
WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
s1 AS MATERIALIZED (SELECT vec_id, emb, CAST(0 AS DOUBLE) AS d FROM e
      ORDER BY vec_id ASC LIMIT 1),
ch1 AS MATERIALIZED (SELECT vec_id, emb FROM s1)"""]
    for i in range(2, k + 1):
        prev = i - 1
        parts.append(f""",
s{i} AS MATERIALIZED (
  SELECT vec_id, emb, d FROM (
    SELECT e.vec_id, e.emb, MIN({dist}) AS d
    FROM e CROSS JOIN ch{prev} c
    WHERE e.vec_id NOT IN (SELECT vec_id FROM ch{prev})
    GROUP BY e.vec_id, e.emb)
  ORDER BY d DESC, vec_id ASC LIMIT 1
),
ch{i} AS MATERIALIZED (SELECT vec_id, emb FROM ch{prev}
       UNION ALL SELECT vec_id, emb FROM s{i})""")
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS rank, vec_id, d FROM s{i}" for i in range(1, k + 1)
    )
    parts.append(f"""
SELECT CAST(rank AS INTEGER) AS rank, vec_id,
       ROUND(d, 6) AS dist2_to_set
FROM ({union})""")
    return "".join(parts)


@register("sample_coreset_kcenter", oracle=_kcenter_oracle())
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal,
    Gonzalez 1985 — the 2-approximation every diversity-coverage sampler
    builds on): start from the lowest-id vector, then repeatedly add the
    point FARTHEST from the chosen set (max over candidates of min
    squared-L2 to any chosen). Where rank_mmr trades relevance against
    redundancy over a retrieved pool, k-center is pure COVERAGE over the
    whole corpus — the eval-set / annotation-budget sampler. Dataflow:
    the chosen set stays a ≤k-row broadcast literal; each of the k
    rounds is ONE map-side pass (codegen'd least-of-folds distance) plus
    a TakeOrdered(1) — no pairwise matrix, no driver-side pool, so the
    pattern survives 100 TB (production would run it on a pre-sampled
    shard exactly like PQ codebook training; the per-round full pass is
    the honest cost of the exact greedy). Distances are sequential
    folds; argmax ties break on vec_id; the selection hash-matches an
    unrolled-CTE SQL replay of the same greedy."""
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    chosen = [(1, int(seed.vec_id), 0.0, [float(x) for x in seed.emb])]
    for rank in range(2, 11):
        dists = [
            F.aggregate(
                F.zip_with(
                    "emb",
                    F.array(*[F.lit(v) for v in c_emb]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for (_, _, _, c_emb) in chosen
        ]
        d = dists[0] if len(dists) == 1 else F.least(*dists)
        picked = (
            emb.filter(~F.col("vec_id").isin([c[1] for c in chosen]))
            .select("vec_id", "emb", d.alias("d"))
            .orderBy(F.desc("d"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]  # 1 row per round — bounded by design
        )
        chosen.append(
            (rank, int(picked.vec_id), float(picked.d), [float(x) for x in picked.emb])
        )
    return spark.createDataFrame(
        [(r, v, round6(dd)) for (r, v, dd, _) in chosen],
        "rank INT, vec_id BIGINT, dist2_to_set DOUBLE",
    )


@register(
    "agg_tail_index_hill",
    oracle="""
    WITH ranked AS (
      SELECT n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rnk
      FROM documents
    ),
    thresh AS (SELECT CAST(n_chars AS DOUBLE) AS xk1 FROM ranked WHERE rnk = 101),
    terms AS (
      SELECT r.rnk, ln(CAST(r.n_chars AS DOUBLE) / t.xk1) AS term
      FROM ranked r CROSS JOIN thresh t WHERE r.rnk <= 100
    )
    SELECT CAST(100 AS BIGINT) AS k,
           CAST((SELECT xk1 FROM thresh) AS BIGINT) AS x_threshold,
           FLOOR(list_sum(list(term ORDER BY rnk)) / 100 * 1e6) / 1e6
             AS hill_inv_alpha,
           FLOOR(100 / list_sum(list(term ORDER BY rnk)) * 1e6) / 1e6
             AS alpha
    FROM terms
    """,
)
def agg_tail_index_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the document-length tail index: over the top
    k=100 order statistics, 1/α̂ = (1/k)·Σ ln(x_(i)/x_(k+1)) (Hill 1975)
    — THE number behind every skew decision in this engine: α ≤ 2 means
    the length distribution has infinite variance and partition-by-doc
    plans need salting/AQE-skew handling (join_salted,
    diag_partition_skew); α well above 2 means uniform chunking is safe.
    Complements text_zipf_slope (vocabulary tail) and
    agg_gini_concentration (mass concentration) with the extreme-value
    view. Distributed shape: one TakeOrdered(k+1) over the corpus (no
    global sort — the window in the oracle is the SQL spelling; Spark
    runs a top-k heap), then k logs folded in rank order; every input is
    an integer order statistic, so both engines fold identical doubles."""
    docs = table(spark, sf_dir, "documents")
    k = 100
    top = (
        docs.select("n_chars", "doc_id")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(k + 1)
        .coalesce(1)
    )
    # bounded input (k+1 rows, one partition); partition on the constant
    # physical partition id — no WindowExec warning, same total order
    w = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = top.select("n_chars", F.row_number().over(w).alias("rnk"))
    thresh = ranked.filter(F.col("rnk") == k + 1).select(
        F.col("n_chars").cast("double").alias("xk1")
    )
    terms = (
        ranked.filter(F.col("rnk") <= k)
        .crossJoin(F.broadcast(thresh))
        .select(
            "rnk",
            F.log(F.col("n_chars").cast("double") / F.col("xk1")).alias("term"),
            "xk1",
        )
    )
    ssum = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("rnk"), F.col("term").alias("t")))),
            lambda s: s.getField("t"),
        ),
        F.lit(0.0), lambda a, x: a + x,
    )
    return terms.groupBy().agg(
        F.lit(k).cast("bigint").alias("k"),
        F.any_value("xk1").cast("bigint").alias("x_threshold"),
        (F.floor(ssum / k * 1e6) / 1e6).alias("hill_inv_alpha"),
        (F.floor(k / ssum * 1e6) / 1e6).alias("alpha"),
    )


@register(
    "dq_drift_ks",
    oracle="""
    WITH tagged AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END
               AS period,
             value
      FROM events
    ),
    vc AS (
      SELECT event_type, value,
             COUNT(CASE WHEN period = 'a' THEN 1 END) AS ca,
             COUNT(CASE WHEN period = 'b' THEN 1 END) AS cb
      FROM tagged GROUP BY event_type, value
    ),
    tot AS (
      SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb
      FROM vc GROUP BY event_type
    ),
    cdf AS (
      SELECT v.event_type,
             SUM(v.ca) OVER (PARTITION BY v.event_type ORDER BY v.value
                 ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(v.cb) OVER (PARTITION BY v.event_type ORDER BY v.value
                 ROWS UNBOUNDED PRECEDING) AS cum_b,
             t.na, t.nb
      FROM vc v JOIN tot t ON t.event_type = v.event_type
    )
    SELECT event_type,
           CAST(ANY_VALUE(na) AS BIGINT) AS n_a,
           CAST(ANY_VALUE(nb) AS BIGINT) AS n_b,
           FLOOR(MAX(abs(CAST(cum_a AS DOUBLE) / na
                         - CAST(cum_b AS DOUBLE) / nb)) * 1e6) / 1e6 AS ks_d,
           MAX(abs(CAST(cum_a AS DOUBLE) / na - CAST(cum_b AS DOUBLE) / nb))
             > CAST(1.358 AS DOUBLE)
               * sqrt((ANY_VALUE(na) + ANY_VALUE(nb))
                      / (CAST(ANY_VALUE(na) AS DOUBLE) * ANY_VALUE(nb)))
             AS drift
    FROM cdf GROUP BY event_type
    """,
)
def dq_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test on the event-value
    distribution between ingest periods (first half of the month vs the
    rest) — the FULL-distribution monitor beside dq_profile_drift's
    Welch-z (mean shift only) and dq_divergence_js (categorical): KS
    catches variance/shape changes that leave the mean untouched.
    D = max_v |F_a(v) − F_b(v)| computed exactly: per-(type, value)
    integer counts, two cumulative INTEGER sums over the value order
    (exact regardless of window-combine strategy), one division per
    distinct value, and an order-free MAX; the α=0.05 rejection
    threshold is 1.358·√((n_a+n_b)/(n_a·n_b)). The windowed frame is
    |types|×|distinct values| — the corpus is touched once by the
    combinable count."""
    ev = table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "a")
        .otherwise("b").alias("period"),
        "value",
    )
    vc = tagged.groupBy("event_type", "value").agg(
        F.count(F.when(F.col("period") == "a", 1)).alias("ca"),
        F.count(F.when(F.col("period") == "b", 1)).alias("cb"),
    )
    tot = vc.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = vc.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        "na", "nb",
    )
    diff = F.abs(
        F.col("cum_a").cast("double") / F.col("na")
        - F.col("cum_b").cast("double") / F.col("nb")
    )
    return cdf.groupBy("event_type").agg(
        F.any_value("na").cast("bigint").alias("n_a"),
        F.any_value("nb").cast("bigint").alias("n_b"),
        (F.floor(F.max(diff) * 1e6) / 1e6).alias("ks_d"),
        (
            F.max(diff)
            > F.lit(1.358)
            * F.sqrt(
                (F.any_value("na") + F.any_value("nb"))
                / (F.any_value("na").cast("double") * F.any_value("nb"))
            )
        ).alias("drift"),
    )


@register(
    "agg_top_paths",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             MAX(CASE WHEN rn = 1 THEN event_type END) || '>' ||
             MAX(CASE WHEN rn = 2 THEN event_type END) || '>' ||
             MAX(CASE WHEN rn = 3 THEN event_type END) AS path
      FROM ranked WHERE rn <= 3
      GROUP BY user_id
      HAVING COUNT(*) = 3
    )
    SELECT path, CAST(n AS BIGINT) AS n_users
    FROM (
      SELECT path, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path ASC) AS rnk
      FROM paths GROUP BY path)
    WHERE rnk <= 10
    """,
)
def agg_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 opening user journeys: each user's first three events (by
    timestamp, event_id tie-break) concatenated into a path, counted
    across users — the product-analytics readout `agg_markov_transitions`
    can't give (full sequences vs pairwise transition rates; 'signup >
    view > purchase' and 'view > signup > purchase' have identical
    transition mass but very different funnels). Plan: one per-user rank
    window, a pivot-style MAX(CASE) per position (deterministic — no
    array-ordering ambiguity between engines), a combinable path count,
    TakeOrdered top-10 with a path tie-break. Users with fewer than three
    events are excluded (no partial paths). All integers and strings —
    nothing floats."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    paths = (
        ranked.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.concat_ws(
                ">",
                F.max(F.when(F.col("rn") == 1, F.col("event_type"))),
                F.max(F.when(F.col("rn") == 2, F.col("event_type"))),
                F.max(F.when(F.col("rn") == 3, F.col("event_type"))),
            ).alias("path"),
        )
        .filter(F.col("k") == 3)
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    return (
        counts.orderBy(F.desc("n_users"), F.asc("path"))
        .limit(10)
        .select("path", F.col("n_users").cast("bigint").alias("n_users"))
    )


@register(
    "text_boilerplate_df",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    tri AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
      FROM toks WHERE len(t) >= 3
    ),
    nd AS (SELECT source, COUNT(DISTINCT doc_id) AS n_docs FROM tri GROUP BY source),
    dfreq AS (
      SELECT source, gram, COUNT(*) AS df FROM tri GROUP BY source, gram
    )
    SELECT d.source, d.gram, CAST(d.df AS BIGINT) AS df,
           ROUND(CAST(d.df AS DOUBLE) / n.n_docs, 6) AS df_frac
    FROM dfreq d JOIN nd n ON n.source = d.source
    WHERE d.df >= 3
    """,
)
def text_boilerplate_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate phrase detection: 3-grams whose document
    frequency WITHIN a source crosses a threshold (df ≥ 3) — the CCNet /
    trafilatura-style signal for nav bars, cookie banners, and template
    footers that repeat across one domain's pages but are invisible to
    corpus-wide line dedup (dedup_lines catches global repeats; a phrase
    on 80% of ONE source's pages can still be globally rare). The report
    is what feeds a per-domain strip list. Plan: per-doc DISTINCT grams
    (a phrase counts once per doc), one combinable (source, gram) count,
    a broadcast per-source doc-count join — the gram table is the only
    corpus-sized intermediate and it shuffles once. Counts and the
    df/n_docs fraction are exact integers and one division."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("t"))
    tri = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id", "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("t", i),
                        F.element_at("t", i + F.lit(1)),
                        F.element_at("t", i + F.lit(2)),
                    ),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    nd = tri.groupBy("source").agg(F.countDistinct("doc_id").alias("n_docs"))
    dfreq = tri.groupBy("source", "gram").agg(F.count(F.lit(1)).alias("df"))
    return (
        dfreq.filter(F.col("df") >= 3)
        .join(F.broadcast(nd), "source")
        .select(
            "source", "gram", F.col("df").cast("bigint").alias("df"),
            F.round(F.col("df").cast("double") / F.col("n_docs"), 6).alias("df_frac"),
        )
    )


@register(
    "agg_dedup_impact_report",
    oracle="""
    WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               substr(text, strpos(text, ' ') + 1) AS text
        FROM documents
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
        FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.6
    ),
    edges AS (
        SELECT doc_a AS s, doc_b AS d FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS doc_id, LEAST(s, MIN(d)) AS component
             FROM reach GROUP BY s),
    lens AS (SELECT doc_id, length(text) AS n FROM corpus),
    canon AS (
        SELECT component, doc_id AS canonical_id FROM (
            SELECT c.component, c.doc_id,
                   ROW_NUMBER() OVER (PARTITION BY c.component
                       ORDER BY l.n DESC, c.doc_id ASC) AS rn
            FROM comp c JOIN lens l ON l.doc_id = c.doc_id) WHERE rn = 1
    ),
    mapping AS (
        SELECT c.doc_id, canon.canonical_id
        FROM comp c JOIN canon ON canon.component = c.component
        UNION ALL
        SELECT doc_id, doc_id AS canonical_id FROM corpus
        WHERE doc_id NOT IN (SELECT doc_id FROM comp)
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN m.doc_id = m.canonical_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(l.n) AS BIGINT) AS chars_total,
           CAST(SUM(CASE WHEN m.doc_id = m.canonical_id THEN l.n ELSE 0 END)
                AS BIGINT) AS chars_kept,
           FLOOR(SUM(CASE WHEN m.doc_id = m.canonical_id THEN l.n ELSE 0 END)
                 / CAST(SUM(l.n) AS DOUBLE) * 1e6) / 1e6 AS frac_chars_kept
    FROM mapping m
    JOIN lens l ON l.doc_id = m.doc_id
    JOIN documents d ON d.doc_id = m.doc_id % 1000000
    GROUP BY d.source
    """,
)
def agg_dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What near-dup dedup COSTS each source — the impact audit curators
    read before shipping a dedup config: per source, documents and
    characters before/after applying the canonical survivorship mapping
    (same clusters/canonicals as `dedup_apply_canonical`, so the two
    outputs reconcile row-for-row). A source whose frac_chars_kept
    collapses is either a mirror/scrape-twin domain (working as
    intended) or a false-positive hotspot (threshold too loose) — this
    report is how you tell before the training run does. Planted twins
    (doc_id + 1e6) inherit their original's source via doc_id % 1e6.
    All counts and char sums are integers; one floor-truncated fraction."""
    from sdg_data_catalog_spark.queries.dedup_similarity import (
        _canonical_mapping,
    )

    docs = table(spark, sf_dir, "documents")
    # reuse the shared survivorship mapping AND its checkpointed length
    # table — rebuilding the lengths here re-scanned the corpus twice more
    # (audited 7 document scans for this query before the r8 collapse)
    mapped, singles, lens = _canonical_mapping(spark, sf_dir)
    mapping = mapped.unionByName(singles).select(
        "doc_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("kept"),
    )
    src = docs.select(F.col("doc_id").alias("base_id"), "source")
    joined = (
        mapping.join(lens, "doc_id")
        .withColumn("base_id", F.col("doc_id") % 1_000_000)
        .join(F.broadcast(src), "base_id")
    )
    kept_chars = F.sum(F.when(F.col("kept"), F.col("n")).otherwise(0))
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum("n").cast("bigint").alias("chars_total"),
        kept_chars.cast("bigint").alias("chars_kept"),
        (F.floor(kept_chars / F.sum("n").cast("double") * 1e6) / 1e6)
        .alias("frac_chars_kept"),
    )


@register(
    "text_novelty_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    tri AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS gram
      FROM toks WHERE len(t) >= 3
    ),
    df AS (SELECT gram, COUNT(*) AS df FROM tri GROUP BY gram)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           ROUND(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_rate
    FROM tri t JOIN df ON df.gram = t.gram
    GROUP BY t.doc_id
    """,
)
def text_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 3-grams
    that appear in NO other document — the corpus-global originality
    signal memorization studies threshold on (a doc whose phrasing is
    entirely shared with the rest of the corpus adds no new sequences to
    a training run; `dedup_containment` sees pairwise subset relations,
    `text_boilerplate_df` sees per-source templates — this is the
    global per-doc readout). Plan: per-doc DISTINCT grams, one
    combinable gram document-frequency count, one hash join back, one
    per-doc aggregation — two shuffles on the gram key total; counts
    are integers, one exact division. At 100 TB the df table is the
    shared intermediate a curation pipeline computes ONCE for
    boilerplate + novelty + containment together."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    tri = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("t", i),
                        F.element_at("t", i + F.lit(1)),
                        F.element_at("t", i + F.lit(2)),
                    ),
                )
            ).alias("gram"),
        )
        .distinct()
    )
    df = tri.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    novel = F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
    return (
        tri.join(df, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            novel.cast("bigint").alias("n_novel"),
            F.round(novel / F.count(F.lit(1)).cast("double"), 6).alias(
                "novelty_rate"
            ),
        )
    )


@register(
    "agg_split_balance_chi2",
    oracle="""
    WITH folds AS (
      SELECT CAST(CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 5 AS INTEGER) AS fold,
             label
      FROM embeddings
    ),
    grid AS (
      SELECT fold, label, COUNT(*) AS o FROM folds GROUP BY fold, label
    ),
    nf AS (SELECT fold, SUM(o) AS n_f FROM grid GROUP BY fold),
    nl AS (SELECT label, SUM(o) AS n_l FROM grid GROUP BY label),
    tot AS (SELECT SUM(o) AS n FROM grid),
    dense AS (
      SELECT nf.fold, nl.label, COALESCE(g.o, 0) AS o,
             CAST(nf.n_f AS DOUBLE) * nl.n_l / tot.n AS e
      FROM nf CROSS JOIN nl CROSS JOIN tot
      LEFT JOIN grid g ON g.fold = nf.fold AND g.label = nl.label
    )
    SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n_total,
           CAST((5 - 1) * ((SELECT COUNT(*) FROM nl) - 1) AS BIGINT) AS dof,
           FLOOR(list_sum(list((o - e) * (o - e) / e ORDER BY fold, label))
                 * 1e6) / 1e6 AS chi2,
           FLOOR(MAX(abs(o - e)) * 1e6) / 1e6 AS max_abs_dev
    FROM dense
    """,
)
def agg_split_balance_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence check between fold assignment and class
    label — the audit that PROVES the hash-based splitter (split_kfold's
    md5 % 5 convention, applied here to the labeled embeddings) did not
    accidentally correlate folds with classes (a correlated split makes
    every cross-validation score a lie). The (fold × label) grid is
    densified (absent cells contribute their full expected count), the
    chi2 sum is an ORDERED fold over the bounded grid, and expected
    counts are exact integer-ratio doubles; max |o−e| rides along as the
    human-readable worst cell. Everything downstream of ONE combinable
    count over the corpus is metadata-sized."""
    emb = table(spark, sf_dir, "embeddings")
    fold = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 5
    ).cast("int")
    # 5 x |labels| rows; feeds margins, total, and the densify join — one
    # corpus count pass, not four (audited 4 embeddings scans before)
    grid = (
        emb.select(fold.alias("fold"), "label")
        .groupBy("fold", "label")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=True)
    )
    nf = grid.groupBy("fold").agg(F.sum("o").alias("n_f"))
    nl = grid.groupBy("label").agg(F.sum("o").alias("n_l"))
    tot = grid.agg(F.sum("o").alias("n"))
    dense = (
        nf.crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(tot))
        .join(grid, ["fold", "label"], "left")
        .select(
            "fold", "label",
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("n_f").cast("double") * F.col("n_l") / F.col("n")).alias("e"),
            "n",
        )
    )
    term = (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    chi2 = F.aggregate(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("fold"), F.col("label"), term.alias("t")))
            ),
            lambda s: s.getField("t"),
        ),
        F.lit(0.0), lambda a, x: a + x,
    )
    n_labels = F.size(F.collect_set("label"))
    return dense.groupBy().agg(
        F.any_value("n").cast("bigint").alias("n_total"),
        ((5 - 1) * (n_labels - 1)).cast("bigint").alias("dof"),
        (F.floor(chi2 * 1e6) / 1e6).alias("chi2"),
        (F.floor(F.max(F.abs(F.col("o") - F.col("e"))) * 1e6) / 1e6).alias(
            "max_abs_dev"
        ),
    )
