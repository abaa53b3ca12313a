"""Registered surface for the UDF/model-scoring operators (§2.10),
sampling/splits (§2.7), and gazetteer matching (§2.3 join_gazetteer).

Python-model operators (trie spans, torch-shaped scorers, LDA, seeded
sampling) are rows-only checks by design (SURVEY.md §5.2: keep those few
and thin); everything with deterministic math gets a full oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
    (fastmatch.py name-hit subset, offset-free so it oracles exactly).
    Strategy picked from the local list length (no probe job): broadcast
    contains-join at dim size, substring equi-join beyond the bound
    (operators/gazetteer.py::match_names_join)."""
    docs = table(spark, sf_dir, "documents")
    names = spark.createDataFrame([(n,) for n in GAZETTEER], "name string")
    strategy = (
        "broadcast" if len(GAZETTEER) <= G.GAZETTEER_BROADCAST_BOUND else "equijoin"
    )
    return G.match_names_join(docs, names, strategy=strategy)


@register("gazetteer_spans")  # char offsets: UDF-only (§2.3: no oracle for spans)
def gazetteer_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trie-based gazetteer span matches per document (reference analog
    utils/fastmatch.py) — offsets are engine-internal, rows-only."""
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


@register(
    "udf_vectorize",
    oracle="""
    WITH cnt AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    ),
    vocab AS (
        SELECT w, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS INTEGER) AS id
        FROM cnt ORDER BY c DESC, w ASC LIMIT 100
    ),
    tok AS (
        SELECT doc_id,
               unnest(ws[1:32]) AS w,
               generate_subscripts(ws[1:32], 1) AS i,
               LEAST(len(ws), 32) AS n_tok
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ),
    ids AS (
        SELECT t.doc_id,
               string_agg(CAST(COALESCE(v.id, 0) AS VARCHAR), ',' ORDER BY t.i) AS head,
               any_value(t.n_tok) AS n_tok
        FROM tok t LEFT JOIN vocab v USING (w)
        GROUP BY t.doc_id
    )
    SELECT doc_id, head || repeat(',0', 32 - n_tok) AS token_ids_csv FROM ids
    """,
)
def udf_vectorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text → padded token-id vector via an Arrow pandas_udf with a
    broadcast vocab (utils/utils.py:18-25 shape). The vocab is
    deterministic (top-100 tokens by count desc, token asc → ids 1..100,
    0 = OOV/pad), and split→lookup→truncate→pad is pure arithmetic, so the
    whole UDF path is reproducible in ANSI SQL — surfaced as a CSV string
    (identical bytes on both engines; array columns canonicalize less
    predictably). Promoted from rows-only in round 4 — this hash-checks
    the Python UDF machinery itself: broadcast deserialization, Arrow
    batch transfer, and pad/truncate edge cases all sit on the hashed
    path."""
    docs = table(spark, sf_dir, "documents")
    vocab = SC.build_vocab(docs, size=100)
    vec = SC.vectorize(docs, vocab)
    return vec.select(
        "doc_id",
        F.concat_ws(
            ",", F.transform("token_ids", lambda x: x.cast("string"))
        ).alias("token_ids_csv"),
    )


@register(
    "udf_ner_score",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT doc_id,
           ROUND(list_sum(list_transform(ws,
               t -> ln((('0x' || substr(md5(t), 1, 15))::BIGINT % 997 + 1)
                       / 998.0))), 4) AS path_score,
           CAST(len(list_filter(ws, t -> contains(t, 'data'))) AS INTEGER)
             AS n_entities,
           COALESCE(array_to_string(list_filter(ws, t -> contains(t, 'data')),
                                    '|'), '') AS entities_csv
    FROM t
    """,
)
def udf_ner_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch NER scoring via mapInPandas (ner_pipeline.py:338-375 eval():
    batch decode → scores/paths). The stand-in model's per-token
    probability is md5-derived integer arithmetic (the same table the
    rank_al_* oracles use), so the ENTIRE scorer output — Viterbi-shaped
    path score, entity count, and the entity tokens themselves — is
    hash-checked against ANSI SQL. Promoted from rows-only in round 4:
    with udf_vectorize and udf_bert_classify this puts every §2.10
    model-scoring dataflow except the engine-internal LDA pair on the
    hashed path. Entities surface as a '|'-joined string (array columns
    canonicalize less predictably); the Python left-fold of log-probs
    matches DuckDB's list_sum fold bit-for-bit (proven by rank_al_lc's
    green oracle on the same expression)."""
    docs = table(spark, sf_dir, "documents")
    out = SC.ner_score(docs)
    return out.select(
        "doc_id",
        F.round("path_score", 4).alias("path_score"),
        "n_entities",
        F.concat_ws("|", F.col("entity_tokens")).alias("entities_csv"),
    )


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
    """LDA topic table (k=8) over the document corpus — iterative
    Gibbs-style fit, engine-internal, rows-only by design."""
    docs = table(spark, sf_dir, "documents")
    topics = SC.lda_topics(docs, k=8, seed=100)
    # Flatten array<double> → ','-joined string (external canonicalizer
    # sorts columns with pandas; list cells crash it — ranking.py precedent).
    return topics.select(
        "doc_id",
        F.array_join(
            F.transform("topic_dist", lambda x: F.round(x, 6).cast("string")), ","
        ).alias("topic_dist"),
    )


@register(
    "split_stratified",
    oracle="""
    WITH ranked AS (
      SELECT lang,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS ns
      FROM documents
    )
    SELECT lang,
           CASE WHEN rn <= CAST(floor(0.85 * ns) AS BIGINT)
                THEN 'train' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ranked
    GROUP BY 1, 2
    """,
)
def split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/test split, promoted to a full oracle in round 6:
    re-implemented on the md5-ranked per-stratum window
    (operators/sampling.py::stratified_split_hash — the deterministic
    mechanism sample_stratified_exact already proved driver-green) with a
    FRACTION per stratum instead of an exact n. Exactly
    floor(0.85·n_s) docs per language land in train, the rest in test —
    reproducible across engines, runs, and partitionings, which is the
    property a training pipeline needs from a split (the RNG
    `stratified_split` remains for API parity and is property-tested)."""
    docs = table(spark, sf_dir, "documents")
    train, test = SM.stratified_split_hash(docs, "lang", 0.85, key_col="doc_id")
    return (
        train.select("lang", F.lit("train").alias("split"))
        .unionByName(test.select("lang", F.lit("test").alias("split")))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register("sample_frac")  # Spark-RNG sample: rows-only
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli 10% sample of orders — RNG-backed, rows-only by design
    (the deterministic twin is sample_hash)."""
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


@register(
    "udtf_token_positions",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    idx AS (
        SELECT doc_id, t, CAST(unnest(range(0, len(t))) AS INTEGER) AS pos
        FROM toks
    )
    SELECT doc_id, pos, t[pos + 1] AS token,
           CAST(CASE WHEN pos = 0 THEN 0
                ELSE len(array_to_string(t[1:pos], ' ')) + 1 END AS INTEGER)
               AS char_start
    FROM idx
    """,
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Spark 4 Python UDTF (lateral table function): tokenize with
    character offsets — the span-alignment primitive the reference's NER
    pipeline needs to map (start, end) annotations onto tokens
    (ner_pipeline.py's offset bookkeeping). Each input row fans out to one
    row per token with its position and char_start; downstream a range
    join against entity spans labels tokens. The UDTF is Arrow-optimized
    (spark.sql.execution.pythonUDTF.arrow.enabled — set both in
    session.py and here, so even a plain driver session plans
    ArrowEvalPythonUDTF instead of per-row pickling); the bulk
    tokenization hot path still stays with the codegen'd
    split/posexplode twin (same result, asserted by the shared oracle)."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="pos INT, token STRING, char_start INT")
    class TokenPositions:
        def eval(self, text: str):
            if text is None:
                return
            off = 0
            for i, w in enumerate(text.split(" ")):
                yield i, w, off
                off += len(w) + 1

    spark.udtf.register("token_positions", TokenPositions)
    docs = table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT doc_id, pos, token, char_start "
        "FROM udtf_docs_in, LATERAL token_positions(text)"
    )


@register(
    "sample_hash",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling: keep rows whose md5(key) falls in a
    fixed hex prefix range (here 1/16). Unlike rand()-based `sample_frac`,
    the selection is a pure function of the key — reproducible across
    engines, runs, partitionings, and cluster sizes (the property an
    auditable 100 TB pipeline needs: re-running the sample job yields the
    same rows, and adding data never flips old rows in/out). Embarrassingly
    parallel: a codegen'd filter, no shuffle, no state. Reference analog:
    `df.sample(random_state=...)` pins a seed but not row identity."""
    docs = table(spark, sf_dir, "documents")
    return docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    ).select("doc_id", "source", "n_chars")


@register(
    "split_hash",
    oracle="""
    SELECT CASE
             WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
             WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'valid'
             ELSE 'test'
           END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split by hash bucket (12/2/2 of 16):
    lowercase hex compares lexicographically == numerically, so the CASE is
    a range on md5's first nibble. Every engine that can md5 assigns each
    doc to the SAME split forever — no split-assignment table to maintain,
    no leakage when the corpus grows (a new doc can't displace an old one's
    assignment, unlike modulo-on-row-number splits). Stateless map-side
    expression; the only shuffle is the 3-group count."""
    docs = table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib < "c", "train").when(nib < "e", "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# Domain-mixture target keep-rates, expressed as 4-hex-digit md5-prefix
# thresholds (rate = threshold/65536): upweight curated sources, downsample
# the bulk crawl. Lowercase-hex string compare == numeric compare.
_MIXTURE_HEX = {"src0": "ffff", "src1": "ffff", "src2": "8000", "src3": "8000"}
_MIXTURE_DEFAULT_HEX = "4000"  # 0.25 for every other source


@register(
    "sample_mixture",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents
    WHERE substring(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 4)
          < CASE source
              WHEN 'src0' THEN 'ffff' WHEN 'src1' THEN 'ffff'
              WHEN 'src2' THEN '8000' WHEN 'src3' THEN '8000'
              ELSE '{_MIXTURE_DEFAULT_HEX}' END
    GROUP BY source
    """,
)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: per-domain deterministic downsampling
    to target weights (the data-mixing step of every LLM pretraining
    pipeline — e.g. keep 100% of curated sources, 50% of mid-quality, 25%
    of bulk crawl). The keep decision is md5(source|doc_id) against a
    per-source hex threshold — exact, reproducible, engine-independent,
    and pure map-side (no shuffle until the audit aggregation). Changing
    the mixture weights only flips rows at the threshold margin, so
    successive mixture versions share maximal data (stable caching at
    100 TB). The salt includes source so a doc appearing under two sources
    draws independent coins."""
    docs = table(spark, sf_dir, "documents")
    thr = F.lit(_MIXTURE_DEFAULT_HEX)
    for src, hexthr in _MIXTURE_HEX.items():
        thr = F.when(F.col("source") == src, hexthr).otherwise(thr)
    keep = (
        F.substring(
            F.md5(F.concat_ws("|", F.col("source"), F.col("doc_id").cast("string"))),
            1,
            4,
        )
        < thr
    )
    return (
        docs.filter(keep)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
    )


def _kmeans_oracle_round(i: int) -> str:
    """One unrolled Lloyd round in DuckDB SQL: assignment under the prior
    centroids (first-min tie-break, matching numpy argmin), per-dimension
    mean update pinned to a 1e-9 lattice (ROUND(AVG, 9) — mirrors
    kmeans_fit so downstream FLOOR images consume bit-identical
    centroids on both engines), empty-cluster patch."""
    prev = f"c{i-1}f" if i > 1 else "c0"
    return f"""
a{i} AS (SELECT e.vec_id, e.embedding, c.cid,
         list_distance(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       c.cent)^2 AS d
  FROM embeddings e CROSS JOIN {prev} c),
asg{i} AS (SELECT vec_id, embedding, cid AS cluster_id
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid)
               AS rn FROM a{i}) WHERE rn = 1),
c{i} AS (SELECT cluster_id AS cid, list(m ORDER BY pos) AS cent
  FROM (SELECT cluster_id, pos, ROUND(AVG(CAST(val AS DOUBLE)), 9) AS m
        FROM (SELECT cluster_id, unnest(embedding) AS val,
                     generate_subscripts(embedding, 1) AS pos FROM asg{i})
        GROUP BY cluster_id, pos) GROUP BY cluster_id),
c{i}f AS (SELECT p.cid, COALESCE(n.cent, p.cent) AS cent
  FROM {prev} p LEFT JOIN c{i} n ON p.cid = n.cid)"""


_KMEANS_ORACLE = (
    """WITH c0 AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)
),"""
    + ",".join(_kmeans_oracle_round(i) for i in (1, 2, 3))
    + """,
final AS (SELECT e.vec_id, c.cid,
         list_distance(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       c.cent)^2 AS d
  FROM embeddings e CROSS JOIN c3f c)
SELECT vec_id, CAST(cluster_id AS INTEGER) AS cluster_id,
       ROUND(d, 6) AS sq_dist
FROM (SELECT *, cid AS cluster_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      FROM final)
WHERE rn = 1 ORDER BY vec_id"""
)


@register("cluster_kmeans", oracle=_KMEANS_ORACLE)
def cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means assignment over the embeddings table
    (operators/iterative.py::kmeans_assign): deterministic init (k lowest
    vec_ids), 3 rounds, k=4 — the semantic-dedup / corpus-mapping
    clustering step. Per-iteration driver state is exactly k·dim doubles;
    assignment is a codegen'd expression tree (no Python, no shuffle) and
    the update one partial-aggregated groupBy. Differential-tested against
    a dense-numpy twin (tests/test_iterative.py) AND — promoted from
    rows-only this round — hash-checked against a fully UNROLLED DuckDB
    oracle: three Lloyd rounds expressed as chained CTEs over DuckDB's
    list functions (list_distance for the argmin, unnest+subscripts for
    the per-dimension means, first-min window tie-break). The iterative
    algorithm is value-identical across engines, not just 'runs with a
    stable schema'."""
    from sdg_data_catalog_spark.operators.iterative import kmeans_assign

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return kmeans_assign(emb, k=4, iters=3).orderBy("vec_id")


def _pagerank_oracle_round(i: int, damping: float = 0.85) -> str:
    p = f"r{i-1}"
    return f"""
contrib{i} AS (SELECT e.dst AS node, SUM(r.rank / o.odeg) AS inflow
  FROM e JOIN {p} r ON e.src = r.node JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst),
dang{i} AS (SELECT COALESCE(SUM(r.rank), 0) AS d
  FROM {p} r LEFT JOIN outdeg o ON r.node = o.src WHERE o.src IS NULL),
r{i} AS (SELECT nodes.node,
  (1 - {damping}) / (SELECT n FROM nn)
  + {damping} * (SELECT d FROM dang{i}) / (SELECT n FROM nn)
  + {damping} * COALESCE(c.inflow, 0) AS rank
  FROM nodes LEFT JOIN contrib{i} c ON nodes.node = c.node)"""


_PAGERANK_ORACLE = (
    """WITH e AS (SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
outdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS odeg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),"""
    + ",".join(_pagerank_oracle_round(i) for i in (1, 2, 3, 4))
    + """
SELECT node, rank FROM (SELECT node, ROUND(rank, 10) AS rank FROM r4)
ORDER BY rank DESC, node LIMIT 50"""
)


@register("graph_pagerank", oracle=_PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier→customer shipment graph (distinct
    (l_suppkey, o_custkey) pairs from lineitem⋈orders) — the
    entity-importance primitive the reference's 0-line knowledge_graph/
    stage gestures at. Power iteration with uniform dangling
    redistribution (operators/iterative.py::pagerank): one shuffle per
    round on dst plus a broadcast of the rank vector; ranks
    localCheckpointed per round. Rounded to 10 decimals for a stable
    cross-engine surface; differential-tested against a dense-numpy twin
    AND — promoted from rows-only this round — hash-checked against a
    fully UNROLLED DuckDB oracle (four power-iteration rounds as chained
    CTEs, dangling mass and all; the ORDER BY runs on the ROUNDED rank so
    tie classes resolve identically in both engines before the LIMIT)."""
    from sdg_data_catalog_spark.operators.iterative import pagerank

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + F.lit(1_000_000)).alias("dst"),  # disjoint id spaces
        )
        .distinct()
    )
    return (
        pagerank(edges, damping=0.85, iters=4)
        .select("node", F.round("rank", 10).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(50)
    )


@register(
    "sample_stratified_exact",
    oracle="""
    SELECT lang, doc_id
    FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= 10
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-count stratified sampling: precisely 10 documents per
    language, chosen by ranking each stratum on md5(doc_id) — a
    deterministic uniform permutation, so the pick is reproducible
    across engines, runs, and cluster layouts. This is the exact-n
    companion to split_stratified's sampleBy (fraction semantics,
    Spark-RNG, rows-only): eval sets and few-shot pools need "exactly n
    per class", and rand()-ranked sampling can't be oracle-checked or
    replayed. One hash-partitioned window per stratum; at 100 TB with a
    hot stratum, pre-filter by an md5-prefix range (sample_hash) to cut
    the windowed volume before ranking."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("lang", "doc_id")
    )
