"""Dedup + similarity query surface (BASELINE.json north star: the
LLM-training-data-pipeline operators, first-class alongside SURVEY.md §2).

Near-dup operators run on a synthetic near-dup corpus: documents UNION a
copy with the first token dropped (ids +1,000,000) — this gives the
operators real positives to find while staying fully oracle-reproducible.

Oracle SQL strings for the sketch operators are generated from the same
pinned constants as the Spark side (functions/hashing.py) so the two can't
drift independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    MINHASH_P,
    minhash_value_sql,
)
from sdg_data_catalog_spark.operators import dedup as D
from sdg_data_catalog_spark.operators import similarity as S
from sdg_data_catalog_spark.queries.registry import register

# --- shared corpus construction (Spark + SQL twins) -----------------------

_CORPUS_SQL = """
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               substr(text, strpos(text, ' ') + 1) AS text
        FROM documents
    )
"""

_EXACT_CORPUS_SQL = """
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
"""

_SHINGLE_SQL = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
        FROM toks WHERE len(t) >= 3
    )
"""

_XP_SQL = f"sh_int AS (SELECT doc_id, (('0x' || substr(md5(sh), 1, 15))::BIGINT % {MINHASH_P}) AS xp FROM sh)"

_SIG_SQL = (
    "sig AS (SELECT doc_id, "
    + ", ".join(f"MIN({minhash_value_sql('xp', i)}) AS h{i}" for i in range(MINHASH_K))
    + " FROM sh_int GROUP BY doc_id)"
)

_BANDS_SQL = (
    "bands AS ("
    + " UNION ALL ".join(
        "SELECT doc_id, '"
        + str(b)
        + "|' || "
        + " || '|' || ".join(f"CAST(h{b * LSH_ROWS + j} AS VARCHAR)" for j in range(LSH_ROWS))
        + " AS band_key FROM sig"
        for b in range(LSH_BANDS)
    )
    + ")"
)


def _near_dup_corpus(docs: DataFrame) -> DataFrame:
    orig = docs.select("doc_id", "text")
    mod = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
    )
    return orig.unionByName(mod)


def _exact_dup_corpus(docs: DataFrame) -> DataFrame:
    orig = docs.select("doc_id", "text")
    dup = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return orig.unionByName(dup)


@register(
    "pipeline_curation",
    oracle="""
    WITH q AS (
        SELECT doc_id, lang, text,
               len(string_split(text, ' ')) AS ws_tokens,
               len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) AS uniq_ratio
        FROM documents
    ),
    kept AS (SELECT * FROM q WHERE ws_tokens >= 20 AND uniq_ratio >= 0.2),
    fp AS (
        SELECT *, md5(array_to_string(
                   list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
        FROM kept
    ),
    survivors AS (
        SELECT * FROM fp
        QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    ),
    budget AS (
        SELECT doc_id, lang, ws_tokens,
               SUM(ws_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM survivors
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
           CAST(ws_tokens AS BIGINT) AS ws_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM budget WHERE cum_tokens <= 200000
    """,
)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composed pipeline: quality gate → fingerprint dedup →
    token-budget prefix cut (operators/curation.py). The budget stage uses
    the two-phase scalable running sum (range shuffle + broadcast offsets),
    NOT a single-partition global window — differential-tested against the
    naive window in tests/test_dedup_similarity.py."""
    from sdg_data_catalog_spark.operators import curation as C

    docs = table(spark, sf_dir, "documents")
    return C.curate(docs.select("doc_id", "lang", "text"))


# --- dedup ladder ---------------------------------------------------------

@register(
    "dedup_exact",
    oracle=f"""
    WITH {_EXACT_CORPUS_SQL}
    SELECT sha256(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM corpus GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: sha256(text) hash-groupBy keeping MIN doc_id —
    the first rung of the dedup ladder (operators/dedup.py)."""
    docs = table(spark, sf_dir, "documents")
    return D.exact_dedup_groups(_exact_dup_corpus(docs))


@register(
    "dedup_jaccard_pairs",
    oracle=f"""
    WITH {_CORPUS_SQL},
    {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.6
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact intersection (operators/dedup.py::jaccard_pairs_blocked);
    identical results to the inverted-index formulation the oracle uses —
    equality asserted in tests/test_dedup_similarity.py."""
    docs = table(spark, sf_dir, "documents")
    return D.jaccard_pairs_blocked(_near_dup_corpus(docs), threshold=0.6)


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_SQL},
    {_SHINGLE_SQL},
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
    )
    SELECT CAST(s AS BIGINT) AS doc_id,
           CAST(LEAST(s, MIN(d)) AS BIGINT) AS component,
           LEAST(s, MIN(d)) = s AS is_survivor
    FROM reach GROUP BY s
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUP decision: connected components over the 0.6-Jaccard
    pair graph (operators/dedup.py::connected_components — iterative
    min-label propagation), plus survivor flag (component representative =
    min doc_id). The oracle computes the same closure with a recursive CTE
    — exponential-ish in DuckDB vs O(diameter) rounds in Spark, which is
    the point of doing it with joins."""
    docs = table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs_blocked(_near_dup_corpus(docs), threshold=0.6)
    labels = D.connected_components(pairs)
    return labels.select(
        "doc_id",
        "component",
        (F.col("component") == F.col("doc_id")).alias("is_survivor"),
    )


@register(
    "dedup_minhash_sig",
    oracle=f"""
    WITH corpus AS (SELECT doc_id, text FROM documents),
    {_SHINGLE_SQL},
    {_XP_SQL},
    {_SIG_SQL}
    SELECT * FROM sig
    """,
)
def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document MinHash signatures over 5-char shingles — the
    signature-build stage of the LSH near-dup pipeline."""
    docs = table(spark, sf_dir, "documents")
    return D.minhash_signatures(docs.select("doc_id", "text"))


@register(
    "dedup_minhash_pairs",
    oracle=f"""
    WITH {_CORPUS_SQL},
    {_SHINGLE_SQL},
    {_XP_SQL},
    {_SIG_SQL},
    {_BANDS_SQL}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs: band-bucket equi-join (never
    all-pairs), verified by exact shingle Jaccard."""
    docs = table(spark, sf_dir, "documents")
    return D.minhash_band_pairs(_near_dup_corpus(docs))


@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH {_CORPUS_SQL},
    tf AS (
        SELECT doc_id, w, COUNT(*) AS tf,
               ('0x' || substr(md5(w), 1, 15))::BIGINT AS x
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM corpus)
        GROUP BY doc_id, w
    ),
    sums AS (
        SELECT doc_id,
               {", ".join(f"SUM(CASE WHEN ((x >> {b}) & 1) = 1 THEN tf ELSE -tf END) AS s{b}" for b in range(16))}
        FROM tf GROUP BY doc_id
    ),
    sh2 AS (
        SELECT doc_id,
               ({" + ".join(f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(16))})::BIGINT AS simhash
        FROM sums
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form is the pigeonhole chunk-blocked candidate join
    (operators/dedup.py::simhash_pairs_blocked) — equi-join on
    (chunk_index, chunk_value), per-bucket cost, no all-pairs term; the
    quadratic self-join twin exists only as its differential test."""
    docs = table(spark, sf_dir, "documents")
    return D.simhash_pairs_blocked(_near_dup_corpus(docs), max_hamming=2)


# --- similarity search ----------------------------------------------------

_COS_SQL = (
    "list_sum(list_transform(range(1, 65), i -> CAST(q_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q_emb[i] AS DOUBLE) * CAST(q_emb[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(c_emb[i] AS DOUBLE) * CAST(c_emb[i] AS DOUBLE)))))"
)


@register(
    "sim_knn_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS c_emb FROM embeddings),
    scored AS (
        SELECT q_id, neighbor_id, {_COS_SQL} AS cos_sim
        FROM q CROSS JOIN c WHERE q_id != neighbor_id
    )
    SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank, ROUND(cos_sim, 6) AS cos_sim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for 10 query vectors against the corpus —
    the exact baseline the ANN variants are recalled against."""
    emb = table(spark, sf_dir, "embeddings")
    return S.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 10), k=5)


def _plane_dot_sql(j: int) -> str:
    c = 17 * (j + 1)
    return (
        f"list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE)"
        f" * ((((i + {c}) * 2654435761) % 1000003 % 97 - 48) / 48.0)))"
    )


@register(
    "sim_ann_lsh_bucket",
    oracle=f"""
    SELECT vec_id,
           ({" + ".join(f"CASE WHEN {_plane_dot_sql(j)} > 0 THEN {1 << j} ELSE 0 END" for j in range(S.N_PLANES))})::BIGINT AS bucket
    FROM embeddings
    """,
)
def sim_ann_lsh_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector — map-side signed
    projections, the bucketing stage of ANN search."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", S.lsh_bucket(F.col("embedding")).alias("bucket"))


@register(
    "sim_ann_lsh_topk",
    oracle=f"""
    WITH wb AS (
        SELECT vec_id, embedding,
               ({" + ".join(f"CASE WHEN {_plane_dot_sql(j)} > 0 THEN {1 << j} ELSE 0 END" for j in range(S.N_PLANES))})::BIGINT AS bucket
        FROM embeddings
    ),
    scored AS (
        SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
               a.embedding AS q_emb, b.embedding AS c_emb
        FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    r AS (
        SELECT q_id, neighbor_id, {_COS_SQL} AS cos_sim,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY {_COS_SQL} DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT q_id, neighbor_id, CAST(rank AS INT) AS rank, ROUND(cos_sim, 6) AS cos_sim
    FROM r WHERE rank <= 1
    """,
)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-1 neighbor — now hash-checked, not
    rows-only: the plane weights are deterministic integer arithmetic
    (operators/similarity.py::_plane_component), the bucket id is a sum of
    sign bits, and the per-pair cosine is a sequential left-to-right fold
    in both engines (Spark F.aggregate ≡ DuckDB list_sum), so bucketing +
    ranking reproduce bit-identically in ANSI SQL. The approximation is in
    WHICH candidates are scored (same-bucket only) — identical on both
    sides by construction — never in the scoring."""
    emb = table(spark, sf_dir, "embeddings")
    return S.ann_lsh_topk(emb, k=1)


@register(
    "sim_cosine_neardup",
    oracle=f"""
    WITH a AS (SELECT vec_id AS id_a, embedding AS q_emb FROM embeddings),
    b AS (SELECT vec_id AS id_b, embedding AS c_emb FROM embeddings)
    SELECT id_a, id_b, ROUND({_COS_SQL}, 6) AS cos_sim
    FROM a JOIN b ON id_a < id_b
    WHERE {_COS_SQL} >= 0.4
    """,
)
def sim_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold via
    LSH-bucketed candidate join + exact re-scoring."""
    emb = table(spark, sf_dir, "embeddings")
    return S.cosine_neardup_pairs(emb, threshold=0.4)


@register(
    "sim_norm_stats",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(sqrt(list_sum(list_transform(range(1, 65),
                 i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))), 6) AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def sim_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding L2-norm statistics (count/mean/min/max) — the
    sanity profile run before any similarity work."""
    emb = table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(S.norm(F.col("embedding"))), 6).alias("avg_norm"),
    )


_IVF_ORACLE = """
WITH cents AS (
  SELECT vec_id AS cell_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)
),
e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings),
assigned AS (
  SELECT vec_id, emb, cell_id FROM (
    SELECT e.vec_id, e.emb, c.cell_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_distance(e.emb, c.centroid) ASC, c.cell_id ASC) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1
),
q AS (SELECT vec_id AS q_id, emb AS q_emb, cell_id FROM assigned WHERE vec_id < 10),
scored AS (
  SELECT q.q_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(q.q_emb, a.emb) AS cos_sim
  FROM q JOIN assigned a USING (cell_id)
  WHERE q.q_id <> a.vec_id
)
SELECT q_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       ROUND(cos_sim, 6) AS cos_sim
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        ORDER BY cos_sim DESC, neighbor_id ASC) AS rank FROM scored)
WHERE rank <= 5
"""


@register("sim_ann_ivf_topk", oracle=_IVF_ORACLE)
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (the north star's 'IVF or LSH-bucketed variant' —
    both are registered). Coarse-quantize into cells, search within the
    query's cell; recall vs sim_knn_bruteforce asserted in pytest.
    Promoted from rows-only this round: the deterministic coarse codebook
    (first 16 vectors), argmin cell assignment, bucket equi-join, and
    cosine window ranking all reproduce in DuckDB SQL (list_distance /
    list_cosine_similarity; the sqrt-vs-squared L2 difference is
    monotone, so argmin cells agree bit-for-bit)."""
    emb = table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, k=5)


# --- LLM-pipeline layout & hygiene ----------------------------------------

@register(
    "pack_sequences",
    oracle="""
    WITH base AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
        FROM documents
    ),
    c AS (SELECT doc_id, tk,
                 CAST(SUM(tk) OVER (ORDER BY doc_id) AS BIGINT) AS cum
          FROM base),
    packs AS (
        SELECT doc_id, tk, cum,
               unnest(range((cum - tk) // 512, ((cum - 1) // 512) + 1)) AS pack_id
        FROM c
    )
    SELECT doc_id, CAST(pack_id AS BIGINT) AS pack_id,
           CAST(GREATEST(cum - tk, pack_id * 512) - pack_id * 512 AS BIGINT)
               AS pack_offset,
           CAST(LEAST(cum, (pack_id + 1) * 512)
                - GREATEST(cum - tk, pack_id * 512) AS BIGINT) AS n_tokens
    FROM packs
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing at a 512-token context length
    (operators/packing.py): every document maps to its pack slice(s); a
    boundary straddler emits one row per touched pack. The only global
    coordination is the two-phase prefix sum — the oracle's single
    `SUM() OVER (ORDER BY doc_id)` is exactly the single-partition
    formulation the Spark side exists to avoid."""
    from sdg_data_catalog_spark.operators.packing import pack_sequences as _pack

    return _pack(table(spark, sf_dir, "documents"), budget=512)


@register(
    "dedup_decontaminate",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text, source FROM documents WHERE doc_id % 97 <> 0
    ),
    eval_docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
    {_SHINGLE_SQL},
    ev AS (
        SELECT DISTINCT unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS esh
        FROM (SELECT string_split(text, ' ') AS t FROM eval_docs)
        WHERE len(t) >= 3
    ),
    contaminated AS (
        SELECT DISTINCT sh.doc_id FROM sh JOIN ev ON sh.sh = ev.esh
    )
    SELECT c.doc_id, c.source FROM corpus c
    WHERE c.doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py::decontaminate):
    every 97th document plays the held-out eval set; corpus documents
    sharing any 3-gram with it are dropped. Eval shingles broadcast;
    the corpus pass is map-side + one doc_id anti join — the corpus text
    itself never shuffles."""
    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0).select("doc_id", "text", "source")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    return D.decontaminate(corpus, eval_docs).select("doc_id", "source")


# --- embedding compression (generated oracles: one pinned constant) -------

def _rp_oracle() -> str:
    rows = S.rp_matrix()
    pj = " + ".join(
        f"list_dot_product(e, CAST({r} AS DOUBLE[]))"
        f" * list_dot_product(e, CAST({r} AS DOUBLE[]))"
        for r in rows
    )
    return f"""
    WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    p AS (
        SELECT label,
               sqrt(list_dot_product(e, e)) AS orig_norm,
               sqrt({pj}) / sqrt({S.RP_DIM}) AS proj_norm
        FROM v
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(proj_norm / orig_norm), 4) AS avg_norm_ratio,
           ROUND(MIN(proj_norm / orig_norm), 4) AS min_norm_ratio,
           ROUND(MAX(proj_norm / orig_norm), 4) AS max_norm_ratio
    FROM p GROUP BY label
    """


@register("emb_random_projection", oracle=_rp_oracle())
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss compression of the embedding column (64→16
    dims, ±1 matrix) — the storage/compute lever before ANN at 100 TB:
    candidate generation runs on 4×-smaller vectors, exact rerank on the
    originals. Pure JVM expression tree (operators/similarity.py::
    project_rp), map-side until the audit agg. Surfaced as per-label
    norm-preservation stats (the JL guarantee: ratio concentrates near 1 —
    also property-tested in tests/test_dedup_similarity.py)."""
    emb = table(spark, sf_dir, "embeddings")
    p = S.project_rp(emb)
    ratio = F.col("proj_norm") / F.col("orig_norm")
    return p.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(ratio), 4).alias("avg_norm_ratio"),
        F.round(F.min(ratio), 4).alias("min_norm_ratio"),
        F.round(F.max(ratio), 4).alias("max_norm_ratio"),
    )


@register(
    "emb_quantize_int8",
    oracle="""
    WITH v AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    s AS (
        SELECT label, e,
               greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) / 127
                   AS scale
        FROM v
    ),
    q AS (
        SELECT label,
               list_transform(e, x -> x - floor(x / scale + 0.5) * scale)
                   AS err
        FROM s
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(1e6 * AVG(list_dot_product(err, err) / 64), 3) AS mse_e6,
           ROUND(1e3 * AVG(list_max(list_transform(err, x -> abs(x)))), 3)
               AS max_abs_err_e3
    FROM q GROUP BY label
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization of the embedding column —
    4× storage cut (float32→int8) with bounded reconstruction error
    (≤ scale/2 per coordinate), the standard pre-ANN compression at scale.
    Spark side is operators/similarity.py::quantize_int8 (pure
    higher-order-function expressions, no Python); output is per-label
    error statistics in scalar columns."""
    emb = table(spark, sf_dir, "embeddings")
    qz = S.quantize_int8(emb)
    return qz.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("mse") * 1e6, 3).alias("mse_e6"),
        F.round(F.avg("max_abs_err") * 1e3, 3).alias("max_abs_err_e3"),
    )


# --- line-level (CCNet-style) dedup ---------------------------------------

@register(
    "dedup_lines",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    lines AS (
        SELECT doc_id, i AS line_no,
               array_to_string(t[i * 8 + 1 : i * 8 + 8], ' ') AS line
        FROM toks,
             UNNEST(range(0, CAST(ceil(len(t) / 8.0) AS BIGINT))) AS u(i)
    ),
    cnt AS (SELECT md5(line) AS h, COUNT(*) AS c FROM lines GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN c <= 2 THEN len(line) ELSE 0 END) AS BIGINT)
               AS kept_chars
    FROM lines JOIN cnt ON md5(line) = h
    GROUP BY doc_id
    """,
)
def dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level corpus dedup (the CCNet / web-crawl preprocessing step:
    boilerplate lines — nav bars, cookie banners — repeat across millions of
    pages; drop any line occurring more than K times corpus-wide while
    keeping the documents). The synthetic corpus has no newlines, so 'lines'
    are fixed 8-token chunks — same chunking expression on both engine
    sides. Dataflow is the scale-correct one: explode to (doc, line_no,
    line), aggregate counts on the 32-byte line HASH (map-side combine; the
    shuffle carries hash+count, never text), then one hash-equi-join back
    and a per-doc re-aggregation. Line text itself shuffles only in the
    doc_id re-agg, and a production variant would carry (doc_id, line_no)
    plus length instead — noted here, kept simple because the oracle needs
    the join anyway. Emits per-doc audit stats (lines kept / chars kept);
    the reconstructed text is array_join of the kept chunks."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    chunk = F.expr(
        "transform(sequence(0, cast(ceil(size(split(text, ' ')) / 8.0) as int) - 1),"
        " i -> array_join(slice(split(text, ' '), i * 8 + 1, 8), ' '))"
    )
    lines = docs.select(
        "doc_id", F.posexplode(chunk).alias("line_no", "line")
    ).withColumn("h", F.md5("line"))
    cnt = lines.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return (
        lines.join(cnt, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("c") <= 2, 1).otherwise(0)).alias("n_kept"),
            F.sum(
                F.when(F.col("c") <= 2, F.length("line")).otherwise(F.lit(0))
            ).alias("kept_chars"),
        )
    )


# --- incremental (continuous-ingest) dedup --------------------------------

@register(
    "dedup_incremental",
    oracle="""
    WITH sig AS (
        SELECT doc_id, source,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS h
        FROM documents
    ),
    existing AS (SELECT * FROM sig WHERE doc_id % 10 != 0),
    incoming AS (SELECT * FROM sig WHERE doc_id % 10 = 0)
    SELECT i.doc_id, i.source,
           CAST(i.doc_id IN (SELECT doc_id FROM incoming a
                             WHERE EXISTS (SELECT 1 FROM existing e
                                           WHERE e.h = a.h)) AS BOOLEAN)
               AS is_dup
    FROM incoming i
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest dedup: flag each INCOMING doc whose content
    fingerprint already exists in the standing corpus — the shape every
    production pipeline actually runs (full-corpus dedup happens once;
    every day after is new-batch-vs-index). Fingerprint = md5 of the
    sorted distinct token set (bag-of-words identity: order- and
    multiplicity-insensitive, so reshuffled near-dups collide; 6 incoming
    docs collide at sf0.01, non-vacuous). The probe is a LEFT SEMI join on
    the 32-byte hash — the incoming batch (small) shuffles against only
    the matching hash partitions of the index; at 100 TB the index side
    is a bucketed-by-hash table so the probe touches no full scan, and
    incoming text never shuffles at all (hash computed map-side)."""
    docs = table(spark, sf_dir, "documents")
    # fingerprint table is referenced three times (existing, incoming
    # probe, incoming output) — one corpus pass, not three (audited 3x)
    sig = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
        ).alias("h"),
    ).localCheckpoint(eager=True)
    existing = sig.filter(F.col("doc_id") % 10 != 0)
    incoming = sig.filter(F.col("doc_id") % 10 == 0)
    dup_ids = incoming.join(existing, "h", "left_semi").select("doc_id")
    return (
        incoming.join(
            dup_ids.withColumn("is_dup", F.lit(True)), "doc_id", "left"
        )
        .select(
            "doc_id", "source", F.coalesce("is_dup", F.lit(False)).alias("is_dup")
        )
    )


@register(
    "dedup_threshold_sweep",
    oracle=f"""
    WITH {_CORPUS_SQL},
    {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    j AS (
        SELECT CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) AS jac
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
    )
    SELECT t.thr AS threshold,
           CAST((SELECT COUNT(*) FROM j WHERE jac >= t.thr) AS BIGINT) AS n_pairs
    FROM (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS thr) t
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield curve: candidate-pair counts at every Jaccard threshold
    in one pass — the tuning readout a curator reads BEFORE committing a
    threshold (0.6 vs 0.8 can change corpus size by percent points; the
    reference picks thresholds blind). The expensive part — the inverted
    shingle index and the pair intersection — is computed ONCE; the sweep
    is a 5-row threshold dimension crossed against the scored pairs with
    a conditional count, not five re-runs. Same candidate generation as
    dedup_jaccard_pairs, so the curve is exactly consistent with what the
    production threshold will deliver."""
    docs = table(spark, sf_dir, "documents")
    # the shingle table feeds sizes + both sides of the inverted-index
    # self-join; without a lineage cut the corpus scan re-expands 8x
    # (audited at sf0.001) — one materialization pass instead
    sh = D.shingles(_near_dup_corpus(docs)).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            (F.col("common") * 1.0 / (F.col("na") + F.col("nb") - F.col("common"))).alias("jac")
        )
    )
    thr = spark.createDataFrame([(t,) for t in (0.5, 0.6, 0.7, 0.8, 0.9)], "threshold double")
    return (
        jac.crossJoin(F.broadcast(thr))
        .groupBy("threshold")
        .agg(
            F.coalesce(
                F.sum((F.col("jac") >= F.col("threshold")).cast("bigint")), F.lit(0)
            ).alias("n_pairs")
        )
    )


@register(
    "dedup_apply_canonical",
    oracle=f"""
    WITH RECURSIVE {_CORPUS_SQL},
    {_SHINGLE_SQL},
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
    mapped AS (SELECT c.doc_id, canon.canonical_id
               FROM comp c JOIN canon ON canon.component = c.component),
    singles AS (SELECT doc_id, doc_id AS canonical_id FROM corpus
                WHERE doc_id NOT IN (SELECT doc_id FROM comp))
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(canonical_id AS BIGINT) AS canonical_id,
           doc_id = canonical_id AS kept
    FROM (SELECT * FROM mapped UNION ALL SELECT * FROM singles)
    """,
)
def dedup_apply_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of the near-dup ladder — the operator that turns a
    cluster decision into a corpus rewrite: every document maps to its
    cluster's canonical representative (longest text wins, doc_id
    tie-break — the quality-based survivorship rule curators actually
    use, vs dedup_components' min-id convention), documents outside any
    cluster map to themselves, and `kept` marks the survivors. The
    output IS the dedup: filter kept for the corpus, or join
    canonical_id to re-point references (the survivorship mapping a
    warehouse keeps for lineage). Plan shape: the pair graph and
    components come from the same blocked-Jaccard + min-label
    propagation as dedup_components; canonical selection is ONE window
    over the (cluster, member) frame — cluster-sized, not corpus-sized;
    singleton mapping is a left-anti join. All keys and lengths are
    integers — no float hashing risk."""
    mapped, singles, _ = _canonical_mapping(spark, sf_dir)
    return mapped.unionByName(singles).select(
        "doc_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("kept"),
    )


def _canonical_mapping(spark: SparkSession, sf_dir: str):
    """Shared survivorship mapping for dedup_apply_canonical and
    agg_dedup_impact_report: (clustered mapping, singleton mapping,
    checkpointed corpus length table).

    The doc-length table is checkpointed once — it feeds the canonical
    window AND the singleton anti-join, and without the lineage cut each
    reference re-expanded the corpus scan (audited 4 document scans per
    query; now the corpus is passed once for lengths and once inside the
    blocked-pair generator)."""
    docs = table(spark, sf_dir, "documents")
    corpus = _near_dup_corpus(docs)
    pairs = D.jaccard_pairs_blocked(corpus, threshold=0.6)
    labels = D.connected_components(pairs)
    lens = corpus.select("doc_id", F.length("text").alias("n")).localCheckpoint(
        eager=True
    )
    members = labels.join(lens, "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("n"), F.asc("doc_id"))
    canon = (
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("canonical_id"))
    )
    mapped = labels.join(F.broadcast(canon), "component").select(
        "doc_id", "canonical_id"
    )
    singles = lens.join(labels, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("canonical_id")
    )
    return mapped, singles, lens
