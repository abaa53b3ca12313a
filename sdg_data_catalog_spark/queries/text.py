"""Text/ETL operator surface over the documents table (SURVEY.md §2.8 +
Phase 2): the TM_1 cleaning chain, tokenization, word count, tf-idf,
stopword removal, n-grams, quality scoring, token budgeting, fingerprints.

All hot paths are built-in pyspark.sql.functions (JVM, codegen); nothing
here drops to Python. Oracles use DuckDB list/regex functions (1-based list
indexing; regexp_replace needs the 'g' flag to match Spark's replace-all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.functions import text as T
from sdg_data_catalog_spark.queries.registry import register

_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in T.STOPWORDS) + ")"


@register(
    "text_clean_chain",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(lower(text), 'https?://[^ \\t\\n\\x0b\\f\\r]+|www\\.[^ \\t\\n\\x0b\\f\\r]+', '', 'g'),
                           '[^ \\t\\n\\x0b\\f\\r]*\\d[^ \\t\\n\\x0b\\f\\r]*', '', 'g'),
                       '[^ \\t\\n\\x0b\\f\\r]*@[^ \\t\\n\\x0b\\f\\r]*', '', 'g'),
                   '[^\\w \\t\\n\\x0b\\f\\r]', '', 'g'),
               '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g')) AS cleaned
    FROM documents
    """,
)
def text_clean_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cells 2-10 as one codegen'd expression chain."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.clean_chain(F.col("text")).alias("cleaned"))


@register(
    "agg_wordcount",
    oracle="""
    SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE length(w) > 2
    GROUP BY w
    """,
)
def agg_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word count (TM_1 cell 20 Counter()) with the len>2 filter
    (cell 3) — explode → hash agg with map-side partial aggregation."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .filter(F.length("word") > 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "topk_freq",
    oracle="""
    SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY cnt DESC, word ASC
    LIMIT 10
    """,
)
def topk_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N frequent words (TM_1 cnt.most_common(10)) — agg then
    TakeOrderedAndProject, deterministic tie-break on the word."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(10)
    )


@register(
    "agg_tf",
    oracle="""
    SELECT doc_id, w AS word, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY doc_id, w
    """,
)
def agg_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc term frequency (TM_2 doc2bow)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@register(
    "text_tfidf",
    oracle="""
    WITH tf AS (
        SELECT doc_id, w AS word, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.word,
           ROUND(CAST(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS DOUBLE), 6) AS tfidf
    FROM tf JOIN df USING (word) CROSS JOIN n
    WHERE tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) > 0.5
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf with a relevance floor. The doc-frequency side is a small agg
    (vocab-sized) → broadcast back against tf, so the big side shuffles once
    for the tf agg and never again."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # scalar; avoids a crossJoin of a 1-row agg
    tfidf = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    return (
        tf.join(F.broadcast(df), "word")
        .withColumn("tfidf", tfidf)
        .filter(F.col("tfidf") > 0.5)
        .select("doc_id", "word", F.round("tfidf", 6).alias("tfidf"))
    )


@register(
    "text_stopword_removal",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t NOT IN {_STOP_SQL})) AS INTEGER) AS n_content_tokens
    FROM documents
    """,
)
def text_stopword_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword anti-join (TM_1 cells 14-16) as an array filter against a
    pinned stoplist — per-row, no explode, no shuffle."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count_ws(F.col("text")).alias("n_tokens"),
        F.size(T.content_tokens(F.col("text"))).alias("n_content_tokens"),
    )


@register(
    "text_ngram_bigrams",
    oracle="""
    WITH thr AS (SELECT greatest(5, count(*) // 20) AS min_cnt FROM documents)
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM (SELECT string_split(text, ' ') AS t FROM documents)
    ), thr
    GROUP BY bigram, min_cnt
    HAVING COUNT(*) >= min_cnt
    """,
)
def text_ngram_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram mining with a min-count threshold (TM_2 cells 8-12,
    gensim.Phrases(min_count, threshold) analog). Bigrams are built
    per-row with a higher-order transform (no self-join), then hash-agg'd.
    The threshold scales with corpus size — max(5, n_docs/20) — so the
    query returns real rows at every sf instead of a fixed cutoff that is
    vacuous below some scale; the 1-row threshold aggregate rides in as a
    broadcast cross join."""
    docs = table(spark, sf_dir, "documents")
    thr = docs.agg(
        F.greatest(F.lit(5).cast("long"), F.floor(F.count(F.lit(1)) / 20)).alias("min_cnt")
    )
    # guard: sequence(1, 0) DESCENDS in Spark, so a 1-token doc would
    # reach element_at(t, 0) — a runtime error; the oracle's range(1, 1)
    # is empty, and so must this be (r13 shingle-hazard sweep)
    bigrams = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 2 THEN"
        " transform(sequence(1, size(split(text, ' ')) - 1),"
        " i -> concat_ws(' ', element_at(split(text, ' '), i), element_at(split(text, ' '), i + 1)))"
        " ELSE array() END"
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(thr))
        .filter(F.col("cnt") >= F.col("min_cnt"))
        .select("bigram", "cnt")
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                     t -> lower(t) IN {_STOP_SQL})) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS uniq_token_ratio,
           CASE WHEN len(string_split(text, ' ')) >= 20
                 AND len(list_distinct(string_split(text, ' ')))
                     >= 0.2 * len(string_split(text, ' '))
                THEN 1 ELSE 0 END AS keep_flag
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring for training-data filtering: length, stopword ratio,
    uniqueness, and a keep/drop flag — single narrow projection, fully
    pushdown-friendly."""
    docs = table(spark, sf_dir, "documents")
    q = T.quality_features(F.col("text"))
    keep = (q["n_tokens"] >= 20) & (q["uniq_token_ratio"] >= 0.2)
    return docs.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        F.round(q["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(q["uniq_token_ratio"], 6).alias("uniq_token_ratio"),
        keep.cast("int").alias("keep_flag"),
    )


@register(
    "text_token_budget",
    oracle="""
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0b\\f\\r]'))) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    GROUP BY lang
    """,
)
def text_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for corpus budgeting: whitespace + BPE-ish regex
    tokens per language."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.sum(T.token_count_ws(F.col("text"))).cast("bigint").alias("ws_tokens"),
        F.sum(T.token_count_bpe_ish(F.col("text"))).cast("bigint").alias("bpe_ish_tokens"),
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-token-set fingerprint (md5 of sorted distinct tokens) —
    the cheap dedup-cluster key."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


@register(
    "filter_contains",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs_with_data
    FROM documents WHERE contains(text, 'data')
    GROUP BY lang
    """,
)
def filter_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-paragraph filter (paper_processing.py:170-171
    `"data" in el`)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").contains("data"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("docs_with_data"))
    )


@register(
    "filter_minwords",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE len(string_split(text, ' ')) >= 60
    """,
)
def filter_minwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-token predicate (paper_processing.py:79-94 get_title
    min_words)."""
    docs = table(spark, sf_dir, "documents")
    return docs.filter(T.token_count_ws(F.col("text")) >= 60).select("doc_id", "lang")


_LANG_PROFILES = {
    "en": ("the", "a", "of", "and", "to", "value"),
    "fr": ("le", "les", "de", "et", "un"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "los", "de", "y", "una"),
}


def _profile_sql(profile: tuple) -> str:
    inlist = ", ".join(f"'{w}'" for w in profile)
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({inlist})))"


@register(
    "text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_profile_sql(_LANG_PROFILES['en'])} AS s_en,
             {_profile_sql(_LANG_PROFILES['fr'])} AS s_fr,
             {_profile_sql(_LANG_PROFILES['de'])} AS s_de,
             {_profile_sql(_LANG_PROFILES['es'])} AS s_es
      FROM documents)
    SELECT doc_id,
           CAST(s_en AS INT) AS s_en, CAST(s_fr AS INT) AS s_fr,
           CAST(s_de AS INT) AS s_de, CAST(s_es AS INT) AS s_es,
           CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                WHEN s_de >= s_es THEN 'de'
                ELSE 'es' END AS predicted_lang,
           (CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
                 WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
                 WHEN s_de >= s_es THEN 'de'
                 ELSE 'es' END = lang) AS is_correct
    FROM scored
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification via marker-token profiles (the training-data
    pipeline north star's 'language-ID (n-gram heuristic)'). Each language
    scores as the count of its marker tokens in the document; argmax with a
    deterministic preference order breaks ties. ONE higher-order fold over
    the token array scores all four profiles — one array traversal instead
    of four filter+size passes, and no filtered intermediate arrays ever
    materialize (r14, guide §4.1: the per-element work is the same four
    isin probes either way, so the fold only removes traversal+allocation;
    counts are exact integers, bit-identical — measured 3.26 → 2.84 s
    min-of-5 at the 100× replica, oracle-green at sf0.001/0.01/0.1).
    No shuffle, no UDF; real
    deployments swap the profiles for char-trigram frequency tables (same
    plan shape, wider accumulators).

    r15 (guide §4.2, measured): the interpreted fold moved into one
    Arrow pass — per batch the token arrays are integer-factorized
    (C-speed hash), the four marker probes run once per DISTINCT token
    (np.isin over the batch vocabulary instead of 4 isin probes per
    OCCURRENCE in the interpreted evaluator), and per-doc counts are
    np.add.reduceat over doc segments. Counts are exact integers
    (associative — batch/segment splits cannot change them); the
    tokenization stays Spark's own F.split, shipped through Arrow, and
    the argmax/tie-preference when-chain is computed in the JVM from
    the kernel's counts exactly as it was from the fold's struct — a
    NULL token array emits NULL counts, reproducing the retired
    aggregate(NULL) = NULL → pred 'es' semantics. Pinned against the
    fold form in tests/test_r15_langid_kernel.py."""
    import numpy as np
    import pandas as pd

    docs = table(spark, sf_dir, "documents")
    langs = ("en", "fr", "de", "es")
    profs = {k: np.asarray(v, dtype=object) for k, v in _LANG_PROFILES.items()}

    def _counts(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = pdf["t"]
            nn = np.asarray([a is not None for a in arrs])
            out = {
                "doc_id": pdf["doc_id"].to_numpy(),
                "lang": pdf["lang"].to_numpy(),
            }
            if nn.any():
                lens = np.asarray(
                    [len(a) for a in arrs[nn]], dtype=np.int64
                )
                flat = (
                    np.concatenate(
                        [np.asarray(a, dtype=object) for a in arrs[nn]]
                    )
                    if lens.sum()
                    else np.empty(0, dtype=object)
                )
                codes, uniques = pd.factorize(flat)
                offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
                for k in langs:
                    hit = np.isin(np.asarray(uniques, dtype=object), profs[k])
                    per_tok = (
                        hit[codes].astype(np.int64)
                        if len(flat)
                        else np.empty(0, dtype=np.int64)
                    )
                    seg = np.zeros(len(lens), dtype=np.int64)
                    nz = lens > 0
                    if nz.any():
                        seg[nz] = np.add.reduceat(per_tok, offsets[nz])
                    col = np.full(len(pdf), np.nan)
                    col[nn] = seg
                    out[f"s_{k}"] = pd.array(
                        [None if np.isnan(x) else int(x) for x in col],
                        dtype="Int64",
                    )
            else:
                for k in langs:
                    out[f"s_{k}"] = pd.array([None] * len(pdf), dtype="Int64")
            yield pd.DataFrame(out)

    scored = docs.select(
        "doc_id", "lang", F.split("text", " ").alias("t")
    ).mapInPandas(
        _counts,
        "doc_id long, lang string, s_en int, s_fr int, s_de int, s_es int",
    )
    docs = scored
    s_en = F.col("s_en")
    s_fr = F.col("s_fr")
    s_de = F.col("s_de")
    s_es = F.col("s_es")
    pred = (
        F.when((s_en >= s_fr) & (s_en >= s_de) & (s_en >= s_es), "en")
        .when((s_fr >= s_de) & (s_fr >= s_es), "fr")
        .when(s_de >= s_es, "de")
        .otherwise("es")
    )
    return docs.select(
        "doc_id",
        s_en.alias("s_en"),
        s_fr.alias("s_fr"),
        s_de.alias("s_de"),
        s_es.alias("s_es"),
        pred.alias("predicted_lang"),
        (pred == F.col("lang")).alias("is_correct"),
    )


@register(
    "text_repetition_score",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id,
               len(t) AS n_tokens,
               list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]) AS g2,
               CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
                    ELSE [] END AS g3
        FROM toks
    ),
    tf AS (
        SELECT doc_id, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(t) AS w FROM toks)
        GROUP BY doc_id, w
    ),
    top AS (SELECT doc_id, MAX(cnt) AS max_tf FROM tf GROUP BY doc_id)
    SELECT g.doc_id,
           CAST(g.n_tokens AS BIGINT) AS n_tokens,
           ROUND(CASE WHEN len(g2) > 0
                 THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2) ELSE 0.0 END, 6)
               AS dup_2gram_frac,
           ROUND(CASE WHEN len(g3) > 0
                 THEN 1.0 - len(list_distinct(g3)) * 1.0 / len(g3) ELSE 0.0 END, 6)
               AS dup_3gram_frac,
           ROUND(t.max_tf * 1.0 / g.n_tokens, 6) AS top_token_frac
    FROM grams g JOIN top t ON g.doc_id = t.doc_id
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals for corpus filtering (the Gopher-rules
    family, public: Rae et al. 2021 §A1.1): duplicate 2-/3-gram fraction
    and top-token concentration. N-gram stats are in-row expressions (no
    shuffle); top-token frequency uses the scalable explode → (doc, word)
    hash-agg → per-doc max — two shuffles on shrinking keys, never a
    per-row O(vocab²) loop."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # same guard as g3: 1-token docs must yield an empty bigram list, not
    # a descending sequence reaching element_at(t, 0) (r13 hazard sweep)
    g2 = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 2 THEN"
        " transform(sequence(1, size(split(text, ' ')) - 1),"
        " i -> concat_ws(' ', element_at(split(text, ' '), i),"
        "                element_at(split(text, ' '), i + 1)))"
        " ELSE array() END"
    )
    g3 = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 3 THEN"
        " transform(sequence(1, size(split(text, ' ')) - 2),"
        "  i -> concat_ws(' ', element_at(split(text, ' '), i),"
        "                 element_at(split(text, ' '), i + 1),"
        "                 element_at(split(text, ' '), i + 2)))"
        " ELSE array() END"
    )
    dup = lambda g: F.when(  # noqa: E731
        F.size(g) > 0, 1.0 - F.size(F.array_distinct(g)) / F.size(g)
    ).otherwise(F.lit(0.0))
    grams = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(dup(g2), 6).alias("dup_2gram_frac"),
        F.round(dup(g3), 6).alias("dup_3gram_frac"),
    )
    tf = (
        docs.select("doc_id", F.explode(toks).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = tf.groupBy("doc_id").agg(F.max("cnt").alias("max_tf"))
    return grams.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        "dup_2gram_frac",
        "dup_3gram_frac",
        F.round(F.col("max_tf") / F.col("n_tokens"), 6).alias("top_token_frac"),
    )


# --- PII redaction ---------------------------------------------------------

# Shared regex subset: identical semantics in Java regex (Spark) and RE2
# (DuckDB) — no lookaround, no backrefs, so both engines compile it the
# same way. Order matters: emails first (phone pattern could otherwise eat
# digits inside a local-part).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@register(
    "text_pii_redact",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id,
               text || ' contact u' || doc_id || '@mail' || (doc_id % 7)
                    || '.org or 555-01' || (doc_id % 10) || '-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' ip 10.0.' || (doc_id % 256) || '.1' AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS INTEGER) AS n_ips,
           regexp_replace(
               regexp_replace(
                   regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IPV4}', '<IP>', 'g') AS redacted
    FROM seeded
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every training-data pipeline runs
    before release (emails, phone numbers, IPv4 addresses → typed
    placeholder tokens). The corpus text is synthetic word-soup, so each doc
    is first salted with deterministic PII derived from doc_id (same
    expression on both engine sides); the redaction itself is a pure
    codegen'd regexp_replace chain — embarrassingly parallel, no shuffle,
    no Python, which is what makes it free to run over 100 TB. Counts are
    emitted per category so downstream audits can quantify exposure.
    Reference analog: the scraped-paper ingest keeps raw author emails
    (paper_processing.py author parsing) with no scrubbing stage at all."""
    docs = table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".org or 555-01"), (F.col("doc_id") % 10).cast("string"),
        F.lit("-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".1"),
    )
    seeded = docs.select("doc_id", t.alias("t"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>"),
        _PII_IPV4, "<IP>")
    return seeded.select(
        "doc_id",
        F.regexp_count("t", F.lit(_PII_EMAIL)).cast("int").alias("n_emails"),
        F.regexp_count("t", F.lit(_PII_PHONE)).cast("int").alias("n_phones"),
        F.regexp_count("t", F.lit(_PII_IPV4)).cast("int").alias("n_ips"),
        red.alias("redacted"),
    )


# --- unigram language-model scoring ----------------------------------------

@register(
    "lm_unigram_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    cnt AS (SELECT word, CAST(COUNT(*) AS DOUBLE) AS c FROM tok GROUP BY word),
    tot AS (SELECT SUM(c) AS s FROM cnt)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(ln(c / s)), 4) AS avg_logp
    FROM tok JOIN cnt USING (word), tot
    GROUP BY doc_id
    """,
)
def lm_unigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM perplexity proxy: score each doc by its
    mean token log-probability under the corpus's own unigram distribution —
    the classic cheap fluency/quality signal (KenLM-style filtering's first
    rung) for pretraining-data curation. Two passes: (1) explode → hash-agg
    word counts (map-side partial combine shrinks the shuffle to the vocab);
    (2) score tokens by joining the BROADCAST vocab — deliberately NOT a
    shuffle join on `word`, whose Zipfian skew ('the', 'a') would hot-spot
    one reducer at 100 TB. A real-scale deployment caps the broadcast at
    top-K words + an OOV floor probability; at test scale the whole vocab
    fits. The corpus-total scalar enters the same way (1-row broadcast
    crossJoin) — nothing is collected driver-side."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    # the vocab count table feeds the total AND the broadcast model — one
    # training pass over the corpus, not three (audited 3 document scans)
    cnt = (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = cnt.agg(F.sum("c").alias("s"))
    vocab = cnt.crossJoin(F.broadcast(tot)).select(
        "word", F.log(F.col("c") / F.col("s")).alias("logp")
    )
    return (
        tok.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("logp"), 4).alias("avg_logp"),
        )
    )
