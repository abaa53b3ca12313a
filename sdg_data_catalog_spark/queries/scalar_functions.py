"""Scalar function surface (SURVEY.md §2.8): every string / date / math /
array / map function the reference applies row-at-a-time in Python becomes a
built-in Spark SQL expression — JVM-side, inside whole-stage codegen, no
Python in the hot path. UDFs only where the reference's op is genuinely
non-expressible (spell-fix, lemmatize — gated, rows-only).

Inputs that need noise (URLs, emails, digits, punctuation — the driver's
``documents.text`` is clean word soup) synthesize it per row from existing
columns with identical expressions on the Spark and DuckDB sides, so the
oracle verifies the *function semantics*, not just a no-op pass-through.

Reference analogs are the TM_1_DataCleaning.ipynb cell chain (cells 2-22),
paper_processing.py string fixes (:100,113,116,127), the scraper's URL
munging (papers_download.py:121; papers_scrapping_specific_arxiv.py:93), and
the CRF/AL math kernels (crf.py:5-11; active_learning.py:138-168).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.functions import text as T
from sdg_data_catalog_spark.queries.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# String cleaning (TM_1 cells 2-18)
# ---------------------------------------------------------------------------
@register(
    "str_lower",
    oracle="SELECT doc_id, lower(upper(substr(text, 1, 40))) AS lowered FROM documents",
)
def str_lower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 2: lowercase every word."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.lower(F.upper(F.col("text").substr(1, 40))).alias("lowered")
    )


@register(
    "str_len_filter",
    oracle="""
    SELECT doc_id,
           array_to_string(list_filter(string_split(substr(text, 1, 120), ' '), x -> len(x) > 2), '|') AS long_tokens
    FROM documents
    """,
)
def str_len_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 3: drop words of <= 2 chars (higher-order filter, no
    explode). '|'-joined scalar output for canon safety."""
    toks = F.split(F.col("text").substr(1, 120), " ")
    return _docs(spark, sf_dir).select(
        "doc_id", F.array_join(F.filter(toks, lambda x: F.length(x) > 2), "|").alias("long_tokens")
    )


@register(
    "str_rm_url",
    oracle=r"""
    SELECT doc_id,
           regexp_replace('see http://' || source || '.example.org/a?b=1 or www.x.org end ' || substr(text, 1, 30),
                          'https?://[^ \t\n\x0b\f\r]+|www\.[^ \t\n\x0b\f\r]+', '', 'g') AS no_urls
    FROM documents
    """,
)
def str_rm_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 4: strip URLs."""
    noisy = F.concat(
        F.lit("see http://"), F.col("source"), F.lit(".example.org/a?b=1 or www.x.org end "),
        F.col("text").substr(1, 30),
    )
    return _docs(spark, sf_dir).select(
        "doc_id", F.regexp_replace(noisy, rf"https?://{T.NOT_WS}+|www\.{T.NOT_WS}+", "").alias("no_urls")
    )


@register(
    "str_ws_norm",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(replace(substr(text, 1, 60), ' ', '   '), '[ \t\n\x0b\f\r]+', ' ', 'g')) AS normalized
    FROM documents
    """,
)
def str_ws_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cells 5,10 / paper_processing.py:100,113: collapse whitespace."""
    padded = F.replace(F.col("text").substr(1, 60), F.lit(" "), F.lit("   "))
    return _docs(spark, sf_dir).select(
        "doc_id", F.trim(F.regexp_replace(padded, rf"{T.WS}+", " ")).alias("normalized")
    )


@register(
    "str_rm_numwords",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(substr(text, 1, 40) || ' a1b 42 x9 ok', '[^ \t\n\x0b\f\r]*\d[^ \t\n\x0b\f\r]*', '', 'g') AS no_numwords
    FROM documents
    """,
)
def str_rm_numwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cells 6-7: remove words containing digits."""
    noisy = F.concat(F.col("text").substr(1, 40), F.lit(" a1b 42 x9 ok"))
    return _docs(spark, sf_dir).select(
        "doc_id", F.regexp_replace(noisy, rf"{T.NOT_WS}*\d{T.NOT_WS}*", "").alias("no_numwords")
    )


@register(
    "str_rm_punct",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(substr(text, 1, 40) || ' a,b.c!d?e;f', '[^\w \t\n\x0b\f\r]', '', 'g') AS no_punct
    FROM documents
    """,
)
def str_rm_punct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 8: strip punctuation."""
    noisy = F.concat(F.col("text").substr(1, 40), F.lit(" a,b.c!d?e;f"))
    return _docs(spark, sf_dir).select(
        "doc_id", F.regexp_replace(noisy, r"[^\w \t\n\x0b\f\r]", "").alias("no_punct")
    )


@register(
    "str_rm_email",
    oracle=r"""
    SELECT doc_id,
           regexp_replace('contact ' || source || '@mail.example.org next ' || substr(text, 1, 30),
                          '[^ \t\n\x0b\f\r]*@[^ \t\n\x0b\f\r]*[ \t\n\x0b\f\r]?', '', 'g') AS no_emails
    FROM documents
    """,
)
def str_rm_email(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 9: strip email addresses."""
    noisy = F.concat(
        F.lit("contact "), F.col("source"), F.lit("@mail.example.org next "),
        F.col("text").substr(1, 30),
    )
    return _docs(spark, sf_dir).select(
        "doc_id", F.regexp_replace(noisy, rf"{T.NOT_WS}*@{T.NOT_WS}*{T.WS}?", "").alias("no_emails")
    )


@register(
    "str_rm_quote",
    oracle="""
    SELECT doc_id, translate('it''s ' || lang || '''s ' || substr(text, 1, 20), '''', '') AS no_quotes
    FROM documents
    """,
)
def str_rm_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 11: strip single quotes via translate (single char pass,
    cheaper than regex)."""
    noisy = F.concat(F.lit("it's "), F.col("lang"), F.lit("'s "), F.col("text").substr(1, 20))
    return _docs(spark, sf_dir).select(
        "doc_id", F.translate(noisy, "'", "").alias("no_quotes")
    )


@register(
    "str_contractions",
    oracle="""
    SELECT doc_id,
           replace(replace(replace('don''t stop, can''t wait, won''t go: ' || substr(text, 1, 20),
                   'don''t', 'do not'), 'can''t', 'cannot'), 'won''t', 'will not') AS expanded
    FROM documents
    """,
)
def str_contractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 13 (contractions.fix): expansion as a chained literal
    replace map — no regex, no UDF; extend the map by chaining."""
    noisy = F.concat(F.lit("don't stop, can't wait, won't go: "), F.col("text").substr(1, 20))
    out = F.replace(
        F.replace(
            F.replace(noisy, F.lit("don't"), F.lit("do not")),
            F.lit("can't"), F.lit("cannot"),
        ),
        F.lit("won't"), F.lit("will not"),
    )
    return _docs(spark, sf_dir).select("doc_id", out.alias("expanded"))


@register(
    "str_stopwords",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_filter(string_split(substr(text, 1, 120), ' '),
                         x -> x NOT IN ('the', 'a', 'of', 'and', 'to', 'in')), '|') AS content_tokens
    FROM documents
    """,
)
def str_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cells 14-16: stopword removal as an array-level filter (the
    exploded anti-join variant is text_stopword_removal; this is the
    in-row form — no shuffle at all). '|'-joined output for canon safety."""
    stop = ("the", "a", "of", "and", "to", "in")
    toks = F.split(F.col("text").substr(1, 120), " ")
    return _docs(spark, sf_dir).select(
        "doc_id", F.array_join(F.filter(toks, lambda x: ~x.isin(*stop)), "|").alias("content_tokens")
    )


@register(
    "str_stem",
    # raw string: '\z' must reach DuckDB as backslash-z (Python would keep
    # it anyway for an unknown escape, but that path is deprecated)
    oracle=r"""
    SELECT doc_id,
           array_to_string(
             list_transform(string_split(substr(text, 1, 120), ' '),
                            x -> regexp_replace(x, '(ing|ed|s)\z', '')), '|') AS stemmed
    FROM documents
    """,
)
def str_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 18 (PorterStemmer): the suffix-stripping core expressed as a
    per-token regexp inside transform — the full Porter cascade is just more
    chained rules; no Python per row. '|'-joined output for canon safety."""
    toks = F.split(F.col("text").substr(1, 120), " ")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.array_join(
            F.transform(toks, lambda x: F.regexp_replace(x, r"(ing|ed|s)\z", "")), "|"
        ).alias("stemmed"),
    )


@register(
    "str_tokenize",
    oracle=r"""
    SELECT doc_id,
           array_to_string(string_split_regex(trim(substr(text, 1, 120)), '[ \t\n\x0b\f\r]+'), '|') AS tokens,
           CAST(len(string_split_regex(trim(substr(text, 1, 120)), '[ \t\n\x0b\f\r]+')) AS INT) AS n_tokens
    FROM documents
    """,
)
def str_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_2 cell 4 / utils/utils.py:18-20: whitespace-regex tokenizer.
    '|'-joined token output for canon safety; n_tokens keeps the size."""
    toks = F.split(F.trim(F.col("text").substr(1, 120)), rf"{T.WS}+")
    return _docs(spark, sf_dir).select(
        "doc_id", F.array_join(toks, "|").alias("tokens"), F.size(toks).alias("n_tokens")
    )


@register(
    "str_rm_digits",
    oracle="SELECT doc_id, regexp_replace(source || '123x4', '[0-9]', '', 'g') AS no_digits FROM documents",
)
def str_rm_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """paper_processing.py:116: re.sub('[0-9]','', author)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace(F.concat(F.col("source"), F.lit("123x4")), "[0-9]", "").alias("no_digits"),
    )


@register(
    "str_rm_paren",
    oracle="SELECT doc_id, translate('(' || lang || ') ' || source, '()', '') AS no_parens FROM documents",
)
def str_rm_paren(spark: SparkSession, sf_dir: str) -> DataFrame:
    """paper_processing.py:127: strip parentheses from affiliations."""
    noisy = F.concat(F.lit("("), F.col("lang"), F.lit(") "), F.col("source"))
    return _docs(spark, sf_dir).select(
        "doc_id", F.translate(noisy, "()", "").alias("no_parens")
    )


@register(
    "str_join_plus",
    oracle="SELECT doc_id, replace(substr(text, 1, 50), ' ', '+') AS plus_joined FROM documents",
)
def str_join_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """papers_scrapping_specific_arxiv.py:93: '+'.join(title.split(' '))
    for search-query URLs — a single literal replace."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.replace(F.col("text").substr(1, 50), F.lit(" "), F.lit("+")).alias("plus_joined"),
    )


@register(
    "str_urlencode",
    oracle="SELECT doc_id, replace(substr(text, 1, 30), ' ', '+') AS encoded FROM documents",
)
def str_urlencode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """papers_download.py:121: urllib.parse.quote of the search query.
    Spark 3.4+ url_encode (form-encoding: space → '+'); the oracle encodes
    the same [a-z ] input literally since DuckDB lacks url_encode."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.url_encode(F.col("text").substr(1, 30)).alias("encoded")
    )


@register(
    "str_charset",
    oracle="SELECT doc_id, lang AS charset FROM documents",
)
def str_charset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """papers_download.py:104-115: charset sniff from a Content-Type header.
    Header synthesized from lang; regexp_extract pulls it back (round-trip
    identity checked by the oracle)."""
    header = F.concat(F.lit("text/html; charset="), F.col("lang"), F.lit(" "))
    return _docs(spark, sf_dir).select(
        "doc_id", F.regexp_extract(header, r"charset=(\S+)", 1).alias("charset")
    )


# ---------------------------------------------------------------------------
# Date / math
# ---------------------------------------------------------------------------
@register(
    "date_today",
    oracle="""
    SELECT strftime(current_date, '%Y-%m-%d') AS report_date,
           CAST(COUNT(*) AS BIGINT) AS n_regions
    FROM region
    """,
)
def date_today(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wrapper_ner.py:41: datetime.today().strftime('%Y-%m-%d') report
    stamp. Both engines evaluate current_date at check time (same day)."""
    return (
        table(spark, sf_dir, "region")
        .agg(F.count("*").alias("n_regions"))
        .select(
            F.date_format(F.current_date(), "yyyy-MM-dd").alias("report_date"), "n_regions"
        )
    )


@register(
    "math_softmax",
    oracle="""
    WITH base AS (
      SELECT vec_id, list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)) AS l FROM embeddings),
    m AS (SELECT vec_id, l, list_aggregate(l, 'max') AS mx FROM base),
    e AS (SELECT vec_id, list_transform(l, x -> exp(x - mx)) AS exps FROM m)
    SELECT vec_id,
           CAST(unnest(range(len(exps))) AS INT) AS pos,
           unnest(list_transform(exps, x -> round(x / list_aggregate(exps, 'sum'), 6))) AS softmax
    FROM e
    """,
)
def math_softmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """active_learning.py:138-140,166-168: numerically-stable softmax
    (exp(x - max) / sum) — pure higher-order array expressions over the
    embedding column; no UDF. The vector is surfaced exploded to
    (vec_id, pos, value) scalar rows — canon-safe and the shape a
    downstream relational consumer wants anyway."""
    emb = table(spark, sf_dir, "embeddings")
    arr = F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double"))
    mx = F.array_max(arr)
    exps = F.transform(arr, lambda x: F.exp(x - mx))
    s = F.aggregate(exps, F.lit(0.0), lambda acc, x: acc + x)
    sm = F.transform(exps, lambda x: F.round(x / s, 6))
    return emb.select("vec_id", F.posexplode(sm).alias("pos", "softmax"))


# ---------------------------------------------------------------------------
# Array / map ops
# ---------------------------------------------------------------------------
@register(
    "arr_truncate",
    oracle="""
    WITH t AS (SELECT vec_id,
                      list_transform(embedding[1:8], x -> round(CAST(x AS DOUBLE), 4)) AS head8
               FROM embeddings)
    SELECT vec_id,
           CAST(unnest(range(len(head8))) AS INT) AS pos,
           unnest(head8) AS val
    FROM t
    """,
)
def arr_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """utils/utils.py:20,24: [:max_seq_len] truncation via slice; surfaced
    exploded to (vec_id, pos, val) scalar rows for canon safety."""
    emb = table(spark, sf_dir, "embeddings")
    head8 = F.transform(F.slice("embedding", 1, 8), lambda x: F.round(x.cast("double"), 4))
    return emb.select("vec_id", F.posexplode(head8).alias("pos", "val"))


@register(
    "arr_map_lookup",
    oracle="""
    SELECT e.vec_id, n1.n_name || '|' || n2.n_name AS decoded
    FROM embeddings e
    JOIN nation n1 ON n1.n_nationkey = e.label % 25
    JOIN nation n2 ON n2.n_nationkey = (e.label + 7) % 25
    """,
)
def arr_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """utils/utils.py:4-16 vec_to_tags: id → tag decode over a vector.
    The tag map is a small dimension (reference: d_id_word dict) loaded
    driver-side once and baked into the plan as a map literal — the
    broadcast-dict pattern; transform() decodes in-row with no join,
    no explode, no shuffle. Oracle decodes relationally (join twice)."""
    import os

    emb = table(spark, sf_dir, "embeddings")
    nat = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    mapping = F.create_map(
        *[F.lit(v) for kv in zip(nat["n_nationkey"], nat["n_name"]) for v in kv]
    )
    ids = F.array(F.col("label") % 25, (F.col("label") + 7) % 25)
    return emb.select(
        "vec_id", F.array_join(F.transform(ids, lambda i: mapping[i]), "|").alias("decoded")
    )


@register(
    "arr_onehot",
    oracle="""
    SELECT vec_id,
           array_to_string([CASE WHEN label % 5 = 0 THEN 1 ELSE 0 END,
            CASE WHEN label % 5 = 1 THEN 1 ELSE 0 END,
            CASE WHEN label % 5 = 2 THEN 1 ELSE 0 END,
            CASE WHEN label % 5 = 3 THEN 1 ELSE 0 END,
            CASE WHEN label % 5 = 4 THEN 1 ELSE 0 END], ',') AS onehot
    FROM embeddings
    """,
)
def arr_onehot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """few_shot_learning.ipynb cells 16-17: label → one-hot row, surfaced
    ','-joined ('1,0,0,0,0') for canon safety."""
    emb = table(spark, sf_dir, "embeddings")
    cls = F.col("label") % 5
    onehot = F.array(*[F.when(cls == i, F.lit("1")).otherwise(F.lit("0")) for i in range(5)])
    return emb.select("vec_id", F.array_join(onehot, ",").alias("onehot"))


# ---------------------------------------------------------------------------
# Non-expressible text ops — gated UDF stubs, rows-only
# ---------------------------------------------------------------------------
@register(
    "str_spellfix",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(
             string_split('teh start adn ' || substr(text, 1, 40), ' '),
             w -> CASE WHEN w = 'teh' THEN 'the'
                       WHEN w = 'adn' THEN 'and'
                       WHEN w = 'wiht' THEN 'with'
                       ELSE w END), ' ') AS fixed
    FROM documents WHERE doc_id < 500
    """,
)
def str_spellfix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 12 (TextBlob .correct()). TextBlob is not in this
    container; the correction table is a deterministic dict UDF with the
    same signature — swap the lambda body for TextBlob where available.
    Arrow-batched pandas UDF, never per-row Python. Promoted to a full
    oracle in round 6: the dict fallback is a pure word map, so DuckDB
    reproduces it exactly (the doc_id < 500 filter replaces the old
    unordered limit — deterministic subset on both engines)."""
    from pyspark.sql.functions import pandas_udf

    fixes = {"teh": "the", "adn": "and", "wiht": "with"}

    @pandas_udf("string")
    def fix(s: pd.Series) -> pd.Series:
        return s.map(lambda t: " ".join(fixes.get(w, w) for w in t.split(" ")))

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    noisy = F.concat(F.lit("teh start adn "), F.col("text").substr(1, 40))
    return docs.select("doc_id", fix(noisy).alias("fixed"))


@register(
    "str_lemma",
    oracle="""
    SELECT doc_id,
           array_to_string(list_transform(
             string_split(substr(text, 1, 120), ' '),
             w -> CASE WHEN w = 'ran' THEN 'run'
                       WHEN w = 'went' THEN 'go'
                       WHEN w = 'better' THEN 'good'
                       WHEN w LIKE '%ies' AND len(w) > 5
                         THEN substr(w, 1, len(w) - 3) || 'y'
                       WHEN w LIKE '%ing' AND len(w) > 5
                         THEN substr(w, 1, len(w) - 3)
                       WHEN w LIKE '%ed' AND len(w) > 4
                         THEN substr(w, 1, len(w) - 2)
                       WHEN w LIKE '%s' AND len(w) > 3
                         THEN substr(w, 1, len(w) - 1)
                       ELSE w END), ' ') AS lemmas
    FROM documents WHERE doc_id < 500
    """,
)
def str_lemma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TM_1 cell 17 / TM_2 cells 10-12 (WordNet / spaCy lemmatizer). The
    model libs are absent; a deterministic suffix-rule lemmatizer keeps the
    dataflow (Arrow batch in, token array out) real and testable. Promoted
    to a full oracle in round 6: the fallback is a pure ordered rule chain
    (irregular map, then ies→y / ing / ed / s suffix strips gated on word
    length), mirrored exactly by the oracle's CASE ladder; the doc_id <
    500 filter replaces the old unordered limit."""
    from pyspark.sql.functions import pandas_udf

    irregular = {"ran": "run", "went": "go", "better": "good"}

    def lemma(word: str) -> str:
        if word in irregular:
            return irregular[word]
        for suf, rep in (("ies", "y"), ("ing", ""), ("ed", ""), ("s", "")):
            if word.endswith(suf) and len(word) > len(suf) + 2:
                return word[: -len(suf)] + rep
        return word

    @pandas_udf("array<string>")
    def lemmatize(s: pd.Series) -> pd.Series:
        return s.map(lambda t: [lemma(w) for w in t.split(" ")])

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 500)
    # ' '-joined string, not array<string>: the external canonicalizer
    # sorts every column with pandas and crashes on list cells.
    return docs.select(
        "doc_id",
        F.array_join(lemmatize(F.col("text").substr(1, 120)), " ").alias("lemmas"),
    )
