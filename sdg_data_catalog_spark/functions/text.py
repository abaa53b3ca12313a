"""Composable text-cleaning column expressions.

Spark-first re-expression of the reference's TM_1 cleaning chain
(paper_classification/TM_1_DataCleaning.ipynb cells 2-22: lower → strip urls
→ strip number-words → strip punctuation → collapse whitespace → stopwords)
and paper_processing.py string hygiene. Every function here returns a Column
built from pyspark.sql.functions only — JVM-side, whole-stage-codegen'd, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword list used by oracle-checkable operators. The reference pulls
# NLTK's english list + domain additions (TM_1 cells 14-16); we pin an
# explicit list so Spark and any oracle agree byte-for-byte.
STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with",
)

# Engine-identical whitespace classes (round-14 regex-dialect sweep):
# Java's \s is [ \t\n\x0b\f\r] but DuckDB's RE2 \s omits \x0b (vertical
# tab, common in scraped text), so a literal \s in a regex shared with a
# DuckDB oracle silently diverges on real corpora. Spelling the class
# out makes Spark and every oracle agree on ALL input; on \x0b-free text
# the patterns are byte-equivalent to the previous \s forms.
WS = r"[ \t\n\x0b\f\r]"
NOT_WS = r"[^ \t\n\x0b\f\r]"


def lower(col: Column) -> Column:
    """TM_1 cell 2."""
    return F.lower(col)


def strip_urls(col: Column) -> Column:
    """TM_1 cell 4: https?://\\S+ | www.\\S+ -> ''."""
    return F.regexp_replace(col, rf"https?://{NOT_WS}+|www\.{NOT_WS}+", "")


def strip_number_words(col: Column) -> Column:
    """TM_1 cells 6-7: drop words containing a digit (\\S*\\d\\S*)."""
    return F.regexp_replace(col, rf"{NOT_WS}*\d{NOT_WS}*", "")


def strip_punct(col: Column) -> Column:
    """TM_1 cell 8: remove [^\\w\\s]."""
    return F.regexp_replace(col, r"[^\w \t\n\x0b\f\r]", "")


def strip_emails(col: Column) -> Column:
    """TM_1 cell 9: remove \\S*@\\S*."""
    return F.regexp_replace(col, rf"{NOT_WS}*@{NOT_WS}*", "")


def collapse_ws(col: Column) -> Column:
    """TM_1 cells 5,10; paper_processing.py:100,113: \\s+ -> ' ', trim."""
    return F.trim(F.regexp_replace(col, rf"{WS}+", " "))


def clean_chain(col: Column) -> Column:
    """The full deterministic slice of the TM_1 chain (spellfix/lemma/stem
    are model-backed and live in operators/textops.py as pandas UDFs)."""
    return collapse_ws(strip_punct(strip_emails(strip_number_words(strip_urls(lower(col))))))


def tokens(col: Column) -> Column:
    """Whitespace tokenization (utils/utils.py:18-20 spaCy-token analog for
    pre-cleaned text)."""
    return F.split(col, " ")


def content_tokens(col: Column) -> Column:
    """Tokens minus stopwords, duplicates preserved (StopWordsRemover
    semantics; TM_1 cells 14-16)."""
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(tokens(col), lambda t: ~F.array_contains(stop, t))


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish sub-token count: alpha runs, digit runs, and single
    non-alnum marks — the cheap proxy for tokenizer budget estimation."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]"), 0))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 over the sorted distinct token set of the
    lowercased text — the canonical 'fingerprint clustering' key
    (collapses token order + duplication + case)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(F.lower(col)))), " ")
    return F.md5(canon)


def quality_features(col: Column) -> dict[str, Column]:
    """Quality-scoring features for training-data filtering: each is a
    Column; callers select the ones they need."""
    n_chars = F.length(col)
    toks = tokens(col)
    n_tokens = F.size(toks)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": (n_chars - (n_tokens - 1)) / n_tokens,  # chars net of separators
        "stopword_ratio": n_stop / n_tokens,
        "punct_ratio": F.size(F.regexp_extract_all(col, F.lit(r"[^\w \t\n\x0b\f\r]"), 0)) / n_chars,
        "digit_ratio": F.size(F.regexp_extract_all(col, F.lit(r"[0-9]"), 0)) / n_chars,
        "uniq_token_ratio": F.size(F.array_distinct(toks)) / n_tokens,
    }
