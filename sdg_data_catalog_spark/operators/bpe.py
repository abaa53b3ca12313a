"""Distributed BPE tokenizer training (byte-pair-encoding merge loop).

`queries/sketches_curation.py::bpe_pair_counts` is ONE round of the inner
loop; this module runs the full trainer the way kmeans/pagerank run in
operators/iterative.py — per-iteration driver state is O(1) (the single
winning pair), all data-proportional work stays declarative and
distributed:

  1. word-count table, computed ONCE: (word, n) — BPE trains on the
     distinct-word histogram (the standard trick: a corpus of billions of
     tokens collapses to a vocabulary of ~1e6-1e7 rows, each carrying its
     count), so every later step is O(|vocab|), not O(corpus);
  2. each word becomes a symbol array (characters, with an end-of-word
     marker on the last symbol);
  3. per merge round: adjacent-pair counts weighted by word count (in-row
     slice/arrays_zip + one map-side-combined groupBy — the bpe_pair_counts
     shape), argmax collected to the driver (one tiny row), then the merge
     applied to every symbol array with a vectorized pandas UDF;
  4. the symbol table is localCheckpointed every few rounds (same
     lineage-cut discipline as pagerank — without it round k replays all
     k-1 prior merges per job).

Ties break lexicographically (count DESC, then pair) so training is
deterministic — the differential test reimplements the same rule in pure
Python and must produce the identical merge list.

Reference analog: none (the reference tokenizes with spaCy); this is
north-star "training-data pipeline" surface — the tokenizer-training step
that precedes token counting/packing.

At 100 TB: step 1 is the only corpus-wide shuffle. The merge loop touches
the vocabulary table only (fits executor memory at any realistic vocab
size), and the driver never holds more than one (pair, count) row.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

EOW = "</w>"  # end-of-word marker, appended to each word's last symbol


def word_histogram(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) distinct-word counts — the one corpus-wide shuffle."""
    return (
        corpus.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word → array of single-character symbols, EOW glued to the last."""

    @F.pandas_udf(ArrayType(StringType()))
    def split_chars(w: pd.Series) -> pd.Series:
        out = []
        for word in w:
            syms = list(word)
            syms[-1] = syms[-1] + EOW
            out.append(syms)
        return pd.Series(out)

    return words.select(split_chars("word").alias("syms"), "n")


def _pair_counts(symtab: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word count — in-row pair forming
    (slice + arrays_zip), one map-side-combined aggregate."""
    pairs = F.arrays_zip(
        F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))).alias("a"),
        F.slice("syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))).alias("b"),
    )
    return (
        symtab.select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(symtab: DataFrame, left: str, right: str) -> DataFrame:
    """Replace every adjacent (left, right) with the merged symbol —
    vectorized over the vocabulary table."""

    @F.pandas_udf(ArrayType(StringType()))
    def merge(syms: pd.Series) -> pd.Series:
        merged = left + right
        out = []
        for s in syms:
            s = list(s)
            res = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return symtab.select(merge("syms").alias("syms"), "n")


def bpe_train(
    corpus: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Run `n_merges` BPE merge rounds; returns the ordered merge list.

    Deterministic: ties break (count DESC, left ASC, right ASC). Stops
    early if no pair occurs twice."""
    symtab = _initial_symbols(word_histogram(corpus, text_col))
    symtab = symtab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(symtab)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right = top[0]["a"], top[0]["b"]
        merges.append((left, right))
        symtab = _apply_merge(symtab, left, right)
        # cut lineage every round: each merge stacks a pandas UDF on the
        # last — k rounds would otherwise re-run all k UDFs per job.
        # Rebinding drops the only reference to the prior round's
        # checkpoint; its blocks are released by Spark's ContextCleaner on
        # GC (Dataset.unpersist would be a no-op here — checkpoint blocks
        # aren't tracked by the CacheManager).
        symtab = symtab.localCheckpoint(eager=True)
    return merges


def encode_corpus(
    corpus: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Tokenize every document with a TRAINED merge list — the consumer
    side of bpe_train. The merge list (O(n_merges), tiny) rides to
    executors inside the UDF closure (broadcast-by-serialization); each
    Arrow batch encodes word-by-word with a per-batch memo dict, so a
    word's merge chain runs once per distinct word per batch, not once
    per occurrence. Returns (doc_id, n_words, n_tokens) — the
    pre-training token-budget measurement, now under the LEARNED
    tokenizer instead of the whitespace proxy (text_token_budget)."""

    def encode(batches):
        for pdf in batches:
            memo: dict[str, int] = {}
            n_words, n_tokens = [], []
            for text in pdf[text_col]:
                words = [w for w in (text or "").split(" ") if w]
                total = 0
                for w in words:
                    if w not in memo:
                        memo[w] = len(encode_words([w], merges)[0])
                    total += memo[w]
                n_words.append(len(words))
                n_tokens.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                }
            )

    return corpus.select("doc_id", text_col).mapInPandas(
        encode, "doc_id BIGINT, n_words BIGINT, n_tokens BIGINT"
    )


def encode_words(symtab_words: list[str], merges: list[tuple[str, str]]) -> list[list[str]]:
    """Driver-side reference encoder (used by tests): apply the merge list
    in order to each word."""
    out = []
    for word in symtab_words:
        syms = list(word)
        syms[-1] = syms[-1] + EOW
        for left, right in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        out.append(syms)
    return out
