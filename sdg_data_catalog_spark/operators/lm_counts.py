"""Fused unigram+bigram count partials — the Arrow kernel behind
lm_bigram_score's model build.

The add-k bigram LM needs two corpus-wide count tables: c1(w) over every
token occurrence and c2(w1, w2) over every adjacent pair. The expression
form pays one corpus-sized explode per table (the r14 A/B showed a
single fused explode of 2n−1 struct keys is WORSE — 7.70 s vs
4.50 + 2.14 s at the 100× replica — because the explode ROW COUNT, not
the number of corpus scans, is the cost). This kernel removes the
occurrence rows altogether (guide §2.3 "aggregate before you shuffle" +
§4.2): ONE mapInPandas pass counts each Arrow batch's unigrams and
bigrams in a C-speed Counter and emits only the per-batch PARTIAL count
rows (vocabulary-sized, not occurrence-sized), so the JVM never sees an
exploded token stream and the final groupBy sums tiny integer partials.

Equivalence is arithmetic-free: counts are exact int64 (associative —
the batch split cannot change them), tokenization happens in Spark
(`F.split`, identical to the retired form) BEFORE the kernel so the
token arrays crossing the boundary are the very arrays the explodes
consumed, and the downstream CAST(double) / smoothing / log expressions
are untouched. Pinned against live explode+groupBy counts in
tests/test_r15_lm_counts_kernel.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def token_count_partials(
    docs: DataFrame, tokens_col: str = "t", mode: str = "both"
) -> DataFrame:
    """Per-batch PARTIAL token counts of `docs[tokens_col]` (an
    array<string> of pre-split tokens):

        (kind, w1, w2, cnt)   kind 1 = unigram (w2 NULL), 2 = bigram

    mode: "both" (lm_bigram_score), "bigrams" (bpe_pair_counts) or
    "unigrams" (sketch_topk_vocab) — single-kind callers skip the other
    census entirely. Callers MUST finish with groupBy + SUM(cnt) per
    key — integer sums are associative, so the per-batch split is exact
    by construction. NULL token arrays contribute nothing (explode
    semantics); a 1-token doc contributes its unigram only (empty
    bigram slice)."""
    from collections import Counter

    import pandas as pd

    do_uni, do_big = mode != "bigrams", mode != "unigrams"

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            uni: Counter = Counter()
            big: Counter = Counter()
            for arr in pdf[tokens_col]:
                if arr is None:
                    continue
                toks = list(arr)
                if do_uni:
                    uni.update(toks)
                if do_big and len(toks) > 1:
                    big.update(zip(toks, toks[1:]))
            n1, n2 = len(uni), len(big)
            yield pd.DataFrame(
                {
                    "kind": [1] * n1 + [2] * n2,
                    "w1": [w for w in uni] + [p[0] for p in big],
                    "w2": [None] * n1 + [p[1] for p in big],
                    "cnt": [c for c in uni.values()] + [c for c in big.values()],
                }
            ).astype({"kind": "int32", "cnt": "int64"})

    return docs.select(tokens_col).mapInPandas(
        partials, "kind int, w1 string, w2 string, cnt long"
    )
