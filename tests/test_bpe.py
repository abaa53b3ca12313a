"""BPE trainer: the distributed merge loop must match a pure-Python
reference trainer exactly (same histogram, same tie-break), and the merge
list must be usable to encode."""

from __future__ import annotations

from collections import Counter

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators.bpe import EOW, bpe_train, encode_words


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference trainer: same algorithm, pure Python."""
    vocab = {}
    for w, n in word_counts.items():
        syms = list(w)
        syms[-1] = syms[-1] + EOW
        vocab[tuple(syms)] = vocab.get(tuple(syms), 0) + n
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (left, right), _ = best
        merges.append((left, right))
        new_vocab = {}
        for syms, n in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_python_reference(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(300)
    got = bpe_train(docs, n_merges=12)
    counts: Counter = Counter()
    for r in docs.select("text").collect():
        for w in r.text.split(" "):
            if w:
                counts[w] += 1
    expect = _py_bpe(dict(counts), 12)
    assert got == expect


def test_bpe_merges_compress(spark, sf_dir):
    """Encoding with the learned merges must shorten the symbol sequences
    of the most frequent words (that is the point of BPE)."""
    docs = table(spark, sf_dir, "documents").limit(300)
    merges = bpe_train(docs, n_merges=12)
    assert merges  # corpus is non-trivial
    counts: Counter = Counter()
    for r in docs.select("text").collect():
        for w in r.text.split(" "):
            if w:
                counts[w] += 1
    top_words = [w for w, _ in counts.most_common(5)]
    encoded = encode_words(top_words, merges)
    assert sum(len(e) for e in encoded) < sum(len(w) + 0 for w in top_words)
    # round-trip: concatenating symbols (minus EOW) reproduces the word
    for w, e in zip(top_words, encoded):
        assert "".join(e).replace(EOW, "") == w


def test_bpe_encode_corpus_matches_reference_and_invariants(spark, sf_dir):
    from sdg_data_catalog_spark.operators.bpe import bpe_train, encode_corpus

    docs = table(spark, sf_dir, "documents").limit(200)
    merges = bpe_train(docs, n_merges=10)
    got = {r.doc_id: r for r in encode_corpus(docs, merges).collect()}
    for d in docs.collect()[:25]:
        words = [w for w in d.text.split(" ") if w]
        expect = sum(len(e) for e in encode_words(words, merges))
        r = got[d.doc_id]
        assert r.n_words == len(words)
        assert r.n_tokens == expect
        assert r.n_tokens >= r.n_words
        assert r.n_tokens <= sum(len(w) for w in words)
    # monotonicity: more merges never increase token counts
    fewer = {r.doc_id: r.n_tokens for r in encode_corpus(docs, merges[:3]).collect()}
    for did, r in got.items():
        assert r.n_tokens <= fewer[did]


def test_bpe_registered_query_shape(spark, sf_dir):
    from sdg_data_catalog_spark.queries.registry import all_queries

    out = all_queries()["bpe_train_merges"](spark, sf_dir)
    rows = out.collect()
    assert out.columns == ["rank", "left_sym", "right_sym", "merged"]
    assert [r.rank for r in rows] == list(range(len(rows)))
    assert all(r.merged == r.left_sym + r.right_sym for r in rows)
