"""Gazetteer containment matching (SURVEY.md join_gazetteer).

The reference scans every document against a 2,948-name gazetteer with a
hand-rolled trie (utils/fastmatch.py:45-134, O(text) per doc). Spark-first
shape: broadcast the name set once, run an Aho-Corasick-style scan inside
an Arrow-batched pandas_udf returning typed (match, start, end) structs —
a containment join Catalyst cannot express natively (§4.3 item 1).

The SQL-expressible variant (which names appear in which docs, without
offsets) is a broadcast theta-join registered with a full oracle in
queries/scoring_sampling.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MATCH_TYPE = ArrayType(
    StructType(
        [
            StructField("match", StringType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
        ]
    )
)


class Trie:
    """Minimal word-boundary-aware multi-pattern matcher. Longest match
    wins at each start position (fastmatch semantics); matching is O(text
    length x max pattern depth)."""

    __slots__ = ("root",)

    def __init__(self, names: list[str]):
        self.root: dict = {}
        for name in names:
            node = self.root
            for ch in name:
                node = node.setdefault(ch, {})
            node["$"] = name

    def scan(self, text: str) -> list[tuple[str, int, int]]:
        out = []
        n = len(text)
        i = 0
        while i < n:
            # word-boundary start (fastmatch scans word starts)
            if i > 0 and text[i - 1].isalnum():
                i += 1
                continue
            node, j, best = self.root, i, None
            while j < n and text[j] in node:
                node = node[text[j]]
                j += 1
                if "$" in node and (j == n or not text[j].isalnum()):
                    best = (node["$"], i, j)
            if best:
                out.append(best)
                i = best[2]
            else:
                i += 1
        return out


def match_spans(corpus: DataFrame, names: list[str], text_col: str = "text") -> DataFrame:
    """(doc_id, matches[]) with char offsets. The trie is built driver-side
    once, broadcast, and probed per Arrow batch."""
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(sorted(names))

    @F.pandas_udf(MATCH_TYPE)
    def scan(texts: pd.Series) -> pd.Series:
        trie = Trie(bc.value)  # built once per executor task batch-stream
        return texts.map(trie.scan)

    return corpus.select("doc_id", scan(F.col(text_col)).alias("matches"))


# Above this many names the broadcast contains-join (work ∝ docs × names)
# loses to the substring equi-join (work ∝ corpus chars × distinct name
# lengths, independent of gazetteer cardinality).
GAZETTEER_BROADCAST_BOUND = 10_000


def match_names_join(
    corpus: DataFrame,
    names_df: DataFrame,
    text_col: str = "text",
    strategy: str = "auto",
) -> DataFrame:
    """SQL-expressible subset: (doc_id, name) for every gazetteer name
    contained in the doc — distinct pairs, any number of occurrences.

    Two physical strategies, identical results:

    - ``broadcast``: nested-loop contains join. Work is O(docs × names) —
      unbeatable while the gazetteer is dim-sized (thousands), a
      scale-killer beyond ~10⁴ names (round-3 review finding).
    - ``equijoin``: the 100 TB path for big gazetteers. For each DISTINCT
      name length L (gazetteers cluster on a handful of lengths), explode
      every doc into its length-L substrings and hash-join on the name
      string itself. Work is O(corpus chars × distinct lengths) and fully
      shuffle-parallel — gazetteer cardinality only sizes the join's build
      side, which AQE broadcasts or shuffles as its stats dictate.
    - ``auto``: one count of the (small) names side picks the bound.
    """
    if strategy == "auto":
        strategy = (
            "broadcast"
            if names_df.count() <= GAZETTEER_BROADCAST_BOUND
            else "equijoin"
        )
    if strategy == "broadcast":
        return (
            corpus.join(F.broadcast(names_df), F.col(text_col).contains(F.col("name")))
            .select("doc_id", "name")
        )
    lengths = sorted(
        r[0]
        for r in names_df.select(F.length("name").alias("l")).distinct().collect()
        if r[0]
    )
    subs = None
    for L in lengths:
        piece = corpus.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"CASE WHEN length({text_col}) >= {L} THEN "
                    f"transform(sequence(1, length({text_col}) - {L} + 1), "
                    f"p -> substring({text_col}, p, {L})) "
                    f"ELSE array() END"
                )
            ).alias("name"),
        )
        subs = piece if subs is None else subs.unionByName(piece)
    return (
        subs.join(names_df.hint("shuffle_hash"), "name")
        .select("doc_id", "name")
        .distinct()
    )
