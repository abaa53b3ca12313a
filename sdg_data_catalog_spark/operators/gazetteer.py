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


def match_names_join(corpus: DataFrame, names_df: DataFrame, text_col: str = "text") -> DataFrame:
    """SQL-expressible subset: (doc_id, name) for every gazetteer name
    contained in the doc. Broadcast nested-loop theta join — correct only
    while the gazetteer side is broadcastable (it is: dims of thousands)."""
    return (
        corpus.join(F.broadcast(names_df), F.col(text_col).contains(F.col("name")))
        .select("doc_id", "name")
    )
