"""Sequence packing: concat-and-chunk sharding at a fixed context length.

The canonical pretraining layout: documents are concatenated in a
deterministic order and the token stream is cut into fixed-size packs
(context windows). A document whose token span straddles a pack boundary
contributes a slice to each overlapping pack — exactly the
"concatenate then chunk every `budget` tokens" semantics of GPT-style
data loaders.

Scale shape: the only global coordination is the running token offset,
computed with the two-phase prefix sum (operators/curation.running_total:
range shuffle + O(#partitions) broadcast offsets — never a
single-partition window). Everything after is embarrassingly parallel:
the pack assignment of a document depends only on its own (start, end)
token interval, so the explode over overlapped packs runs inside the
partition that already holds the row. No shuffle grows with the number
of packs.

Reference parity: the reference prepares NER training batches by slicing
token lists driver-side (dataset_ner/ner_pipeline.py's batch assembly);
this is the distributed formulation of the same layout step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sdg_data_catalog_spark.operators.curation import running_total


def ws_token_count(text: Column) -> Column:
    """Whitespace token count — the same tokenization the dedup shingles
    and curation budget use (split on single space)."""
    return F.size(F.split(text, " ")).cast("bigint")


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document its pack slices under a fixed token budget.

    Returns one row per (document, overlapping pack):
      (order_col, pack_id, pack_offset, n_tokens)
    where `pack_offset` is the slice's start position INSIDE the pack and
    `n_tokens` the slice length. A document shorter than the remaining
    room in its pack emits one row; a straddler emits one row per pack it
    touches. sum(n_tokens) per pack == budget for every pack except the
    last — the invariant the property test asserts.
    """
    base = docs.select(order_col, ws_token_count(F.col(text_col)).alias("tk"))
    cum = running_total(base, order_col, F.col("tk"), "cum")
    start = F.col("cum") - F.col("tk")
    first_pack = F.floor(start / budget).cast("bigint")
    last_pack = F.floor((F.col("cum") - 1) / budget).cast("bigint")
    pack_lo = F.col("pack_id") * budget
    return (
        cum.withColumn("pack_id", F.explode(F.sequence(first_pack, last_pack)))
        .select(
            order_col,
            "pack_id",
            (F.greatest(start, pack_lo) - pack_lo).cast("bigint").alias("pack_offset"),
            (F.least(F.col("cum"), pack_lo + budget) - F.greatest(start, pack_lo))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
