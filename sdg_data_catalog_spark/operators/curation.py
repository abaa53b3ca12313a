"""End-to-end corpus curation: quality filter → fingerprint dedup →
token-budget cut — the composed pipeline a training-data engine exists to
run (BASELINE.json north star; composes the §2 text/dedup operators).

The token-budget cut needs a GLOBAL running sum in a deterministic order.
A naive `Window.orderBy(key)` with no partition key moves every row to one
partition — the classic scale-killer (Spark even warns). `running_total`
here is the two-phase scalable form:

  1. `repartitionByRange(key)` — ascending key ranges land on ascending
     partition ids (one shuffle, the same one a global sort would do);
  2. per-partition totals (tiny: one row per partition) collect to the
     driver and turn into exclusive prefix OFFSETS, broadcast back;
  3. each partition computes its local running sum with a
     partition-id-scoped window (no second shuffle) and adds its offset.

Total cost: one range shuffle + one O(#partitions) driver exchange,
instead of serializing the whole table through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.functions import text as T


def running_total(
    df: DataFrame, key_col: str, val_col: Column, out_col: str, num_partitions: int = 32
) -> DataFrame:
    """Global running sum of `val_col` in ascending `key_col` order,
    computed scalably (see module docstring). `key_col` must be unique
    (it defines the total order)."""
    with_val = df.withColumn("__v", val_col)
    ranged = with_val.repartitionByRange(num_partitions, F.col(key_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    # cache: the partition-sum pass and the final pass must see the SAME
    # partitioning (repartitionByRange samples range bounds per evaluation)
    ranged = ranged.localCheckpoint(eager=True)
    sums = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid").agg(F.sum("__v").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]
    if offsets:
        offset_map = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        off = F.coalesce(offset_map[F.col("__pid")], F.lit(0))
    else:
        # empty input: create_map() with zero entries is VOID-typed and
        # cannot be keyed by an int — there is nothing to offset anyway
        off = F.lit(0)
    w = Window.partitionBy("__pid").orderBy(key_col)
    return (
        ranged.withColumn(out_col, F.sum("__v").over(w) + off)
        .drop("__v", "__pid")
    )


def curate(
    docs: DataFrame,
    min_tokens: int = 20,
    min_uniq_ratio: float = 0.2,
    token_budget: int = 200_000,
) -> DataFrame:
    """documents(doc_id, lang, text) → curated selection:
    quality gate → canonical-fingerprint dedup (min doc_id survives) →
    token-budget prefix cut in doc_id order. Returns
    (doc_id, lang, ws_tokens, cum_tokens)."""
    q = T.quality_features(F.col("text"))
    kept = docs.select(
        "doc_id", "lang", "text", q["n_tokens"].alias("ws_tokens"),
        q["uniq_token_ratio"].alias("uniq_ratio"),
    ).filter((F.col("ws_tokens") >= min_tokens) & (F.col("uniq_ratio") >= min_uniq_ratio))
    # fingerprint dedup: one shuffle on the fingerprint, min-id survivor
    fp = kept.withColumn("fp", T.fingerprint(F.col("text")))
    w = Window.partitionBy("fp").orderBy("doc_id")
    survivors = fp.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    budgeted = running_total(
        survivors.select("doc_id", "lang", "ws_tokens"),
        "doc_id",
        F.col("ws_tokens").cast("bigint"),
        "cum_tokens",
    )
    return budgeted.filter(F.col("cum_tokens") <= token_budget).select(
        "doc_id", "lang", F.col("ws_tokens").cast("bigint").alias("ws_tokens"), "cum_tokens"
    )
