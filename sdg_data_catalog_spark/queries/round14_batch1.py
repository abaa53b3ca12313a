"""Round-14 batch 1: production-hash twins for the md5-bound paths, and
snapshot retention promoted to a certified operator.

- ``dq_table_checksum_fast`` / ``dedup_winnowing_fast`` — the two
  heaviest certified ops spend most of their wall on md5 (the
  cross-engine-hash price: 36 of 49 s at 100x for winnowing, ~58 s at
  sf100 for the table fingerprint) because DuckDB has no xxhash64, so
  the oracle-certified paths must hash with md5 on both engines. These
  twins are the plan a 100 TB deployment actually runs: the IDENTICAL
  dataflow (same canonicalization / guards / df-cap / thresholds,
  enforced by sharing the implementation functions, not by copying
  them) with Spark's JVM-native ``xxhash64`` — whole-stage-codegen'd,
  no hex string round-trip, measured ~3-5x cheaper on the hash term.
  Registered rows-only (no DuckDB oracle CAN exist — that's their
  reason to exist); certification instead rides on (a) the md5 twins'
  green hash rows pinning the shared plan and (b) differential tests
  against a pure-Python XXH64 reference that is itself pinned to
  Spark's builtin (tests/test_round14_batch1.py).

- ``catalog_retention_prune`` — closes the versioned-store lifecycle
  (publish -> read_latest -> time-travel -> diff -> rollback ->
  compaction -> RETENTION) the way round-13's compaction closed the
  ANN's: retention as a first-class, certified operation instead of a
  publish side-effect. The census oracle proves LATEST is unaffected,
  the pruned versions are gone, and a replayed publish of a pruned
  version clamps to the live snapshot.

Reference analog: none direct — SURVEY §2.11 north-star surface
(sdg-ai/sdg_data_catalog keeps one mutable SQLite table,
utils/db_connection.py:61-87: no versions, so no retention problem and
no cheap-hash/oracle-hash split; at 100 TB both are existential).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.queries.round13_batch1 import _winnow_pairs
from sdg_data_catalog_spark.sources.atomic import (
    latest_version,
    prune,
    publish,
    read_latest,
)
from sdg_data_catalog_spark.sources.formats import io_dir

_P = 1_000_000_007


def _fast_row_hash(*cols: str):
    """xxhash64 twin of round12_batch2._row_hash: SAME canonicalization
    (coalesce every column to a chr(1) sentinel, '|'-join — so the twin
    and the certified path hash byte-identical input strings and differ
    ONLY in the hash function), then JVM-native xxhash64 reduced
    non-negative mod 1e9+7. No md5, no hex substring, no string->bigint
    conv — the whole expression stays inside whole-stage codegen."""
    joined = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols]
    )
    return (F.pmod(F.xxhash64(joined), F.lit(_P))).cast("decimal(38,0)")


@register("dq_table_checksum_fast")  # no DuckDB xxhash64 -> rows-only twin
def dq_table_checksum_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of ``dq_table_checksum``: identical tables,
    columns, canonicalization, and exact-sum-mod-p reduction — the hash
    is xxhash64 instead of a 32-bit md5 prefix. Use this one to compare
    two SPARK-readable replicas (both sides of a migration, a table
    before/after compaction); use the md5 twin when the other side is a
    different engine that can only meet you at md5. Differential tests
    pin the twin to a pure-Python XXH64 recompute and pin n_rows equal
    to the certified path's; the certified path's green driver row pins
    everything about the shared shape. One scan per table, 1-row
    shuffle, map-side partials — same 100 TB story as the parent."""

    def cksum(df: DataFrame, tbl: str, *cols: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.sum(_fast_row_hash(*cols)) % _P).cast("bigint").alias("checksum"),
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "checksum")

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    lineitem = table(spark, sf_dir, "lineitem")
    return (
        cksum(orders, "orders", "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .unionByName(cksum(customer, "customer", "c_custkey", "c_nationkey", "c_mktsegment"))
        .unionByName(
            cksum(lineitem, "lineitem", "l_orderkey", "l_linenumber", "l_partkey", "l_returnflag")
        )
        .orderBy("tbl")
    )


@register("dedup_winnowing_fast")  # no DuckDB xxhash64 -> rows-only twin
def dedup_winnowing_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production twin of ``dedup_winnowing_pairs``: the same winnowing
    implementation (`_winnow_pairs` — one function, so k/w/cap/threshold
    /guards literally cannot drift) with xxhash64 gram hashes instead of
    md5 prefixes. The winnowing guarantee is hash-agnostic — any shared
    run of >= k+w-1 tokens still shares a fingerprint — but WHICH grams
    the window minima select differs per hash function, so pair sets are
    near- but not bit-identical to the md5 twin; the differential tests
    pin this path to a pure-Python XXH64 winnowing recompute (exact,
    row-for-row) and pin planted-near-dup recall against the md5 twin.
    At 100x the md5 twin spends 36 of 49 s on hashing; this is the rung
    a real 100 TB dedup pass runs."""
    return _winnow_pairs(spark, sf_dir, lambda gram: f"xxhash64({gram})")


@register(
    "catalog_retention_prune",
    oracle="""
    SELECT CAST(4 AS BIGINT) AS n_versions_before,
           CAST(2 AS BIGINT) AS n_versions_after,
           CAST(3 AS BIGINT) AS live_version,
           CAST(1 AS BIGINT) AS replay_clamped,
           CAST(COUNT(*) AS BIGINT) AS n_rows_live,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars_live
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def catalog_retention_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention on the versioned atomic store, end to end: publish four
    snapshots (docs with doc_id % 2/3/5/7 == 0) with a wide retention so
    all four dirs exist, PRUNE to keep=2 (v0 and v1 removed, live v3 and
    v2 retained — prune() additionally guarantees the live version
    survives even when rollback has repointed LATEST below the horizon),
    then REPLAY-publish the pruned v1: the replay clamps to the live
    snapshot dir instead of handing back a dangling path. The surfaced
    census is recomputed by the oracle from the source table, so a green
    hash proves (a) pruning removed exactly the superseded versions,
    (b) LATEST still resolves to v3's exact rows, and (c) the replay
    clamp. At 100 TB unbounded version history IS the storage leak;
    this op is the nightly job that bounds it."""
    root = io_dir(sf_dir, "retention_demo")
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    for v, mod in enumerate((2, 3, 5, 7)):
        publish(docs.filter(F.col("doc_id") % mod == 0), root, v, keep=10)
    import os

    vroot = os.path.join(root, "versions")
    n_before = len(os.listdir(vroot))
    pruned = prune(root, keep=2)
    n_after = len(os.listdir(vroot))
    assert pruned == [0, 1], pruned
    # replay of the pruned v1 must clamp to the live snapshot
    replay_dir = publish(docs.filter(F.col("doc_id") % 3 == 0), root, 1, keep=10)
    live_dir, live_v = latest_version(root)
    clamped = int(os.path.realpath(replay_dir) == os.path.realpath(live_dir))
    return read_latest(spark, root).agg(
        F.lit(n_before).cast("bigint").alias("n_versions_before"),
        F.lit(n_after).cast("bigint").alias("n_versions_after"),
        F.lit(int(live_v)).cast("bigint").alias("live_version"),
        F.lit(clamped).cast("bigint").alias("replay_clamped"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows_live"),
        F.sum("n_chars").cast("bigint").alias("total_chars_live"),
    )
