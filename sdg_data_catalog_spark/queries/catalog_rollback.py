"""Catalog rollback + sketch-merged rolling distinct counts — the last
two pieces of the versioned-catalog and mergeable-sketch stories.

`catalog_rollback` completes the snapshot lifecycle this engine ships
(publish → read_latest → time-travel → diff → ROLLBACK): the bad-deploy
undo, an atomic pointer flip back to the previous retained version.
`sketch_rolling_wau` re-answers `agg_rolling_active_users`' question the
way a 100 TB deployment actually does: one immutable HLL sketch per day,
trailing windows answered by UNIONING seven tiny sketches instead of
re-scanning seven days of raw events — the mergeable-sketch-table
pattern (sketches_curation.py) applied to a rolling window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.sources.atomic import publish, read_latest, rollback
from sdg_data_catalog_spark.sources.formats import io_dir


@register(
    "catalog_rollback",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(0 AS BIGINT) AS live_version
    FROM documents WHERE doc_id % 2 = 0
    """,
)
def catalog_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish v0 and v1, then ROLL BACK: LATEST atomically repoints to
    v0 (tmp-file + rename, crash-safe like the forward flip; the v1 data
    dir survives for inspection/re-promotion). The returned stats are
    computed by reading the LIVE snapshot after rollback, and the oracle
    recomputes v0's stats from the source table — a green row proves the
    pointer really moved back and readers really see v0 again. The
    bad-deploy undo every versioned 100 TB catalog owes its operators;
    `scan_time_travel` reads history, this CHANGES what new readers
    get."""
    root = io_dir(sf_dir, "rollback_demo")
    docs = table(spark, sf_dir, "documents")
    publish(docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars"), root, 0)
    publish(docs.filter(F.col("doc_id") % 3 == 0).select("doc_id", "n_chars"), root, 1)
    _, live = rollback(root)
    return read_latest(spark, root).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("total_chars"),
        F.lit(int(live)).cast("long").alias("live_version"),
    )


@register(
    "sketch_rolling_wau",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    mx AS (SELECT MAX(d) AS m FROM du),
    ex AS (
      SELECT d + CAST(o AS INTEGER) AS report_day, user_id
      FROM du, range(7) t(o)
    )
    SELECT strftime(report_day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_exact,
           TRUE AS hll_in_bound
    FROM ex, mx
    WHERE report_day <= mx.m
    GROUP BY report_day
    """,
)
def sketch_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users from MERGEABLE per-day HLL sketches:
    one `hll_sketch_agg` per calendar day (30 tiny binaries, built in
    one map-side-combined pass), each day's sketch volunteering into the
    7 windows it supports, and `hll_union_agg` folding each window's 7
    sketches into an estimate — the raw events are scanned ONCE no
    matter how many windows are asked, which is why sketch tables, not
    re-scans, answer rolling distincts at 100 TB. Oracle pattern of
    sketches_curation.py: the EXACT count (cross-checked by DuckDB) plus
    a boolean asserting the HLL estimate landed within its published 5%
    bound — drift flips the boolean and fails the value hash, so the
    sketch path is verified end-to-end."""
    ev = table(spark, sf_dir, "events")
    # ~30 rows (one sketch per day); feeds the max-day scalar and the
    # window fold, and the max-day scalar is cross-joined on BOTH the
    # sketch and exact sides — one events pass for the sketch table, not
    # three (audited 4 events scans; the exact-count side below is the
    # deliberate second pass that cross-checks the sketch)
    daily = (
        ev.select(F.to_date("ts").alias("d"), "user_id")
        .groupBy("d")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .localCheckpoint(eager=True)
    )
    mx = daily.agg(F.max("d").alias("m"))
    windows = (
        daily.select(
            "sk",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "d",
        )
        .select(F.date_add("d", F.col("o")).alias("report_day"), "sk")
        .crossJoin(mx)
        .filter(F.col("report_day") <= F.col("m"))
        .groupBy("report_day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("wau_hll")
        )
    )
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    exact = (
        du.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "d",
        )
        .select(F.date_add("d", F.col("o")).alias("report_day"), "user_id")
        .crossJoin(mx)
        .filter(F.col("report_day") <= F.col("m"))
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").alias("wau_exact"))
    )
    return exact.join(windows, "report_day").select(
        F.date_format("report_day", "yyyy-MM-dd").alias("day"),
        "wau_exact",
        (
            F.abs(F.col("wau_hll") - F.col("wau_exact"))
            <= 0.05 * F.col("wau_exact")
        ).alias("hll_in_bound"),
    )
