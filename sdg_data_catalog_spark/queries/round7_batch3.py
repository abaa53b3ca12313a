"""Round-7 batch 3: bitemporal dimensions, ETL reconciliation, and
optimizer-grade statistics.

- ``etl_bitemporal_snapshot`` — the two-axis warehouse question: "what
  did we BELIEVE at transaction time T about the validity history?"
  Later-arriving corrections revise earlier beliefs; the per-wave SCD2
  census makes the revision visible and hash-checkable.
- ``dq_reconcile_rollup`` — source-vs-rollup reconciliation (row counts,
  exact micro-unit value sums, grain check) — the migration/ETL-hop
  validation report every pipeline runs before cutover.
- ``catalog_equiheight_hist`` — equi-height histogram (bucket boundaries
  + per-bucket counts) over a fact column: the statistics a cost-based
  optimizer builds with ANALYZE, computed with the repo's two-phase
  global rank so boundary assignment scales like a sort.

Determinism: counts and micro-unit integer sums throughout; the
histogram rank carries a unique (value-image, pk) key on both engines.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_N_WAVES = 3


@register(
    "etl_bitemporal_snapshot",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             event_id % {_N_WAVES} AS arrival
      FROM events WHERE user_id % 4 = 1
    ),
    waved AS (
      SELECT w.wave, e.*
      FROM (SELECT unnest(range(0, {_N_WAVES})) AS wave) w
      JOIN ev e ON e.arrival <= w.wave
    ),
    ordered AS (
      SELECT wave, user_id, event_type, ts_us, event_id,
             LAG(event_type) OVER (PARTITION BY wave, user_id
                 ORDER BY ts_us, event_id) AS prev_type
      FROM waved
    ),
    changes AS (
      SELECT wave, user_id, event_type AS status, ts_us, event_id
      FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    versions AS (
      SELECT wave, user_id, status,
             LEAD(ts_us) OVER (PARTITION BY wave, user_id
                 ORDER BY ts_us, event_id) IS NULL AS is_open
      FROM changes
    )
    SELECT CAST(wave AS BIGINT) AS wave,
           status,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(SUM(CASE WHEN is_open THEN 1 ELSE 0 END) AS BIGINT)
             AS n_current
    FROM versions GROUP BY wave, status
    """,
)
def etl_bitemporal_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL dimension census: valid time (the event timestamps the
    SCD2 versions span) × transaction time (arrival waves — event_id %
    3 models late-arriving batches). For each wave w the dimension is
    rebuilt AS IT WAS KNOWN after waves 0..w, and the per-(wave, status)
    version census shows belief revision: a late wave interleaves events
    into history, splitting or merging versions retroactively — the
    exact phenomenon bitemporal modeling exists to expose (and the
    reason "what did the dashboard say on Tuesday?" needs the wave axis,
    not just valid time). Plan: one wave×arrival fan-out join (≤3×
    replication, broadcast wave dim), then ONE window pass partitioned
    by (wave, user_id) — the SCD2 compression keyed by both axes — and a
    combinable census. Work scales with waves × events through one
    shuffle; no per-wave recursion, no driver loops."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") % 4 == 1)
    base = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        (F.col("event_id") % _N_WAVES).alias("arrival"),
    )
    waves = spark.range(_N_WAVES).select(F.col("id").alias("wave"))
    waved = base.crossJoin(F.broadcast(waves)).filter(
        F.col("arrival") <= F.col("wave")
    )
    w = Window.partitionBy("wave", "user_id").orderBy("ts_us", "event_id")
    changes = waved.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    wl = Window.partitionBy("wave", "user_id").orderBy("ts_us", "event_id")
    versions = changes.select(
        "wave",
        F.col("event_type").alias("status"),
        F.lead("ts_us").over(wl).isNull().alias("is_open"),
    )
    return versions.groupBy("wave", "status").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.when(F.col("is_open"), 1).otherwise(0)).alias("n_current"),
    )


@register(
    "dq_reconcile_rollup",
    oracle="""
    WITH src AS (
      SELECT event_type,
             COUNT(*) AS src_rows,
             SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS src_value_micro,
             COUNT(DISTINCT epoch_us(ts) // 86400000000) AS src_days
      FROM events GROUP BY event_type
    ),
    rollup AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             COUNT(*) AS n,
             SUM(CAST(FLOOR(value * 1e6) AS BIGINT)) AS value_micro
      FROM events GROUP BY event_type, day
    ),
    tgt AS (
      SELECT event_type,
             SUM(n) AS tgt_rows,
             SUM(value_micro) AS tgt_value_micro,
             COUNT(*) AS tgt_days
      FROM rollup GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(s.src_rows AS BIGINT) AS src_rows,
           CAST(t.tgt_rows AS BIGINT) AS tgt_rows,
           CAST(s.src_value_micro AS BIGINT) AS src_value_micro,
           CAST(t.tgt_value_micro AS BIGINT) AS tgt_value_micro,
           CAST(s.src_days AS BIGINT) AS src_days,
           CAST(t.tgt_days AS BIGINT) AS tgt_days,
           CAST(s.src_rows = t.tgt_rows
                AND s.src_value_micro = t.tgt_value_micro
                AND s.src_days = t.tgt_days AS INTEGER) AS reconciled
    FROM src s JOIN tgt t USING (event_type)
    """,
)
def dq_reconcile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-vs-rollup RECONCILIATION — the validation report an ETL hop
    (or migration cutover) runs before trusting a derived table: per
    reconciliation key, source row counts vs the rollup's re-summed
    counts, value totals vs re-summed value totals, and a grain check
    (distinct source days vs rollup rows). Value totals reconcile as
    EXACT micro-unit integer sums (FLOOR(value·1e6)) — summing raw
    doubles would make "equal" depend on aggregation order, the one
    thing a reconciliation must never do. Here both sides derive from
    the same events table (so `reconciled` proves the MACHINERY and the
    rollup's lossless additivity); in production the two sides are
    different systems and the same report catches drops, dupes, and
    truncation. Shape: two combinable aggregates + one tiny
    per-event-type join — two corpus passes, no window, no shuffle
    beyond the groupBys."""
    _DAY_US = 86_400_000_000
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(_DAY_US)
        ).cast("long").alias("day"),
        F.floor(F.col("value") * 1e6).cast("long").alias("value_micro"),
    )
    src = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("src_rows"),
        F.sum("value_micro").alias("src_value_micro"),
        F.countDistinct("day").alias("src_days"),
    )
    rollup = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_micro").alias("value_micro"),
    )
    tgt = rollup.groupBy("event_type").agg(
        F.sum("n").alias("tgt_rows"),
        F.sum("value_micro").alias("tgt_value_micro"),
        F.count(F.lit(1)).alias("tgt_days"),
    )
    ok = (
        (F.col("src_rows") == F.col("tgt_rows"))
        & (F.col("src_value_micro") == F.col("tgt_value_micro"))
        & (F.col("src_days") == F.col("tgt_days"))
    )
    return src.join(tgt, "event_type").select(
        "event_type",
        "src_rows",
        "tgt_rows",
        "src_value_micro",
        "tgt_value_micro",
        "src_days",
        "tgt_days",
        ok.cast("int").alias("reconciled"),
    )


_HIST_BUCKETS = 8


@register(
    "catalog_equiheight_hist",
    oracle=f"""
    WITH r AS (
      SELECT o_totalprice,
             ROW_NUMBER() OVER (
               ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT),
                        o_orderkey) AS rnk,
             COUNT(*) OVER () AS n
      FROM orders
    ),
    b AS (
      SELECT CAST(((rnk - 1) * {_HIST_BUCKETS}) // n AS BIGINT) AS bucket,
             o_totalprice
      FROM r
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM b GROUP BY bucket
    """,
)
def catalog_equiheight_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-height histogram over o_totalprice — the ANALYZE-grade
    statistic a cost-based optimizer uses for selectivity estimation
    (equi-WIDTH histograms — `agg_histogram` — mislead on skewed money
    columns; equi-height buckets each hold n/8 of the rows, so every
    boundary is a real quantile). Bucket assignment needs each row's
    GLOBAL rank: computed with `operators/curation.py::running_total`
    (range repartition + broadcast prefix offsets — scales like the
    sort it is, never one window task). Both engines rank the exact
    cent-integer image of the price with the orderkey tie-break, so
    bucket membership at the boundaries is pinned — no double ordering
    races. Output: 8 rows of (bucket, count, lo, hi) — the boundary
    table a planner would cache."""
    from sdg_data_catalog_spark.operators.curation import running_total

    orders = table(spark, sf_dir, "orders")
    key = F.format_string(
        "%012d:%012d",
        F.floor(F.col("o_totalprice") * 100).cast("long"),
        F.col("o_orderkey"),
    )
    ranked = running_total(
        orders.select("o_orderkey", "o_totalprice").withColumn("__key", key),
        "__key",
        F.lit(1),
        "rnk",
    )
    n = ranked.count()  # one scalar off the checkpointed rank table
    bucket = F.floor((F.col("rnk") - 1) * _HIST_BUCKETS / F.lit(n)).cast("long")
    return (
        ranked.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )
