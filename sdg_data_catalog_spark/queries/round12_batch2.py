"""Round-12 batch 2: storage-layer observability, clustering quality,
time-series resampling, and cross-engine table fingerprints.

- ``catalog_footer_stats`` — parquet FOOTER metadata (per-partition row
  counts and column min/max read with pyarrow, no data pages touched)
  certified against the data itself: the contract that makes min/max
  zone pruning trustworthy. Footer reads run distributed (one task per
  file via mapInPandas over a bounded file list) — the shape a 100-TB
  manifest audit needs, since footers are KB-sized regardless of file
  size.
- ``eval_bcubed_pairs`` — the B³ clustering-quality decomposition
  (Bagga & Baldwin 1998) of the deployed IVF cell assignment against
  the gold labels: per (label, cell) the intersection/cluster/class
  counts and the per-item precision/recall contributions. All counts
  exact integers; each ratio a single per-row division (no cross-row
  float sums — the aggregate B³ is a client-side fold over this bounded
  table, computed in the tests).
- ``ts_resample_linear`` — per-type hourly resampling by LINEAR
  interpolation between neighboring observations (the locf twin's other
  half): one union + two IGNORE NULLS windows per series, never a
  per-grid-point scan.
- ``dq_table_checksum`` — order-invariant cross-engine table
  fingerprint: SUM over rows of a null-safe 32-bit md5 prefix of the
  canonicalized key columns, reduced mod 1e9+7 to a BIGINT (exact
  DECIMAL(38,0) carrier internally). The replication / migration
  validation primitive: two engines (or two copies) holding the same
  rows produce the same checksum regardless of row order or
  partitioning.

Reference analog: none direct — SURVEY §2.11 north-star surface
(storage audit, cluster eval, resample, reconciliation).
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_FOOTER_VERSION = "v1"


def _footer_layout_dir(sf_dir: str) -> str:
    from sdg_data_catalog_spark.queries.scale_ops import _SCRATCH, _sf_name

    return os.path.join(_SCRATCH, _sf_name(sf_dir), "orders_by_priority")


def _ensure_footer_layout(spark: SparkSession, sf_dir: str) -> str:
    """One-time partitioned copy of orders (partitionBy o_orderpriority,
    one task per priority so each partition holds one file) — the
    ingest-time layout the footer audit runs over."""
    out = _footer_layout_dir(sf_dir)
    marker = os.path.join(out, f"_FOOTER_LAYOUT_{_FOOTER_VERSION}")
    if os.path.isfile(marker):
        return out
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    orders = table(spark, sf_dir, "orders")
    (
        orders.repartition("o_orderpriority")
        .write.partitionBy("o_orderpriority")
        .mode("overwrite")
        .parquet(out)
    )
    with open(marker, "w") as fh:
        fh.write(_FOOTER_VERSION)
    return out


@register(
    "catalog_footer_stats",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def catalog_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map audit: per partition of the priority-partitioned orders
    layout, row count and o_totalprice min/max read from PARQUET FOOTER
    STATISTICS ONLY (pyarrow metadata — zero data pages), hash-checked
    against the engine recomputing the same stats from the data. Green
    means the footers a planner prunes on are faithful. The file list is
    bounded (one per partition value) and enumerated driver-side; the
    footer reads themselves run as a distributed map (footers are
    KB-sized, so this audits a 100-TB lake at manifest cost)."""
    import glob

    out = _ensure_footer_layout(spark, sf_dir)
    files = []
    for d in sorted(glob.glob(os.path.join(out, "o_orderpriority=*"))):
        prio = os.path.basename(d).split("=", 1)[1]
        for p in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            files.append((prio, p))
    if not files:
        raise ValueError(f"no parquet files under {out}")
    paths = spark.createDataFrame(files, "priority string, path string").repartition(
        min(len(files), 32)
    )

    def _footers(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for prio, path in zip(pdf["priority"], pdf["path"]):
                md = pq.ParquetFile(path).metadata
                names = md.schema.names
                ci = names.index("o_totalprice")
                lo, hi, n = None, None, 0
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(f"footer stats missing in {path}")
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                    n += md.row_group(rg).num_rows
                rows.append((prio, n, lo, hi))
            yield pd.DataFrame(
                rows, columns=["priority", "n_rows", "min_price", "max_price"]
            )

    per_file = paths.mapInPandas(
        _footers, "priority string, n_rows long, min_price double, max_price double"
    )
    return (
        per_file.groupBy("priority")
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.round(F.min("min_price"), 2).alias("min_price"),
            F.round(F.max("max_price"), 2).alias("max_price"),
        )
        .orderBy("priority")
    )


@register(
    "eval_bcubed_pairs",
    oracle="""
    WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS raw
                FROM embeddings),
    en AS (SELECT vec_id, raw,
                  sqrt(list_sum(list_transform(raw, y -> y*y))) AS nrm
           FROM e0),
    e AS (SELECT vec_id, list_transform(raw, x -> x / nrm) AS emb FROM en),
    cents AS (SELECT vec_id AS cell_id, emb AS cent FROM e WHERE vec_id < 16),
    dist AS (
      SELECT e.vec_id, c.cell_id,
             list_sum(list_transform(range(1, 65),
               i -> (e.emb[i] - c.cent[i]) * (e.emb[i] - c.cent[i]))) AS d2
      FROM e CROSS JOIN cents c
    ),
    assigned AS (
      SELECT vec_id, cell_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY d2 ASC, cell_id ASC) AS rn
        FROM dist) WHERE rn = 1
    ),
    al AS (
      SELECT a.vec_id, a.cell_id, b.label
      FROM assigned a JOIN embeddings b ON a.vec_id = b.vec_id
    ),
    cl AS (SELECT cell_id, label, CAST(COUNT(*) AS BIGINT) AS n_cl
           FROM al GROUP BY 1, 2),
    c AS (SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_c FROM al GROUP BY 1),
    l AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_l FROM al GROUP BY 1)
    SELECT cl.label, cl.cell_id, cl.n_cl, c.n_c, l.n_l,
           ROUND(CAST(cl.n_cl AS DOUBLE) / c.n_c, 6) AS precision_i,
           ROUND(CAST(cl.n_cl AS DOUBLE) / l.n_l, 6) AS recall_i
    FROM cl JOIN c ON cl.cell_id = c.cell_id
    JOIN l ON cl.label = l.label
    ORDER BY cl.label, cl.cell_id
    """,
)
def eval_bcubed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B³ decomposition of the deployed IVF clustering against gold
    labels: for every (label, cell) intersection, the exact counts and
    the per-item precision = n_cl/n_c and recall = n_cl/n_l every item
    of that intersection contributes (Bagga & Baldwin 1998). The
    corpus-level B³ P/R/F1 is Σ n_cl·contribution / N — a fold over
    this |labels|×|cells|-bounded table, done client-side (tests) so no
    cross-row float sum enters the hash-checked surface. Assignment is
    the same broadcast-centroid map pass the ANN ladder deploys —
    clustering eval costs one corpus scan plus vocabulary-sized
    aggregates at any scale."""
    from sdg_data_catalog_spark.operators import similarity as sim
    from sdg_data_catalog_spark.queries.ann_pq import N_CELLS, _normalized

    emb = table(spark, sf_dir, "embeddings")
    assigned = sim.ivf_assign(_normalized(spark, sf_dir), N_CELLS).select(
        "vec_id", "cell_id"
    )
    al = assigned.join(emb.select("vec_id", "label"), "vec_id").localCheckpoint(
        eager=False
    )  # one corpus-sized relation consumed by three bounded aggregates
    cl = al.groupBy("cell_id", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cl")
    )
    c = al.groupBy("cell_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_c"))
    lt = al.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n_l"))
    return (
        cl.join(F.broadcast(c), "cell_id")
        .join(F.broadcast(lt), "label")
        .select(
            "label",
            "cell_id",
            "n_cl",
            "n_c",
            "n_l",
            F.round(F.col("n_cl").cast("double") / F.col("n_c"), 6).alias(
                "precision_i"
            ),
            F.round(F.col("n_cl").cast("double") / F.col("n_l"), 6).alias("recall_i"),
        )
        .orderBy("label", "cell_id")
    )


_HOUR_US = 3_600_000_000


@register(
    "ts_resample_linear",
    oracle=f"""
    WITH obs0 AS (
      SELECT event_type, epoch_us(ts) AS ts_us, value, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_type, epoch_us(ts)
                                ORDER BY event_id) AS rn
      FROM events
    ),
    obs AS (SELECT event_type, ts_us, value FROM obs0 WHERE rn = 1),
    bounds AS (
      SELECT event_type,
             CAST(ceil(CAST(MIN(ts_us) AS DOUBLE) / {_HOUR_US}) AS BIGINT) AS h0,
             MAX(ts_us) // {_HOUR_US} AS h1
      FROM obs GROUP BY 1
    ),
    grid AS (
      SELECT b.event_type, g.h * {_HOUR_US} AS ts_us
      FROM bounds b, unnest(range(b.h0, b.h1 + 1)) AS g(h)
    ),
    u AS (
      SELECT event_type, ts_us, value, 0 AS kind FROM obs
      UNION ALL
      SELECT event_type, ts_us, NULL AS value, 1 AS kind FROM grid
    ),
    w AS (
      SELECT event_type, ts_us, kind,
             LAST_VALUE(value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY ts_us, kind
               ROWS UNBOUNDED PRECEDING) AS v_prev,
             LAST_VALUE(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY ts_us, kind
               ROWS UNBOUNDED PRECEDING) AS t_prev,
             FIRST_VALUE(value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY ts_us, kind
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_next,
             FIRST_VALUE(CASE WHEN kind = 0 THEN ts_us END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY ts_us, kind
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t_next
      FROM u
    )
    SELECT event_type, ts_us AS grid_ts_us,
           ROUND(CASE WHEN t_next = t_prev THEN v_prev
                 ELSE v_prev + (v_next - v_prev)
                      * (CAST(ts_us - t_prev AS DOUBLE) / (t_next - t_prev))
                 END, 6) AS value_interp
    FROM w
    WHERE kind = 1 AND t_prev IS NOT NULL AND t_next IS NOT NULL
    ORDER BY event_type, grid_ts_us
    """,
)
def ts_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resampling by linear interpolation, per event_type: the
    other half of ts_resample_locf. Duplicate-timestamp observations
    dedupe deterministically (first event_id wins), the per-type hourly
    grid unions with the observations, and two IGNORE NULLS running
    windows attach the straddling neighbors to every grid point — one
    sort per series regardless of grid density, never a per-grid-point
    probe. The interpolation is a single identical double expression
    over exact integer timestamps, so both engines agree bitwise.
    Obs-exactly-on-grid collapses to the observation (t_next = t_prev
    guard). At 100 TB each series windows independently —
    partitionBy(event_type) parallelism with no cross-series state."""
    ev = table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    obs0 = ev.select(
        "event_type", ts_us.alias("ts_us"), "value", "event_id"
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type", "ts_us").orderBy("event_id")
        ),
    )
    obs = obs0.filter(F.col("rn") == 1).select("event_type", "ts_us", "value")
    bounds = obs.groupBy("event_type").agg(
        F.ceil(F.min("ts_us").cast("double") / F.lit(_HOUR_US))
        .cast("bigint")
        .alias("h0"),
        (F.max("ts_us") / F.lit(_HOUR_US)).cast("bigint").alias("h1"),
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
    ).select("event_type", (F.col("h") * _HOUR_US).alias("ts_us"))
    u = obs.withColumn("kind", F.lit(0)).unionByName(
        grid.withColumn("value", F.lit(None).cast("double")).withColumn(
            "kind", F.lit(1)
        )
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next neighbor" as a RUNNING frame over the REVERSED order — the
    # (currentRow, unboundedFollowing) frame is O(n²) in Spark (the
    # UnboundedFollowing frame rescans to partition end per row; measured
    # 72 s vs 4 s on the 100x replica), while a running frame is
    # incremental. Reverse order (ts DESC, kind DESC) puts the grid row
    # (kind=1) BEFORE a same-ts observation (kind=0), so the running last
    # still excludes an equal-ts observation from "next" — identical
    # semantics to the oracle's FIRST_VALUE ... FOLLOWING frame.
    bwd = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts_us").desc(), F.col("kind").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_ts = F.when(F.col("kind") == 0, F.col("ts_us"))
    w = u.select(
        "event_type",
        "ts_us",
        "kind",
        F.last("value", ignorenulls=True).over(fwd).alias("v_prev"),
        F.last(obs_ts, ignorenulls=True).over(fwd).alias("t_prev"),
        F.last("value", ignorenulls=True).over(bwd).alias("v_next"),
        F.last(obs_ts, ignorenulls=True).over(bwd).alias("t_next"),
    )
    interp = F.when(F.col("t_next") == F.col("t_prev"), F.col("v_prev")).otherwise(
        F.col("v_prev")
        + (F.col("v_next") - F.col("v_prev"))
        * (
            (F.col("ts_us") - F.col("t_prev")).cast("double")
            / (F.col("t_next") - F.col("t_prev"))
        )
    )
    return (
        w.filter(
            (F.col("kind") == 1)
            & F.col("t_prev").isNotNull()
            & F.col("t_next").isNotNull()
        )
        .select(
            "event_type",
            F.col("ts_us").alias("grid_ts_us"),
            F.round(interp, 6).alias("value_interp"),
        )
        .orderBy("event_type", "grid_ts_us")
    )


def _row_hash(*cols: str):
    """Per-row 32-bit md5 prefix of the '|'-joined canonicalized columns,
    reduced mod 1e9+7 — the exact idiom of the driver-certified
    ``sample_balanced_downsample`` checksum (round10_batch18.py). Two
    hardenings over the round-12 original (its driver row was the first
    red ever recorded): (a) NULL-SAFE and byte-identical across engines —
    every column is ``coalesce(cast(col as string), chr(1))`` on BOTH
    sides, so Spark's null-skipping ``concat_ws`` and DuckDB's
    null-propagating ``||`` can never diverge (neither ever sees a NULL,
    and chr(1) cannot collide with real column text); (b) the value is a
    plain BIGINT < 1e9, never a DECIMAL — intermediate sums are carried
    in DECIMAL(38,0) for exactness but the surfaced checksum is reduced
    back to BIGINT, eliminating every decimal-representation hazard in
    pandas/Arrow canonicalization paths (DuckDB renders wide decimals as
    float64 in ``.df()``; Spark surfaces Decimal objects)."""
    joined = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\x01")) for c in cols]
    )
    return (
        F.conv(F.substring(F.md5(joined), 1, 8), 16, 10).cast("bigint")
        % 1_000_000_007
    ).cast("decimal(38,0)")


@register(
    "dq_table_checksum",
    oracle="""
    WITH o AS (
      SELECT CAST('orders' AS VARCHAR) AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(CAST(('0x' || substr(md5(
               coalesce(CAST(o_orderkey AS VARCHAR), chr(1)) || '|' ||
               coalesce(CAST(o_custkey AS VARCHAR), chr(1)) || '|' ||
               coalesce(o_orderstatus, chr(1)) || '|' ||
               coalesce(o_orderpriority, chr(1))), 1, 8))
               AS BIGINT) % 1000000007 AS DECIMAL(38,0)))
               % 1000000007 AS BIGINT) AS checksum
      FROM orders
    ),
    c AS (
      SELECT CAST('customer' AS VARCHAR) AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(CAST(('0x' || substr(md5(
               coalesce(CAST(c_custkey AS VARCHAR), chr(1)) || '|' ||
               coalesce(CAST(c_nationkey AS VARCHAR), chr(1)) || '|' ||
               coalesce(c_mktsegment, chr(1))), 1, 8))
               AS BIGINT) % 1000000007 AS DECIMAL(38,0)))
               % 1000000007 AS BIGINT) AS checksum
      FROM customer
    ),
    l AS (
      SELECT CAST('lineitem' AS VARCHAR) AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(CAST(('0x' || substr(md5(
               coalesce(CAST(l_orderkey AS VARCHAR), chr(1)) || '|' ||
               coalesce(CAST(l_linenumber AS VARCHAR), chr(1)) || '|' ||
               coalesce(CAST(l_partkey AS VARCHAR), chr(1)) || '|' ||
               coalesce(l_returnflag, chr(1))), 1, 8))
               AS BIGINT) % 1000000007 AS DECIMAL(38,0)))
               % 1000000007 AS BIGINT) AS checksum
      FROM lineitem
    )
    SELECT * FROM o UNION ALL SELECT * FROM c UNION ALL SELECT * FROM l
    ORDER BY tbl
    """,
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-invariant table fingerprints for replication / migration
    validation: per table, row count plus a SUM (exact, carried in
    DECIMAL(38,0)) of a null-safe 32-bit md5 row hash reduced mod 1e9+7,
    surfaced as BIGINT. Any dropped, duplicated, or mutated row moves
    the sum; row order and partitioning cannot (addition commutes mod p,
    and the decimal carrier never overflows below ~1e29 rows). This op's
    green hash IS the cross-engine reconciliation demo: Spark and DuckDB
    computing the same fingerprint from independent scans. Map-side
    partial aggregation means one scan per table and a 1-row shuffle at
    any scale. NULL handling is explicit: every column is coalesced to a
    chr(1) sentinel on BOTH engines before concatenation, so a NULL key
    column changes the checksum identically everywhere rather than
    silently dropping the row on the ||-propagating engine (the round-12
    red-row lesson)."""

    def cksum(df: DataFrame, tbl: str, *cols: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (F.sum(_row_hash(*cols)) % 1_000_000_007)
            .cast("bigint")
            .alias("checksum"),
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


@register(
    "pipeline_pretrain_manifest",
    oracle="""
    WITH base AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS ws_tokens,
             len(list_distinct(string_split(text, ' '))) * 1.0
                 / len(string_split(text, ' ')) AS uniq_ratio,
             md5(array_to_string(
                 list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
      FROM documents
    ),
    s1 AS (SELECT * FROM base WHERE ws_tokens >= 20 AND uniq_ratio >= 0.2),
    s2 AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM s1) WHERE rn = 1
    ),
    ev AS (
      SELECT DISTINCT unnest(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS esh
      FROM (SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id % 97 = 0)
      WHERE len(t) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS t
            FROM s2 WHERE doc_id % 97 <> 0)
      WHERE len(t) >= 3
    ),
    contaminated AS (SELECT DISTINCT sh.doc_id FROM sh JOIN ev ON sh.sh = ev.esh),
    s3 AS (
      SELECT * FROM s2
      WHERE doc_id % 97 <> 0
        AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    s4 AS (
      SELECT * FROM (
        SELECT doc_id, ws_tokens,
               SUM(ws_tokens) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM s3) WHERE cum <= 200000
    )
    SELECT * FROM (
      SELECT 0 AS stage_id, 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(ws_tokens) AS BIGINT) AS n_tokens FROM base
      UNION ALL
      SELECT 1, 'quality', CAST(COUNT(*) AS BIGINT), CAST(SUM(ws_tokens) AS BIGINT)
      FROM s1
      UNION ALL
      SELECT 2, 'dedup_exact', CAST(COUNT(*) AS BIGINT), CAST(SUM(ws_tokens) AS BIGINT)
      FROM s2
      UNION ALL
      SELECT 3, 'decontaminate', CAST(COUNT(*) AS BIGINT), CAST(SUM(ws_tokens) AS BIGINT)
      FROM s3
      UNION ALL
      SELECT 4, 'token_budget', CAST(COUNT(*) AS BIGINT), CAST(SUM(ws_tokens) AS BIGINT)
      FROM s4
    ) ORDER BY stage_id
    """,
)
def pipeline_pretrain_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel report a pretraining-data run ships with: per stage of
    the full curation chain — raw → quality gate → exact-fingerprint
    dedup → decontamination against the eval split → token-budget cut —
    the surviving doc count and token total. Every stage reuses the
    exact semantics of its certified standalone operator (quality =
    operators/curation.curate's gate, dedup = the fingerprint min-id
    survivor, decontamination = dedup_decontaminate's 3-shingle
    semi-join with eval = doc_id % 97, budget = the two-phase scalable
    running sum), so the manifest certifies the COMPOSITION end to end.
    Plan shape: one pass computes per-doc flags for stages 0-3 into a
    checkpointed (doc_id, ws_tokens, flags) relation — no text column
    retained — consumed by one conditional aggregate; the shingle
    contamination join and the budget range-shuffle are the only other
    corpus-scale work. At 100 TB each stage is exactly the standalone
    operator's cost; nothing here is quadratic or driver-bound."""
    from sdg_data_catalog_spark.functions import text as T
    from sdg_data_catalog_spark.operators.curation import running_total

    docs = table(spark, sf_dir, "documents")
    q = T.quality_features(F.col("text"))
    base = docs.select(
        "doc_id",
        "text",
        q["n_tokens"].cast("bigint").alias("ws_tokens"),
        q["uniq_token_ratio"].alias("uniq_ratio"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    q_ok = (F.col("ws_tokens") >= 20) & (F.col("uniq_ratio") >= 0.2)
    flagged = base.withColumn("q_ok", q_ok)
    # dedup among quality survivors only: q_ok rows sort first in each fp
    # group, so rn==1 ∧ q_ok ⇔ min-doc_id quality survivor of the group
    wfp = Window.partitionBy("fp").orderBy(F.col("q_ok").desc(), F.col("doc_id"))
    # r15 (guide §5.2, measured): persist the windowed relation — it is
    # consumed TWICE (the candidate-shingle branch and the final flags
    # join), and without the persist the whole scan → quality features →
    # per-doc fingerprint sort+md5 → fp exchange → window subtree
    # executed twice inside the one eager-checkpoint job (ReuseExchange
    # shares only the exchange, not the window sort above it). In-query
    # multi-pass reuse, inside the timed region.
    from pyspark import StorageLevel

    flagged = flagged.withColumn(
        "s2", F.col("q_ok") & (F.row_number().over(wfp) == 1)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    shingle = lambda t: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.size(t) - 3),
        lambda i: F.concat_ws(
            " ", F.element_at(t, i + 1), F.element_at(t, i + 2), F.element_at(t, i + 3)
        ),
    )
    toks = F.split(F.col("text"), " ")
    # the >=3-token guard must run BEFORE the explode: for shorter docs
    # F.sequence(0, size-3) descends and element_at(t, 0) raises (array
    # indices start at 1) — mirrors the oracle's WHERE len(t) >= 3
    ev_sh = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .filter(F.size(toks) >= 3)
        .select(F.explode(shingle(toks)).alias("esh"))
        .distinct()
    )
    cand_sh = (
        flagged.filter(F.col("s2") & (F.col("doc_id") % 97 != 0))
        .filter(F.size(toks) >= 3)
        .select("doc_id", F.explode(shingle(toks)).alias("sh"))
        .distinct()
    )
    contaminated = cand_sh.join(ev_sh, cand_sh["sh"] == ev_sh["esh"]).select(
        "doc_id"
    ).distinct()
    flags = (
        flagged.join(
            contaminated.withColumn("contam", F.lit(True)), "doc_id", "left"
        )
        .select(
            "doc_id",
            "ws_tokens",
            "q_ok",
            "s2",
            (
                F.col("s2")
                & (F.col("doc_id") % 97 != 0)
                & F.col("contam").isNull()
            ).alias("s3"),
        )
        .localCheckpoint(eager=True)  # (doc_id, ws_tokens, 3 bools) — no text
    )

    def stage(sid: int, name: str, cond) -> DataFrame:
        return flags.agg(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias("n_docs"),
            F.sum(F.when(cond, F.col("ws_tokens")).otherwise(0))
            .cast("bigint")
            .alias("n_tokens"),
        ).select(
            F.lit(sid).cast("int").alias("stage_id"),
            F.lit(name).alias("stage"),
            "n_docs",
            "n_tokens",
        )

    s4 = running_total(
        flags.filter(F.col("s3")).select("doc_id", "ws_tokens"),
        "doc_id",
        F.col("ws_tokens").cast("bigint"),
        "cum",
    ).filter(F.col("cum") <= 200_000)
    s4_row = s4.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.coalesce(F.sum("ws_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
    ).select(
        F.lit(4).cast("int").alias("stage_id"),
        F.lit("token_budget").alias("stage"),
        "n_docs",
        "n_tokens",
    )
    return (
        stage(0, "raw", F.lit(True))
        .unionByName(stage(1, "quality", F.col("q_ok")))
        .unionByName(stage(2, "dedup_exact", F.col("s2")))
        .unionByName(stage(3, "decontaminate", F.col("s3")))
        .unionByName(s4_row)
        .orderBy("stage_id")
    )


@register(
    "feat_target_encode",
    oracle="""
    WITH g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos_all
      FROM orders
    ),
    c AS (
      SELECT o_orderpriority AS category,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos
      FROM orders GROUP BY 1
    )
    SELECT c.category, c.n, c.n_pos,
           ROUND(CAST(c.n_pos AS DOUBLE) / c.n, 6) AS raw_rate,
           ROUND((c.n_pos + 10.0 * (CAST(g.pos_all AS DOUBLE) / g.n_all))
                 / (c.n + 10), 6) AS encoded
    FROM c CROSS JOIN g
    ORDER BY c.category
    """,
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding (the classic categorical feature for
    tabular models; Micci-Barreca 2001): per category the raw target
    rate and the m-estimate shrunk toward the global prior,
    enc = (n_pos + m·prior) / (n + m) with m=10 — rare categories pull
    to the prior, frequent ones keep their rate. All counts exact
    integers aggregated map-side (one scan, |categories|-row result);
    the encode is scalar arithmetic on those counts, so both engines
    agree bitwise. At 100 TB this is one partial-aggregated groupBy
    plus a 1-row broadcast — the cheapest feature in the book, which is
    why it's in every tabular pipeline."""
    orders = table(spark, sf_dir, "orders")
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    g = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(pos).cast("bigint").alias("pos_all"),
    )
    c = orders.groupBy(F.col("o_orderpriority").alias("category")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(pos).cast("bigint").alias("n_pos"),
    )
    return (
        c.crossJoin(F.broadcast(g))  # 1-row global prior attachment
        .select(
            "category",
            "n",
            "n_pos",
            F.round(F.col("n_pos").cast("double") / F.col("n"), 6).alias("raw_rate"),
            F.round(
                (
                    F.col("n_pos")
                    + 10.0 * (F.col("pos_all").cast("double") / F.col("n_all"))
                )
                / (F.col("n") + 10),
                6,
            ).alias("encoded"),
        )
        .orderBy("category")
    )
