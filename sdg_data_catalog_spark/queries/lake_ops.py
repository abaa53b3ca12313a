"""Lake-maintenance batch: dynamic partition overwrite, nested-schema
pruning, and a federated JDBC⋈parquet join.

Three behaviors a 100 TB lake leans on daily that had no registered demo
yet: replacing exactly the partitions a batch touches (the idempotent
daily-reprocess primitive), pruning nested parquet leaves so a struct
table scans only the referenced fields, and joining an external
operational database against lake parquet in one plan. All oracle-backed.

Reference analog: the reference's per-row SQLite INSERT loop
(utils/db_connection.py:68-73) is the anti-pattern the federated join
replaces; the other two have no analog — the reference has no
partitioned or nested storage at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.sources.formats import io_dir


@register(
    "sink_dynamic_overwrite",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(value *
                 CASE WHEN CAST(ts AS DATE) = DATE '2024-01-03'
                      THEN 2.0 ELSE 1.0 END) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def sink_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent daily-reprocess
    primitive: pass 1 writes the full day-partitioned table; pass 2
    reprocesses ONE day (2024-01-03, values doubled) and overwrites in
    `dynamic` mode, which replaces exactly the partitions present in the
    incoming batch and leaves every other day's files untouched (static
    mode would truncate the whole table — the classic data-loss footgun
    this op exists to demonstrate). The oracle recomputes the expected
    final state from the source, so a green row proves both that the
    touched day changed AND that no untouched day was clobbered. At
    100 TB: rewrite cost is proportional to the reprocessed day, not the
    table; readers see whole files only (no in-place mutation)."""
    path = io_dir(sf_dir, "events_dynpart", fresh=False)
    ev = table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_id", "value"
    )
    marker = os.path.join(path, "_PASS2_DONE")
    if not os.path.exists(marker):
        # pass 1: full history
        ev.write.mode("overwrite").partitionBy("day").parquet(path)
        # pass 2: one reprocessed day, dynamic overwrite (writer-scoped
        # option — no session-wide conf mutation)
        batch = ev.filter(F.col("day") == F.lit("2024-01-03").cast("date")).withColumn(
            "value", F.col("value") * 2.0
        )
        (
            batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(path)
        )
        with open(marker, "w") as fh:
            fh.write("ok")
    return (
        spark.read.parquet(path)
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "scan_nested_pruning",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY lang
    """,
)
def scan_nested_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-schema pruning: documents restructured as a two-level struct
    table (meta.lang/meta.source, stats.n_chars/stats.text_copy) and
    written to parquet once; the aggregation then references ONLY
    meta.lang and stats.n_chars, and Spark's nested-schema pruning must
    narrow the parquet ReadSchema to those two leaves — the wide
    `text_copy` payload leaf is never decoded (plan-gated in
    tests/test_lake_ops.py). At 100 TB nested event/media tables live or
    die by this: without leaf pruning every struct query pays the full
    payload column scan."""
    path = io_dir(sf_dir, "docs_nested", fresh=False)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        docs = table(spark, sf_dir, "documents")
        nested = docs.select(
            "doc_id",
            F.struct(F.col("lang"), F.col("source")).alias("meta"),
            F.struct(
                F.col("n_chars"), F.col("text").alias("text_copy")
            ).alias("stats"),
        )
        nested.write.mode("overwrite").parquet(path)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("meta.lang").alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("stats.n_chars").alias("total_chars"),
        )
    )


@register(
    "join_federated",
    oracle="""
    SELECT c_mktsegment,
           n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(c_acctbal) AS DOUBLE), 2) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > 1000
    GROUP BY c_mktsegment, n_name
    """,
)
def join_federated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated join: the customer table served from an external JDBC
    database (embedded Derby — the same seeded instance scan_jdbc uses)
    joined against the lake's nation parquet in ONE Spark plan. The
    acctbal predicate pushes into the remote SQL (JDBCRelation
    PushedFilters), the key-range partitioning fans the ingest across 8
    executor-side connections, and the tiny nation dim broadcasts — the
    operational-DB-enrichment shape every warehouse migration starts
    with. Oracle joins the original parquet tables: federation must be
    value-lossless."""
    from sdg_data_catalog_spark.sources import jdbc as J
    from sdg_data_catalog_spark.sources.formats import io_dir as _iod

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal", "c_nationkey"
    )
    db_dir = _iod(sf_dir, "jdbc_derby_fed", fresh=False)
    J.seed_jdbc_table(spark, cust, db_dir, "customer_fed")
    lo, hi = cust.agg(F.min("c_custkey"), F.max("c_custkey")).collect()[0]
    remote = J.read_jdbc_partitioned(
        spark, db_dir, "customer_fed", "c_custkey", int(lo), int(hi), num_partitions=8
    )
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        remote.filter(F.col("c_acctbal") > 1000)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register("diag_rowgroup_stats")  # path-dependent metadata: rows-only, DuckDB twin
def diag_rowgroup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet row-group statistics surfaced as a table — the metadata
    that predicate pushdown skipping actually runs on. A 100 TB scan's
    cost is decided by whether these min/max ranges let row groups be
    skipped (tight, sorted ranges = cheap time-slice queries; this diag
    quantifies layout health the way diag_partition_skew quantifies key
    balance — and is what sink_range_clustered/sink_zorder_clustered
    exist to improve). Footers are read EXECUTOR-SIDE via pyarrow inside
    mapInPandas (one task per file — only statistics cross the wire,
    never data pages). Rows-only in the driver gate (the oracle views
    can't reference file paths); the pytest twin compares against
    DuckDB's parquet_metadata() on the same file — both engines must
    report identical footer contents."""
    import pandas as _pd

    path = os.path.join(sf_dir, "lineitem.parquet")
    files = spark.createDataFrame([(path,)], "path string")

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                names = md.schema.names
                ci = names.index("l_shipdate")
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(ci)
                    st = col.statistics
                    out.append(
                        (rg, md.row_group(rg).num_rows, st.min, st.max)
                    )
            yield _pd.DataFrame(
                out,
                columns=["row_group_id", "n_rows", "min_shipdate", "max_shipdate"],
            )

    return files.mapInPandas(
        read_footers,
        "row_group_id int, n_rows bigint, "
        "min_shipdate timestamp_ntz, max_shipdate timestamp_ntz",
    )
