"""JDBC external-database ingest (SURVEY §2.1 'true external-DB scan').

The reference catalogs everything in SQLite through a driver-side
connection loop (sdg-ai/sdg_data_catalog utils/db_connection.py:12-32 —
one process, one cursor, row-at-a-time). The Spark-native shape is
``spark.read.jdbc`` with a partition column: the planner splits the key
range into N predicates (``WHERE key BETWEEN lo_i AND hi_i``) and each
EXECUTOR opens its own connection and pulls its slice in parallel —
ingest bandwidth scales with the cluster, and filters/projections push
into the remote database as SQL.

No sqlite-jdbc jar ships in this container, but Apache Derby (a real
embeddable SQL database) ships with Spark itself, so the path is
exercised end-to-end against an actual JDBC database: seed once via
``DataFrameWriter.jdbc``, read back partitioned via ``spark.read.jdbc``.
Embedded Derby is single-JVM (fine under local[*] where executors share
the JVM); a cluster deployment uses the Derby network server / any
client-server JDBC URL — same reader code, different URL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str, create: bool = False) -> str:
    url = f"jdbc:derby:{db_dir}/db"
    return url + ";create=true" if create else url


def _quiet_derby(spark: SparkSession, home: str) -> None:
    """Point derby.log at a STABLE scratch dir instead of the caller's cwd.

    Set once per JVM and never changed: the embedded engine snapshots
    derby.system.home at boot, and flipping it between databases leaves the
    service-properties lookup half-initialized (manifests as an NPE in
    RawStore.boot when a second database starts). Database paths in our
    URLs are absolute, so the home only controls derby.log placement."""
    try:
        jsys = spark._jvm.java.lang.System
        if jsys.getProperty("derby.system.home") is None:
            import os as _os

            stable = _os.path.join(_os.path.dirname(home.rstrip("/")), "derby_home")
            _os.makedirs(stable, exist_ok=True)
            jsys.setProperty("derby.system.home", stable)
    except Exception:  # noqa: BLE001 — cosmetic only
        pass


def seed_jdbc_table(
    spark: SparkSession, df: DataFrame, db_dir: str, table: str
) -> None:
    """Create-or-replace one table in the embedded Derby DB from a
    DataFrame (idempotent via a marker file — layout cost paid once per
    scale factor, like the bucketed tables)."""
    marker = os.path.join(db_dir, f"_SEEDED_{table}")
    if os.path.isfile(marker):
        return
    os.makedirs(db_dir, exist_ok=True)
    _quiet_derby(spark, db_dir)
    (
        df.write.format("jdbc")
        .option("url", derby_url(db_dir, create=True))
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .mode("overwrite")
        .save()
    )
    with open(marker, "w") as fh:
        fh.write("ok")


def read_jdbc_partitioned(
    spark: SparkSession,
    db_dir: str,
    table: str,
    partition_column: str,
    lower: int,
    upper: int,
    num_partitions: int = 8,
) -> DataFrame:
    """Parallel JDBC scan: `num_partitions` executor-side connections, each
    pulling one slice of ``partition_column``'s [lower, upper] range.
    Filters and column pruning on the returned DataFrame push down into
    the generated remote SQL (JDBCRelation shows PushedFilters in the
    plan)."""
    _quiet_derby(spark, db_dir)
    return (
        spark.read.format("jdbc")
        .option("url", derby_url(db_dir))
        .option("dbtable", table)
        .option("driver", DERBY_DRIVER)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower))
        .option("upperBound", str(upper))
        .option("numPartitions", str(num_partitions))
        .load()
    )
