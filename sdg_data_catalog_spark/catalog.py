"""Loaders for the driver's parquet star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file per table under an sf dir.

Reads are plain ``spark.read.parquet`` so Catalyst gets predicate pushdown,
column pruning, and (on partitioned layouts at scale) partition pruning for
free. Replaces the reference's SQLite row-store
(``utils/db_connection.py:12-32`` in sdg-ai/sdg_data_catalog).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any scale factor (region and
# nation are fixed-size in TPC-H; the gazetteer/vocab dims the catalog uses
# are a few thousand rows). table() stamps these with a broadcast hint so
# every join against them picks BroadcastHashJoin regardless of the
# session's autoBroadcastJoinThreshold.
BROADCAST_DIMS = frozenset({"region", "nation"})


_SHIPPED: set[int] = set()


def _ensure_pyfiles(spark: SparkSession) -> None:
    """Ship this package to executor Python workers (once per session).

    Worker-shipped callables (mapInPandas / applyInPandas bodies) that
    reference package-level helpers are cloudpickled BY REFERENCE — the
    worker must be able to `import sdg_data_catalog_spark`. That holds when
    the driver process runs from the repo root (tests, bench) but NOT for a
    foreign session started elsewhere (the external driver runs from its
    own cwd): the task then dies with ModuleNotFoundError. `addPyFile` of a
    package zip is the standard cluster deployment fix (same mechanism as
    --py-files) and is a no-op burden when the path import would already
    work."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_root = os.path.dirname(os.path.abspath(__file__))
    fd, zpath = tempfile.mkstemp(prefix="sdg_data_catalog_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_root):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, os.path.dirname(pkg_root)))
    sc.addPyFile(zpath)
    _SHIPPED.add(id(sc))


def _ensure_conf(spark: SparkSession, key: str, value: str) -> None:
    """Set a session conf only if it isn't already the wanted value — query
    builders must not mutate the shared session on every invocation (the
    tuned factory in session.py sets these up front; this is the safety net
    for foreign sessions like the external driver's plain one)."""
    try:
        if spark.conf.get(key) == value:
            return
    except Exception:
        pass
    spark.conf.set(key, value)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from an sf dir."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Deterministic timestamp semantics regardless of who built the session
    # (the driver's session may not set a timezone; DuckDB reads naive-UTC).
    _ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    _ensure_pyfiles(spark)
    if name == "events":
        return _load_events(spark, path)
    df = spark.read.parquet(path)
    if name in BROADCAST_DIMS:
        from pyspark.sql import functions as F

        df = F.broadcast(df)
    return df


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    rejects; read nanos as long and convert to microsecond TIMESTAMP
    (matching DuckDB's truncating nanos→micros read)."""
    from pyspark.sql import functions as F

    _ensure_conf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
