"""Tuned SparkSession factory.

All entry points (tests, bench, driver contract) share one session shape:
local[$SPARK_GRAFT_CPUS] while developing, but every config here is chosen
to also hold on a large cluster (AQE handles runtime re-planning; shuffle
partition count is only a hint once adaptive coalescing is on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """32g on the 128 GiB test box, but never more than half of physical
    RAM — on smaller hosts a hardcoded 32g either fails JVM startup or
    overcommits. SPARK_GRAFT_DRIVER_MEM always wins."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemTotal:"):
                    half_gb = int(line.split()[1]) // (2 * 1024 * 1024)
                    return f"{max(1, min(32, half_gb))}g"
    except OSError:
        pass
    return "4g"


def get_spark(app_name: str = "sdg-data-catalog-spark", master: str | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Finer AQE target-partition granularity: the 64 MB default lets
        # medium shuffles (a few hundred MB — exactly the reduced/
        # pre-aggregated exchanges this engine's plans produce) collapse to
        # a handful of post-shuffle partitions, serializing the next stage
        # on a 32-core box. 16 MB keeps those stages wide (q18 at sf10:
        # 7.9 → 4.8 s measured) and on a real cluster is within the range
        # Spark's own tuning guide recommends when cores ≫ shuffle data/64MB.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # Hint only — AQE coalesces down; on a real cluster this scales with
        # executor count (rule of thumb: 2-3x total cores).
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        # Scan splitting: guarantee a floor of one read split per core on
        # single-file tables (default openCost=4MB floors split size, so a
        # 11 MB file scanned as 3 tasks leaves 29 of 32 cores idle —
        # measured 11% off the headline total; a 1.4 GB file at the default
        # 128 MB maxPartitionBytes plans 11 splits — 1/3 of the cores —
        # measured 2× off the sf10 scan-heavy aggregations). At scale these
        # are inert: totalBytes/128MB >> #cores and 256 KB still coalesces
        # tiny files.
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.files.openCostInBytes", "262144")
        # Deterministic timestamps: match DuckDB's naive-UTC reading of the
        # driver parquet; events.parquet carries TIMESTAMP(NANOS), which the
        # vectorized reader only accepts as long (catalog._load_events
        # converts to µs timestamps).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for every pandas_udf / mapInPandas / toPandas hop.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Arrow-optimized Python UDTFs: the lateral fan-out runs over Arrow
        # batches (ArrowEvalPythonUDTF) instead of per-row pickling
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        # Heap: min(32g, half of MemTotal). 32g on the 128 GiB test box —
        # at the sf10 bench tier a 16g heap showed late-session GC
        # inflation (trailing queries 3-10× their fresh-session times after
        # q18's shuffles + broadcast builds accumulated) — without breaking
        # JVM startup on smaller hosts; on a real cluster this is
        # per-executor memory and scales with the executor spec.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


from contextlib import contextmanager


@contextmanager
def conf_overrides(spark: SparkSession, **confs: str):
    """Set runtime SQL confs for a scope and restore the previous values on
    exit (same save/restore discipline as the Arrow batch-size hoisting —
    no query may leave session-wide side effects). Keys use __ for dots only
    when called with literal kwargs; pass a dict via ** for dotted keys."""
    saved: dict[str, str | None] = {}
    for k, v in confs.items():
        key = k.replace("__", ".")
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, prev in saved.items():
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
