"""Source/sink format helpers shared by the scan/sink operator surface
(queries/sources_sinks.py and queries/scale_ops.py).

Centralizes the repo-local scratch layout used for write→read-back
round-trips, so every format operator materializes under one gitignored
tree, namespaced by scale factor — and the helpers here are the single
place that policy lives.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

# repo-local scratch root (…/repo/.scratch), independent of caller cwd
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".scratch",
)


def sf_name(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' → 'sf0.01' (dot-free variant for catalog
    table names via table_safe_sf_name)."""
    return os.path.basename(os.path.normpath(sf_dir))


def table_safe_sf_name(sf_dir: str) -> str:
    return sf_name(sf_dir).replace(".", "_")


def io_dir(sf_dir: str, leaf: str, fresh: bool = True) -> str:
    """Scratch path for one operator at one scale factor. fresh=True clears
    any previous materialization (round-trip operators rewrite per call);
    fresh=False lets layout operators (bucketed/partitioned tables) reuse
    the existing materialization across calls."""
    path = os.path.join(SCRATCH, sf_name(sf_dir), leaf)
    if fresh and os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)
    return path


def roundtrip_json(df: DataFrame, spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Write as JSONL, read back with an explicit schema (the schema IS the
    projection — dropped fields are never materialized by the scan)."""
    df.write.json(path)
    return spark.read.schema(schema).json(path)


def roundtrip_csv(df: DataFrame, spark: SparkSession, path: str, schema: str) -> DataFrame:
    df.write.option("header", True).csv(path)
    return spark.read.schema(schema).option("header", True).csv(path)


def roundtrip_parquet(df: DataFrame, spark: SparkSession, path: str) -> DataFrame:
    df.write.parquet(path)
    return spark.read.parquet(path)


def roundtrip_orc(df: DataFrame, spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Write as ORC, read back with an explicit (pruning) schema. ORC is the
    second columnar format Spark ships a vectorized reader for — same
    pushdown/pruning contract as parquet (PushedFilters + ReadSchema),
    verified by the plan test."""
    df.write.orc(path)
    return spark.read.schema(schema).orc(path)
