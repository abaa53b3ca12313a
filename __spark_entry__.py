"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``sdg_data_catalog_spark.queries.registry`` — every operator
from SURVEY.md §2 registers there with a Spark callable and (when
SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver invokes from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sdg_data_catalog_spark.queries.relational import q5_revenue_by_nation

    return q5_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect equivalents for every SQL-expressible query."""
    return all_oracles()
