"""Lake-ops batch: nested-leaf pruning plan gate, dynamic-overwrite
partition isolation, and federated JDBC pushdown."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import all_queries
from sdg_data_catalog_spark.sources.formats import io_dir


def test_nested_pruning_readschema_excludes_payload(spark, sf_dir):
    """The struct scan must read ONLY the referenced leaves: text_copy
    (the wide payload leaf) may not appear in the parquet ReadSchema."""
    df = all_queries()["scan_nested_pruning"](spark, sf_dir)
    df.collect()  # ensure table exists and query runs
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "text_copy" not in plan
    assert "lang" in plan and "n_chars" in plan


def test_dynamic_overwrite_touches_only_one_partition(spark, sf_dir):
    """File-level proof beside the value-level oracle: after the op runs,
    the untouched day partitions still contain their ORIGINAL values
    (x1), only 2024-01-03 carries doubled values."""
    all_queries()["sink_dynamic_overwrite"](spark, sf_dir).collect()
    path = io_dir(sf_dir, "events_dynpart", fresh=False)
    assert os.path.exists(os.path.join(path, "_PASS2_DONE"))
    stored = spark.read.parquet(path)
    ev = table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_id", "value"
    )
    joined = stored.withColumnRenamed("value", "stored_value").join(
        ev, ["day", "event_id"]
    )
    bad_untouched = joined.filter(
        (F.col("day") != F.lit("2024-01-03").cast("date"))
        & (F.abs(F.col("stored_value") - F.col("value")) > 1e-9)
    )
    bad_touched = joined.filter(
        (F.col("day") == F.lit("2024-01-03").cast("date"))
        & (F.abs(F.col("stored_value") - 2 * F.col("value")) > 1e-9)
    )
    assert bad_untouched.count() == 0
    assert bad_touched.count() == 0


def test_federated_join_pushes_filter_to_jdbc(spark, sf_dir):
    df = all_queries()["join_federated"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # predicate reaches the remote SQL, dim side broadcasts
    assert "PushedFilters" in plan and "c_acctbal" in plan
    assert "BroadcastHashJoin" in plan
    assert df.count() > 0


def test_rowgroup_stats_match_duckdb_metadata(spark, sf_dir):
    """The executor-side pyarrow footer read must agree with DuckDB's
    parquet_metadata() on the same file — row-group count, row counts,
    and l_shipdate min/max stats."""
    import duckdb
    import pandas as pd

    from sdg_data_catalog_spark.queries.registry import all_queries

    out = (
        all_queries()["diag_rowgroup_stats"](spark, sf_dir)
        .toPandas()
        .sort_values("row_group_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT CAST(row_group_id AS INTEGER) AS row_group_id,
               CAST(num_values AS BIGINT) AS n_rows,
               CAST(stats_min_value AS TIMESTAMP) AS min_shipdate,
               CAST(stats_max_value AS TIMESTAMP) AS max_shipdate
        FROM parquet_metadata('{sf_dir}/lineitem.parquet')
        WHERE path_in_schema = 'l_shipdate'
        ORDER BY row_group_id
        """
    ).fetchdf()
    assert len(out) == len(want) >= 1
    assert (out["row_group_id"] == want["row_group_id"]).all()
    assert (out["n_rows"] == want["n_rows"]).all()
    assert (
        pd.to_datetime(out["min_shipdate"]) == pd.to_datetime(want["min_shipdate"])
    ).all()
    assert (
        pd.to_datetime(out["max_shipdate"]) == pd.to_datetime(want["max_shipdate"])
    ).all()
