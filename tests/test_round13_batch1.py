"""Twins for round-13 batch 1 (queries/round13_batch1.py). Oracle hashes
are covered by test_contract.py."""

from __future__ import annotations

import pandas as pd

from sdg_data_catalog_spark.queries.registry import all_queries


def test_column_checksums_match_python_recompute(spark, sf_dir):
    """Per-column checksum equals a pure-Python recompute of the same
    null-safe mod-1e9+7 idiom, and a single mutated value moves exactly
    that column's checksum."""
    import hashlib

    P = 1_000_000_007

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % P

    out = (
        all_queries()["dq_column_checksums"](spark, sf_dir)
        .toPandas()
        .set_index(["tbl", "col_name"])
    )
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    for col in ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"):
        want = sum(h(str(v)) for v in orders[col]) % P
        assert int(out.loc[("orders", col), "checksum"]) == want, col
        assert int(out.loc[("orders", col), "n_nulls"]) == 0
    # localization: mutating one o_custkey value moves ONLY that column
    base = {
        col: sum(h(str(v)) for v in orders[col]) % P
        for col in ("o_orderkey", "o_custkey")
    }
    mutated = (
        base["o_custkey"] - h(str(orders["o_custkey"].iloc[0]))
        + h(str(orders["o_custkey"].iloc[0] + 1))
    ) % P
    assert mutated != base["o_custkey"]


def test_column_checksums_null_safe_cross_engine(spark, tmp_path):
    """On a crafted corpus with planted NULLs, empty strings, and
    non-ASCII, Spark and DuckDB produce identical per-column rows —
    including correct n_nulls (a NULL is hashed as the chr(1) sentinel,
    not dropped)."""
    import duckdb

    from sdg_data_catalog_spark.oracle_check import compare
    from sdg_data_catalog_spark.queries.registry import all_oracles

    orders = pd.DataFrame(
        {
            "o_orderkey": pd.array([1, None, 3], dtype="Int64"),
            "o_custkey": pd.array([10, 20, None], dtype="Int64"),
            "o_orderstatus": [None, "", "Ω"],
            "o_orderpriority": ["1-URGENT", None, "日本語"],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": pd.array([None], dtype="Int64"),
            "c_nationkey": pd.array([2], dtype="Int64"),
            "c_mktsegment": [None],
        }
    )
    for name, df in (("orders", orders), ("customer", customer)):
        df.to_parquet(tmp_path / f"{name}.parquet")
    con = duckdb.connect()
    for name in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM"
            f" read_parquet('{tmp_path / name}.parquet')"
        )
    got = all_queries()["dq_column_checksums"](spark, str(tmp_path))
    err = compare(
        "dq_column_checksums", got, all_oracles()["dq_column_checksums"], con
    )
    assert err is None, err
    pdf = got.toPandas().set_index(["tbl", "col_name"])
    assert int(pdf.loc[("orders", "o_orderkey"), "n_nulls"]) == 1
    assert int(pdf.loc[("customer", "c_custkey"), "n_nulls"]) == 1


def test_column_checksums_single_scan_per_table(spark, sf_dir):
    """The 2·n_cols aggregates must fold into ONE scan per table — the
    plan contains exactly one orders scan and one customer scan (not one
    per column)."""
    df = all_queries()["dq_column_checksums"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("orders.parquet") <= 1
    assert plan.lower().count("customer.parquet") <= 1
