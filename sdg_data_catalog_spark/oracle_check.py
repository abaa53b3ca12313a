"""Local replica of the driver's t2 correctness gate.

Runs every registered query against its DuckDB oracle on the same parquet
tables and compares row count, column names, and an order-insensitive value
comparison (columns sorted by name, rows sorted by full value tuple).

Usage:
    python -m sdg_data_catalog_spark.oracle_check [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

from sdg_data_catalog_spark.catalog import TABLES
from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries
from sdg_data_catalog_spark.session import get_spark


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so dtype-only differences don't fail the diff
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(canon(x) for x in v)
        if isinstance(v, (int,)):
            return int(v)
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                return round(float(v), 6)
        except ImportError:
            pass
        return v

    out = df.map(canon) if hasattr(df, "map") else df.applymap(canon)
    rows = sorted(out.itertuples(index=False, name=None), key=lambda r: tuple(str(x) for x in r))
    return pd.DataFrame(rows, columns=out.columns)


def compare(name: str, spark_df, oracle: str, con) -> str | None:
    """Return None if match, else a short failure description."""
    sp = _normalize(spark_df.toPandas())
    du = _normalize(con.execute(oracle).df())
    if list(sp.columns) != list(du.columns):
        return f"columns differ: spark={list(sp.columns)} duckdb={list(du.columns)}"
    if len(sp) != len(du):
        return f"row count differs: spark={len(sp)} duckdb={len(du)}"
    if not sp.equals(du):
        neq = (sp != du) & ~(sp.isna() & du.isna())
        bad = neq.any(axis=1)
        idx = list(sp.index[bad])[:3]
        detail = "; ".join(
            f"row{i}: spark={tuple(sp.loc[i])} duckdb={tuple(du.loc[i])}" for i in idx
        )
        return f"{int(bad.sum())} mismatched rows — {detail}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    qs, oracles = all_queries(), all_oracles()
    failures = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"  {name:32s} rows-only ({n} rows)")
            continue
        try:
            err = compare(name, fn(spark, sf_dir), oracles[name], con)
        except Exception as e:  # noqa: BLE001
            err = f"exception: {e}"
        if err:
            failures += 1
            print(f"✗ {name:32s} {err}")
        else:
            print(f"✓ {name}")
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
