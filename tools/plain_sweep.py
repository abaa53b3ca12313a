"""Full-registry sweep under the DRIVER'S exact shape.

Differences from `sdg_data_catalog_spark.oracle_check` (the tuned-session
replica): this runs from a FOREIGN cwd with a PLAIN SparkSession (default
1 GiB heap, default shuffle partitions, no repo confs — the driver never
uses our tuned session; config-dependent bugs like the nanos-timestamp
events parquet or shuffle-partition-sensitive plans only surface here),
and canonicalizes results the way the driver does: columns sorted BY
NAME, floats rounded, rows sorted by the full value tuple via pandas —
so driver-canon-hostile output types (array/map cells) crash HERE, not
in the official record (the emb_pca_project r5 lesson).

Usage:
    python tools/plain_sweep.py [sf_dir] [name ...]   # default: all names
"""

from __future__ import annotations

import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
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
    # driver-style: pandas sort over ALL columns — unhashable cells
    # (lists/arrays) raise here exactly as they would in the driver
    out = out.sort_values(list(out.columns), kind="mergesort").reset_index(
        drop=True
    )
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.chdir("/tmp")  # foreign cwd — the driver's shape
    sys.path.insert(0, _REPO)

    import duckdb
    from pyspark.sql import SparkSession

    from sdg_data_catalog_spark.catalog import TABLES
    from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("plain-sweep")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    qs, oracles = all_queries(), all_oracles()
    names = [n for n in qs if not only or n in only]
    failures = []
    t_start = time.time()
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            got = _canon(qs[name](spark, sf_dir).toPandas())
            if name in oracles:
                want = _canon(con.execute(oracles[name]).df())
                if list(got.columns) != list(want.columns):
                    raise AssertionError(
                        f"schema {list(got.columns)} != {list(want.columns)}"
                    )
                if len(got) != len(want):
                    raise AssertionError(f"rows {len(got)} != {len(want)}")
                if not got.astype(str).equals(want.astype(str)):
                    diff = (got.astype(str) != want.astype(str)).any(axis=1)
                    raise AssertionError(
                        f"values differ, first row:\n{got[diff].head(1)}\n"
                        f"vs\n{want[diff].head(1)}"
                    )
                status = "ok"
            else:
                status = f"rows-only:{len(got)}"
        except Exception as e:  # noqa: BLE001
            status = "FAIL " + str(e).splitlines()[0][:200]
            failures.append((name, status))
        print(
            f"[{i}/{len(names)} +{time.time() - t_start:.0f}s]"
            f" {name}: {status} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    print(f"\n{len(failures)} failures / {len(names)} names")
    for name, msg in failures:
        print(" ", name, msg)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
