"""Driver-shape dress rehearsal: the EXACT end-to-end sequence the round
driver runs, in ONE process — the gate that would have caught the r6
bench timeout (the curation-scale tier's first real execution happened in
the official run because the rehearsal preceded the replica marker).

Sequence (mirroring the driver):
  1. foreign cwd, PLAIN SparkSession (default 1 GiB heap, default confs);
  2. correctness sweep of the FIRST 50 names of queries() at sf0.01 with
     driver-style pandas canonicalization;
  3. bench.main() in the SAME process (bench's heap guard must detect the
     starved inherited session and relaunch the tuned JVM — the r4/r5
     lesson), with the full tier set including curation-scale.

Exit 0 only if the window is 50/50 AND bench prints its compact line.

Usage: python tools/dress_rehearsal.py [--skip-bench]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    os.chdir("/tmp")
    sys.path.insert(0, _REPO)

    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from plain_sweep import _canon  # the driver-style canonicalizer

    import __spark_entry__ as entrypoint
    from sdg_data_catalog_spark.catalog import TABLES

    sf_dir = "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[8]").appName("t2").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    qs, oracles = entrypoint.queries(), entrypoint.oracle_sql()
    window = list(qs)[:50]
    t0 = time.time()
    bad = []
    for i, name in enumerate(window, 1):
        try:
            got = _canon(qs[name](spark, sf_dir).toPandas())
            if name in oracles:
                want = _canon(con.execute(oracles[name]).df())
                assert list(got.columns) == list(want.columns), "schema"
                assert len(got) == len(want), f"rows {len(got)}!={len(want)}"
                assert got.astype(str).equals(want.astype(str)), "values"
                status = "ok"
            else:
                status = f"rows-only:{len(got)}"
        except Exception as e:  # noqa: BLE001
            status = "FAIL " + str(e).splitlines()[0][:160]
            bad.append((name, status))
        print(f"[{i}/50 +{time.time() - t0:.0f}s] {name}: {status}", flush=True)
    print(f"\nwindow: {50 - len(bad)}/50 green in {time.time() - t0:.0f}s")
    for name, msg in bad:
        print(" ", name, msg)
    if bad:
        spark.stop()
        return 1
    if "--skip-bench" in sys.argv:
        spark.stop()
        return 0
    # bench in the SAME process, inheriting the starved plain session —
    # exactly the driver's shape; bench must detect + relaunch
    print("\n--- bench.main() in-process ---", flush=True)
    import bench

    bench.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
