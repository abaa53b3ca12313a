"""sf100 head-to-head under EQUAL measurement discipline (round 13).

The q18 re-measurement (PERF.md §Round-13) showed the official sf100
ratios are cache-state-sensitive: DuckDB's reading swung 20.2/14.6/35.0 s
across identically-coded rounds. This runs the FULL headline with the
same discipline on both engines — per query: 1 warmup + N timed reps,
GC barrier per Spark rep, engines interleaved PER QUERY (spark reps then
duck reps while the same table bytes are page-cache-warm) so neither
engine systematically inherits the other's evictions.

Usage: python tools/headline_sf100_h2h.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# bench.py's HEADLINE minus q18_bucketed: it shares q18_large_orders'
# oracle SQL, so including it would time DuckDB on the identical query
# twice and double-count that ratio in the aggregate. Derived (not
# duplicated) so the two lists cannot drift.
from bench import HEADLINE as _BENCH_HEADLINE  # noqa: E402

HEADLINE = tuple(n for n in _BENCH_HEADLINE if n != "q18_bucketed")


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf100 = os.path.join(_REPO, ".scratch", "sf100")
    if not os.path.isfile(os.path.join(sf100, "_COMPLETE")):
        print("sf100 replica absent")
        return 1

    import duckdb

    from sdg_data_catalog_spark.catalog import TABLES
    from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries
    from sdg_data_catalog_spark.session import get_spark

    spark = get_spark("h2h-sf100")
    qs, ors = all_queries(), all_oracles()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf100, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    def gc():
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)

    rows = []
    for name in HEADLINE:
        def srep() -> float:
            df = qs[name](spark, sf100)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        gc()
        srep()  # warmup
        stimes = []
        for _ in range(reps):
            gc()
            stimes.append(srep())
        sql = ors[name]
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dwarm = time.perf_counter() - t0
        dtimes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dtimes.append(time.perf_counter() - t0)
        smin, dmin = min(stimes), min(dtimes)
        rows.append((name, smin, dmin))
        print(
            f"{name:24s} spark={smin:7.2f}s {['%.2f' % t for t in stimes]}"
            f"  duck={dmin:7.2f}s (warm {dwarm:.2f}) {['%.2f' % t for t in dtimes]}"
            f"  ratio={smin / dmin:.2f}",
            flush=True,
        )
    stot = sum(r[1] for r in rows)
    dtot = sum(r[2] for r in rows)
    print(f"\nTOTAL spark={stot:.2f}s duck={dtot:.2f}s ratio={stot / dtot:.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
