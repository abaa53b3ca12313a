"""q18_bucketed component-floor decomposition at sf10 (r11 verdict #2).

Same method as tools/profile_q5.py (PERF.md §Round-11): every component is
a THUNK that rebuilds its DataFrame from scratch and executes via a noop
WRITE (re-collecting one DataFrame instance reuses its shuffle map
outputs), interleaved min-of-N with a GC barrier per rep. Components:

  A  li_bkt scan + bare SUM(l_quantity)        — the scan/decode floor
  B  A + groupBy(l_orderkey)                   — the per-order hash map
     (bucket-local: scan reports HashPartitioning, NO Exchange)
  C  B + HAVING sum_qty > 150                  — predicate is ~free
  D  C ⋈ o_bkt (shuffle_hash, bucket-local) + count — the orderkey join
  E  full q18_bucketed (D + customer shuffle_hash join + top-20)

Plus DuckDB's full q18 and DuckDB's own group-agg floor (B's shape).

Usage: python tools/profile_q18.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf10 = os.path.join(_REPO, ".scratch", "sf10")

    from sdg_data_catalog_spark.catalog import table
    from sdg_data_catalog_spark.queries import scale_ops as sops
    from sdg_data_catalog_spark.queries.registry import all_queries
    from sdg_data_catalog_spark.session import get_spark
    from sdg_data_catalog_spark.sources.formats import table_safe_sf_name

    spark = get_spark("profile-q18")
    sops.join_bucketed(spark, sf10)  # ensure bucketed tables exist
    sfn = table_safe_sf_name(sf10)
    li = spark.table(f"li_bkt_{sfn}")
    orders = spark.table(f"o_bkt_{sfn}")
    customer = table(spark, sf10, "customer")

    def _big():
        return (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("sum_qty"))
            .filter(F.col("sum_qty") > 150)
        )

    plans = {
        "A_scan_sum": lambda: li.agg(F.sum("l_quantity").alias("s")),
        "B_group_map": lambda: li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .agg(F.count(F.lit(1)).alias("n")),
        "C_group_having": lambda: _big().agg(F.count(F.lit(1)).alias("n")),
        "D_join_orders_count": lambda: orders.join(
            _big().hint("shuffle_hash"), F.col("o_orderkey") == F.col("l_orderkey")
        ).agg(F.count(F.lit(1)).alias("n")),
        "E_full_q18_bucketed": lambda: all_queries()["q18_bucketed"](spark, sf10),
    }

    def run(name):
        df = plans[name]()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def gc():
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)

    for name in plans:  # warm
        run(name)
    times = {n: [] for n in plans}
    for _ in range(reps):
        for name in plans:
            gc()
            times[name].append(run(name))
    for name, ts in times.items():
        print(f"{name}: min {min(ts):.3f}s  all {[round(t,3) for t in ts]}", flush=True)

    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf10, t)}.parquet')"
        )
    q18 = """
        SELECT c_name, o_orderkey, o_orderdate,
               ROUND(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
               ROUND(CAST(sum_qty AS DOUBLE), 2) AS sum_qty
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty FROM lineitem
              GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) q
          ON o_orderkey = q.l_orderkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20"""
    grp = """
        SELECT COUNT(*) FROM (
          SELECT l_orderkey, SUM(l_quantity) AS s FROM lineitem GROUP BY l_orderkey
        )"""
    scan = "SELECT SUM(l_quantity) FROM lineitem"
    for label, sql in (
        ("duck_full_q18", q18),
        ("duck_group_map_floor", grp),
        ("duck_scan_floor", scan),
    ):
        con.execute(sql).fetchall()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: min {min(ts):.3f}s  all {[round(t,3) for t in ts]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
