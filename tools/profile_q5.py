"""q5_bucketed component-floor decomposition at sf10 (r10 verdict #3).

Interleaved min-of-N with a GC barrier per rep — same method as the
round-10 agg_rollup/topk_global floors (PERF.md §Round-10 component
floors). Components:

  A  probe-leg floor: shipdate-filtered bucketed lineitem scan + bare agg
  B  build-leg floor: o_bkt scan -> broadcast cust/nation/region chain
     -> (o_orderkey, n_name) projection -> bare count
  C  full join, COUNT only (isolates the hash join from the revenue agg)
  D  full q5_bucketed plan (join + 25-group revenue agg)
  E  candidate rewrite: bucket-local li(filtered) JOIN full orders
     (o_orderkey, o_custkey — int-only build side, no per-query broadcast
     probe over orders), THEN broadcast (c_custkey, n_name) map, agg.
     Moves the dim reduction AFTER the fact-fact join.

Plus the DuckDB full-q5 reference and DuckDB's own filtered-scan floor.

Usage: python tools/profile_q5.py [reps]
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

    spark = get_spark("profile-q5")
    sops._ensure_bucketed_tables(spark, sf10)
    sfn = table_safe_sf_name(sf10)
    li = spark.table(f"li_bkt_{sfn}")
    orders = spark.table(f"o_bkt_{sfn}")
    customer = table(spark, sf10, "customer")
    nation = table(spark, sf10, "nation")
    region = table(spark, sf10, "region")

    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1998-01-01").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    # Every component is a THUNK that rebuilds its DataFrame from scratch,
    # and execution is a noop WRITE (bench's _execute): re-collecting one
    # DataFrame instance reuses its shuffle map outputs (first version of
    # this profiler read 0.02 s components for a 1.4 s plan), while a
    # fresh plan + write action re-runs every stage, which is what the
    # bench and a deployed query actually pay.
    def _dim():
        return (
            nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
            .filter(F.col("r_name").isin("ASIA", "EUROPE"))
            .select("n_nationkey", "n_name")
        )

    def _cust():
        return customer.join(
            F.broadcast(_dim()), F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", "n_name")

    def _ordn():
        return orders.join(
            F.broadcast(_cust()), F.col("o_custkey") == F.col("c_custkey")
        ).select("o_orderkey", "n_name")

    def _fil():
        return li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))

    plans = {
        "A_probe_scan_agg": lambda: _fil().agg(
            F.round(F.sum(rev), 2).alias("r"), F.count(F.lit(1)).alias("n")
        ),
        "B_build_leg": lambda: _ordn().agg(F.count(F.lit(1)).alias("n")),
        "C_join_count": lambda: _fil()
        .join(_ordn().hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n")),
        "D_full_q5_bucketed": lambda: all_queries()["q5_bucketed"](spark, sf10),
        "E_join_first_dim_after": lambda: (
            _fil()
            .select("l_orderkey", "l_extendedprice", "l_discount")
            .join(
                orders.select("o_orderkey", "o_custkey").hint("shuffle_hash"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .join(F.broadcast(_cust()), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("n_name")
            .agg(
                F.round(F.sum(rev), 2).alias("revenue"),
                F.count(F.lit(1)).alias("line_count"),
            )
        ),
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

    # sanity: candidate E must equal D
    d = {tuple(r) for r in plans["D_full_q5_bucketed"]().collect()}
    e = {tuple(r) for r in plans["E_join_first_dim_after"]().collect()}
    print("E == D results:", d == e, flush=True)

    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf10, t)}.parquet')"
        )
    q5 = """
        SELECT n_name, ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA','EUROPE')
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name"""
    scan = """
        SELECT ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2), COUNT(*)
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'"""
    for label, sql in (("duck_full_q5", q5), ("duck_scan_floor", scan)):
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
