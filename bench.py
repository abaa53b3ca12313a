"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: each query is run once to warm (JVM codegen, file-system cache,
broadcast build paths), then the MINIMUM of three timed runs is reported —
steady-state throughput, which is what scales to a long-running cluster.
Single-shot cold numbers mostly measure JVM warmup at this data size, and a
single steady run carries one-sided scheduler/host noise (observed ±20% run
to run); min-of-3 is the standard microbenchmark estimator for that noise
shape. Cold totals and the DuckDB-on-identical-parquet baseline (BASELINE.md:
the de-facto reference number, measured the same way) are included as extra
keys for transparency.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from sdg_data_catalog_spark.queries.registry import all_oracles, all_queries  # noqa: E402
from sdg_data_catalog_spark.session import get_spark  # noqa: E402

# Extended tier: one representative per non-relational operator family —
# steady-state times reported under "extended" (not part of "value", which
# stays comparable round-over-round on the relational headline).
EXTENDED = (
    "pipeline_curation",
    "dedup_jaccard_pairs",
    "dedup_minhash_pairs",
    "sim_cosine_neardup",
    "text_tfidf",
    "text_langid",
    "stream_tumbling",
    "udaf_norm",
    "join_gazetteer",
    "join_bucketed",
)

# Headline set: the heaviest representative per operator family.
HEADLINE = (
    "q5_revenue_by_nation",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q18_large_orders",
    "join_fk",
    "win_rownum_topk",
    "agg_rollup",
    "topk_global",
)


def _run(qs, name, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _steady(qs, name, spark, sf_dir, reps: int = 3) -> float:
    return min(_run(qs, name, spark, sf_dir) for _ in range(reps))


def _duckdb_baseline(names, sf_dir) -> dict[str, float]:
    """Time the DuckDB oracles on the same parquet (warm, 2nd run)."""
    try:
        import duckdb

        from sdg_data_catalog_spark.catalog import TABLES

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
            )
        oracles = all_oracles()
        out = {}
        for name in names:
            if name not in oracles:
                continue
            con.execute(oracles[name]).fetchall()  # warm
            ds = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(oracles[name]).fetchall()
                ds.append(time.perf_counter() - t0)
            out[name] = round(min(ds), 4)
        return out
    except Exception:
        return {}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("sdg-bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)[:5]

    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name in names:
        cold[name] = round(_run(qs, name, spark, sf_dir), 4)  # warmup (cold)
        timings[name] = round(_steady(qs, name, spark, sf_dir), 4)

    extended: dict[str, float] = {}
    for name in (n for n in EXTENDED if n in qs):
        _run(qs, name, spark, sf_dir)  # warmup
        extended[name] = round(_steady(qs, name, spark, sf_dir, reps=2), 4)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cold_total_sec": round(sum(cold.values()), 4),
                "extended": extended,
                "baseline_duckdb": _duckdb_baseline(names, sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
