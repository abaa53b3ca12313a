"""Registry-wide plan-scan audit: count corpus-table parquet scans in every
registered query's formatted physical plan.

A query whose plan scans one corpus table N>=3 times has (almost always)
re-expanded a shared subtree — locally invisible on page-cached small
parquet, but at 100 TB every visible scan is a full corpus pass. This is
the audit that caught graph_clustering_coeff at 34 lineitem scans and
agg_survival_km at 8 events scans in round 7.

Usage:
    python tools/plan_audit.py [sf_dir] [name ...]    # default: all names
    python tools/plan_audit.py --min 3                # only show >=3

Prints one line per offending query (max scan count >= --min) and a JSON
summary to tools/plan_audit.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def scan_counts(plan: str) -> dict[str, int]:
    """Count parquet scans per corpus table in a formatted plan.

    Counts 'Scan parquet' node headers whose Location line references
    <table>.parquet — not raw substring hits, which would also count
    ReadSchema/Location repeats inside one node.
    """
    out: dict[str, int] = {}
    # formatted explain: node section per scan with "Location: ... <path>"
    for m in re.finditer(r"\(\d+\) Scan parquet ?\n(?:.*\n)*?Location.*?\[file:([^\]]*)\]", plan):
        path = m.group(1)
        for t in TABLES:
            if f"{t}.parquet" in path or f"/{t}" in path:
                out[t] = out.get(t, 0) + 1
                break
    if not out:
        # fallback: substring count of Location lines
        for line in plan.splitlines():
            if "Location" in line:
                for t in TABLES:
                    if f"{t}.parquet" in line:
                        out[t] = out.get(t, 0) + 1
    return out


def main() -> int:
    args = [a for a in sys.argv[1:]]
    min_scans = 3
    if "--min" in args:
        i = args.index("--min")
        min_scans = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        args = args[1:]
    only = set(args)

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    from pyspark.sql import SparkSession

    from sdg_data_catalog_spark.plans.inspect import formatted_plan
    from sdg_data_catalog_spark.queries.registry import all_queries

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs = all_queries()
    names = [n for n in qs if not only or n in only]
    seen_fn = {}
    report: dict[str, dict] = {}
    offenders = []
    t0 = time.time()
    for i, name in enumerate(names):
        fn = qs[name]
        if id(fn) in seen_fn:  # alias — same callable, same plan
            continue
        seen_fn[id(fn)] = name
        try:
            df = fn(spark, sf_dir)
            counts = scan_counts(formatted_plan(df))
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e).splitlines()[0][:120]}
            continue
        mx = max(counts.values(), default=0)
        report[name] = {"scans": counts, "max": mx}
        if mx >= min_scans:
            offenders.append((mx, name, counts))
            print(f"  {mx}x {name:36s} {counts}", flush=True)
    offenders.sort(reverse=True)
    out = {
        "sf_dir": sf_dir,
        "min_scans": min_scans,
        "n_queries": len(report),
        "offenders": [
            {"name": n, "max": mx, "scans": c} for mx, n, c in offenders
        ],
        "elapsed_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(_REPO, "tools", "plan_audit.json"), "w") as fh:
        json.dump({"summary": out, "all": report}, fh, indent=1)
    print(
        f"\n{len(offenders)} queries with >= {min_scans} scans of one table "
        f"(of {len(report)} audited, {out['elapsed_sec']}s) -> tools/plan_audit.json"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
