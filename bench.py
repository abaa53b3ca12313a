"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
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

from sdg_data_catalog_spark.queries.registry import all_queries  # noqa: E402
from sdg_data_catalog_spark.session import get_spark  # noqa: E402

# Headline set: the heaviest representative per operator family.
HEADLINE = (
    "q5_revenue_by_nation",
    "q1_pricing_summary",
    "join_fk",
    "win_rownum_topk",
    "agg_rollup",
    "topk_global",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("sdg-bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs] or sorted(qs)[:5]

    # one warmup to amortize JVM/codegen startup out of per-query numbers
    qs[names[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_sec",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
