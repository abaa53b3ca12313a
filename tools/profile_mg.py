"""sketch_mg_heavy_hitters decomposition (r11 verdict #3: 17.2x cur100x,
the worst remaining growth ratio).

The operator is two corpus scans by design (MG candidate pass + exact
recount — the partitioning-invariant exactness contract), so the question
is which term inside them carries the 100x growth: the tokenize+explode
expression, the per-batch Python dict fold in the MG summary, or the
recount's semi-join+groupBy. Fresh-plan noop-write method (see
tools/profile_q5.py for the shuffle-reuse trap), min-of-N interleaved,
GC barrier per rep, on the 100x documents replica (.scratch/sf10).

  M1  tokenize + explode + bare count     — the shared scan floor
  M2  MG summary pass only (current dict fold), count of summary rows
  M2v MG summary pass with the VECTORIZED fold (pandas Series.add merge +
      np.partition prune — same counters, same candidates, C-speed)
  M3  recount only: semi-join against a precomputed frozen candidate
      list + groupBy + threshold (phase 2 in isolation)
  M0  full current plan
  M0v full plan with the vectorized fold

Equality gate: M0v results must equal M0 exactly (the fold change touches
only HOW the summary is computed, not its value).

Usage: python tools/profile_mg.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf = os.path.join(_REPO, ".scratch", "sf10")

    from sdg_data_catalog_spark.catalog import table
    from sdg_data_catalog_spark.queries import round7_batch6 as r7b6
    from sdg_data_catalog_spark.session import get_spark

    spark = get_spark("profile-mg")
    cap, denom = r7b6._MG_CAP, r7b6._MG_DENOM

    def _toks():
        docs = table(spark, sf, "documents")
        return docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z]+"),
                    lambda t: t != F.lit(""),
                )
            ).alias("token")
        )

    def mg_dict(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for tok, c in pdf["token"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > cap:
                vals = sorted(counters.values(), reverse=True)
                thresh = vals[cap]
                counters = {t: c - thresh for t, c in counters.items() if c > thresh}
        yield pd.DataFrame(
            {"token": list(counters.keys()) + [""], "c": [0] * len(counters) + [n_part]}
        )

    def mg_vec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            vc = pdf["token"].value_counts()
            counters = (
                vc.astype("int64")
                if counters.empty
                else counters.add(vc, fill_value=0).astype("int64")
            )
            if len(counters) > cap:
                vals = counters.to_numpy()
                thresh = int(np.partition(vals, len(vals) - 1 - cap)[len(vals) - 1 - cap])
                counters = counters[counters > thresh] - thresh
        yield pd.DataFrame(
            {"token": list(counters.index) + [""], "c": [0] * len(counters) + [n_part]}
        )

    def _summary(fold):
        return _toks().mapInPandas(fold, "token string, c long")

    def _full(fold):
        summary = _summary(fold).localCheckpoint(eager=True)
        cand = summary.filter(F.col("token") != "").select("token").distinct()
        total = summary.agg(F.sum("c").cast("bigint").alias("n"))
        counts = (
            _toks()
            .join(F.broadcast(cand), "token", "left_semi")
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        return (
            counts.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * denom > F.col("n"))
            .select(
                "token",
                "cnt",
                F.expr("CAST(cnt * 1000000 DIV n AS BIGINT)").alias("freq_ppm"),
            )
            .orderBy(F.desc("cnt"), "token")
        )

    # frozen candidate list for the isolated recount component
    frozen = [
        r.token
        for r in _summary(mg_dict).filter(F.col("token") != "").select("token").distinct().collect()
    ]
    print(f"frozen candidates: {len(frozen)}", flush=True)

    def _recount():
        cand = spark.createDataFrame([(t,) for t in frozen], "token string")
        return (
            _toks()
            .join(F.broadcast(cand), "token", "left_semi")
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    plans = {
        "M1_tok_scan": lambda: _toks().agg(F.count(F.lit(1)).alias("n")),
        "M2_summary_dict": lambda: _summary(mg_dict).agg(F.count(F.lit(1)).alias("n")),
        "M2v_summary_vec": lambda: _summary(mg_vec).agg(F.count(F.lit(1)).alias("n")),
        "M3_recount_frozen": _recount,
        "M0_full_dict": lambda: _full(mg_dict),
        "M0v_full_vec": lambda: _full(mg_vec),
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

    a = [tuple(r) for r in _full(mg_dict).collect()]
    b = [tuple(r) for r in _full(mg_vec).collect()]
    print("M0v == M0 results:", a == b, f"({len(a)} rows)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
