"""cur100x worst-offender decomposition (r10 verdict #6):
agg_tokenizer_fertility (20.2x growth for 100x docs) and
curation_fasttext_quality (18.0x).

Both are map-side per-row expression pipelines (no growing shuffle), so
the question is WHICH expression term carries the growth, and whether a
cheaper equivalent exists. Fresh-plan noop-write method (see
tools/profile_q5.py for the reuse trap), min-of-N interleaved, GC barrier
per rep, on the 100x documents replica (.scratch/sf10).

Fertility variants (semantics-identical, verified against sf0.01):
  F0 current: size(split(text)) + size(regexp_extract_all(...))
  F1 regexp_count for toks (no match-array materialization)
  F2 F1 + words via char-count diff (no split array either)
  F3 floor: sum(n_chars) by lang — bare scan + agg, no text expression

fastText decomposition:
  X0 current full plan
  X1 bucket from xxhash64 instead of md5 (attribution only — different
     result, NOT a candidate: the oracle pins md5)
  X2 explode + per-doc count only (no hash, no weights)
  X3 tokenize + size only (scan + split floor, no explode)

Usage: python tools/profile_cur100x.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

_TOK_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


def _fertility_variant(docs, mode: str):
    if mode == "F3":
        return docs.groupBy("lang").agg(F.sum("n_chars").alias("c"))
    words = {
        "F0": F.size(F.split("text", " ")),
        "F1": F.size(F.split("text", " ")),
        "F2": F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + 1,
    }[mode]
    toks = (
        F.size(F.expr(f"regexp_extract_all(lower(text), '{_TOK_RE}', 0)"))
        if mode == "F0"
        else F.expr(f"regexp_count(lower(text), '{_TOK_RE}')")
    )
    per_doc = docs.select("lang", words.alias("words"), toks.alias("toks"), "n_chars")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("n_words"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
        F.round(F.sum("toks").cast("double") / F.sum("words"), 6).alias("fertility"),
        F.round(F.sum("n_chars").cast("double") / F.sum("toks"), 6).alias("chars_per_token"),
    )


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf10 = os.path.join(_REPO, ".scratch", "sf10")

    from sdg_data_catalog_spark.catalog import table
    from sdg_data_catalog_spark.queries.curation_quality import _tok_array
    from sdg_data_catalog_spark.queries.registry import all_queries
    from sdg_data_catalog_spark.session import get_spark

    spark = get_spark("profile-cur100x")
    qs = all_queries()

    # -- semantic equivalence of the fertility variants (sf0.01, exact) --
    small = "/root/testdata/sf0.01"
    base = {tuple(r) for r in _fertility_variant(table(spark, small, "documents"), "F0").collect()}
    for mode in ("F1", "F2"):
        got = {tuple(r) for r in _fertility_variant(table(spark, small, "documents"), mode).collect()}
        print(f"{mode} == F0 at sf0.01: {got == base}", flush=True)

    docs100 = lambda: table(spark, sf10, "documents")  # noqa: E731

    def _ft_x(mode: str):
        docs = docs100()
        toks = docs.select("doc_id", _tok_array().alias("t")).filter(F.size("t") >= 2)
        if mode == "X3":
            return toks.select(F.size("t").alias("n")).agg(F.sum("n"))
        n = F.size("t")
        bigs = F.zip_with(
            F.slice("t", 1, n - 1),
            F.slice(F.col("t"), 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        ex = toks.select("doc_id", F.explode(bigs).alias("bg"))
        if mode == "X2":
            return ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).agg(F.sum("n"))
        if mode == "X1":
            bucket = F.pmod(F.xxhash64("bg"), F.lit(256))
        else:
            bucket = F.conv(F.substring(F.md5(F.col("bg")), 1, 8), 16, 10).cast("long") % 256
        wint = (F.col("bucket") * F.lit(2654435761)) % 1000003 % 197 - 98
        perdoc = ex.select("doc_id", bucket.alias("bucket")).groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_bigrams"), F.sum(wint).alias("swint")
        )
        z = F.col("swint").cast("double") / F.lit(98.0) / F.col("n_bigrams")
        return perdoc.orderBy(z.desc(), F.col("doc_id").asc()).limit(25)

    plans = {
        "F0_current": lambda: _fertility_variant(docs100(), "F0"),
        "F1_regexp_count": lambda: _fertility_variant(docs100(), "F1"),
        "F2_no_arrays": lambda: _fertility_variant(docs100(), "F2"),
        "F3_scan_floor": lambda: _fertility_variant(docs100(), "F3"),
        "X0_fasttext_full": lambda: qs["curation_fasttext_quality"](spark, sf10),
        "X1_xxhash_bucket": lambda: _ft_x("X1"),
        "X2_explode_count": lambda: _ft_x("X2"),
        "X3_tokenize_floor": lambda: _ft_x("X3"),
    }

    def run(name):
        df = plans[name]()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def gc():
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.3)

    for name in plans:
        run(name)  # warm
    times = {n: [] for n in plans}
    for _ in range(reps):
        for name in plans:
            gc()
            times[name].append(run(name))
    for name, ts in times.items():
        print(f"{name}: min {min(ts):.3f}s  all {[round(t, 3) for t in ts]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
