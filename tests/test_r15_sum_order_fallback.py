"""r15 (VERDICT item 6): pin the F.sum order-identity assumption.

lm_kneser_ney_score and curation_ppl_band_select replaced their per-doc
position-ordered folds with plain F.sum("logp"), arguing the explode
emits each doc's bigrams in position order within one partition, the
broadcast model join preserves stream order, and the hash aggregate
accumulates one partial per doc — so the codegen'd sum IS the
pos-ordered fold. The known edge: under memory pressure
HashAggregateExec falls back to SORT-based aggregation, which splits a
group's rows into several partial buffers at spill boundaries and merges
them — re-associating the double additions — and a last-ulp flip could
move a doc across the floor(avg_logp·1e9) band key or the top-25 rank.

This test plants that fallback deliberately via Spark's internal testing
conf `spark.sql.TungstenAggregate.testFallbackStartsAt` ("n1,n2" =
switch partial/final aggregation to sort-based after that many keys):
with "1,1" every aggregate runs essentially sort-based with maximal
buffer splitting. Both ops must produce byte-identical results to their
no-fallback runs on the sf0.001 corpus. If Spark ever changes fallback
semantics in a way that re-orders these sums past the rounding guards,
this test is the tripwire — the fix then is the pre-r14 ordered fold.
"""

from __future__ import annotations

_FALLBACK_CONF = "spark.sql.TungstenAggregate.testFallbackStartsAt"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _run_with_fallback(spark, fn, sf_dir):
    baseline = _rows(fn(spark, sf_dir))
    spark.conf.set(_FALLBACK_CONF, "1,1")
    try:
        fallback = _rows(fn(spark, sf_dir))
    finally:
        spark.conf.unset(_FALLBACK_CONF)
    return baseline, fallback


def test_kneser_ney_sum_survives_sort_agg_fallback(spark, sf_dir):
    from sdg_data_catalog_spark.queries.registry import all_queries

    fn = all_queries()["lm_kneser_ney_score"]
    baseline, fallback = _run_with_fallback(spark, fn, sf_dir)
    assert len(baseline) == 25
    assert baseline == fallback


def test_ppl_band_select_survives_sort_agg_fallback(spark, sf_dir):
    from sdg_data_catalog_spark.queries.registry import all_queries

    fn = all_queries()["curation_ppl_band_select"]
    baseline, fallback = _run_with_fallback(spark, fn, sf_dir)
    assert baseline  # non-empty band at sf0.001
    assert baseline == fallback
