"""Plan-quality gates for the round-4 operators: shuffle counts, Python
nodes, and top-k physical strategy. Counting runs on the single-tree
executedPlan string: sparkPlan() predates EnsureRequirements (no
Exchanges yet), and the formatted plan lists every node twice — once in
the tree, once in the detail section."""

from __future__ import annotations

from sdg_data_catalog_spark.queries.registry import all_queries


def _spark_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles(df) -> int:
    p = _spark_plan(df)
    return p.count("Exchange") - p.count("BroadcastExchange")


def _q(spark, sf_dir, name):
    return all_queries()[name](spark, sf_dir)


def test_sessionize_is_one_shuffle(spark, sf_dir):
    """The docstring's claim: both windows AND the final session rollup
    ride ONE hash partitioning — HashPartitioning(user_id) satisfies the
    (user_id, session_no) clustering because it's a key subset."""
    assert _shuffles(_q(spark, sf_dir, "etl_sessionize")) == 1


def test_single_shuffle_aggregations(spark, sf_dir):
    for name in ("feat_hashing_tf", "agg_histogram", "etl_cdc_apply"):
        assert _shuffles(_q(spark, sf_dir, name)) == 1, name


def test_gopher_rules_scan_only(spark, sf_dir):
    """The whole rule stack is codegen'd expressions over one scan —
    zero shuffles, zero Python."""
    df = _q(spark, sf_dir, "filter_gopher_rules")
    plan = _spark_plan(df)
    assert _shuffles(df) == 0
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    """Efraimidis–Spirakis top-k plans as TakeOrderedAndProject —
    per-partition top-k + a k-row driver merge, never a global sort."""
    plan = _spark_plan(_q(spark, sf_dir, "sample_weighted"))
    assert "TakeOrderedAndProject" in plan
    assert _shuffles(_q(spark, sf_dir, "sample_weighted")) == 0


def test_new_relational_ops_stay_jvm_side(spark, sf_dir):
    """No Python-evaluation nodes anywhere in the relational additions —
    the LM trainer included (bigram extraction is zip_with, not a UDF)."""
    for name in (
        "lm_bigram_score",
        "win_gap_islands",
        "agg_markov_transitions",
        "agg_rolling_active_users",
        "text_ttr",
        "agg_mode_per_group",
        "funnel_conversion",
        "join_fuzzy",
        "agg_retention_cohorts",
        "etl_interleave",
        "sample_domain_quota",
        "text_char_entropy",
    ):
        plan = _spark_plan(_q(spark, sf_dir, name))
        assert "EvalPython" not in plan and "MapInPandas" not in plan, name


# --- round-4 session-2 batch -----------------------------------------------


def test_mapside_only_new_ops(spark, sf_dir):
    """split_kfold and text_readability are pure projections — zero
    shuffles, zero Python nodes (codegen'd md5/regex arithmetic)."""
    for name in ("split_kfold", "text_readability"):
        df = _q(spark, sf_dir, name)
        assert _shuffles(df) == 0, name
        assert "BatchEvalPython" not in _spark_plan(df), name


def test_single_shuffle_new_aggs(spark, sf_dir):
    """One hash-partitioned aggregation each: confusion matrix, per-user
    entropy (second fold rides the tiny counts table via AQE/partial),
    EWMA fold, and the DP release."""
    assert _shuffles(_q(spark, sf_dir, "agg_confusion_matrix")) == 1
    assert _shuffles(_q(spark, sf_dir, "ts_ewma")) == 1
    assert _shuffles(_q(spark, sf_dir, "agg_dp_count")) == 1


def test_k_anonymize_broadcasts_group_sizes(spark, sf_dir):
    """The QI group-size table comes back as a broadcast join — the corpus
    itself is never shuffled for the suppression pass."""
    df = _q(spark, sf_dir, "etl_k_anonymize")
    p = _spark_plan(df)
    assert "BroadcastHashJoin" in p
    assert _shuffles(df) == 1  # only the group-size aggregation


def test_geo_radius_is_broadcast_nested_loop(spark, sf_dir):
    """The dim cross product is the DELIBERATE broadcast nested loop
    (tiny build side) — and must never degrade to a non-broadcast
    CartesianProduct."""
    p = _spark_plan(_q(spark, sf_dir, "join_geo_radius"))
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_vectorize_is_arrow_not_row_python(spark, sf_dir):
    """udf_vectorize's Python stays Arrow-batched (ArrowEvalPython),
    never row-at-a-time BatchEvalPython."""
    p = _spark_plan(_q(spark, sf_dir, "udf_vectorize"))
    assert "ArrowEvalPython" in p
    assert "BatchEvalPython" not in p
