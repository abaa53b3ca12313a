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
