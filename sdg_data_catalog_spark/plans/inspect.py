"""Physical-plan inspection utilities.

The engine ships no custom Catalyst rules (SURVEY.md §4.2: configuration
only — AQE, broadcast thresholds, Arrow); what it ships instead is
*verification* that Catalyst produced the plan a 100 TB deployment needs.
These helpers read the formatted/executed plan strings and answer the
plan-quality questions tests/test_plans.py asserts and PERF.md documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text for a DataFrame's optimized physical plan."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) plan string. The caller must have materialized THIS
    DataFrame (e.g. via collect()) — a write() plans separately, leaving
    isFinalPlan=false here."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(plan: str) -> list[str]:
    """Every PushedFilters line in the plan (one per parquet scan)."""
    return [l.strip() for l in plan.splitlines() if "PushedFilters" in l]


def read_schemas(plan: str) -> list[str]:
    """Every ReadSchema line — what each scan actually materializes."""
    return [l.strip() for l in plan.splitlines() if "ReadSchema" in l]


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan


def has_pathological_join(plan: str) -> bool:
    """Joins that do O(n·m) work — never acceptable on fact tables."""
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def shuffle_exchanges(plan: str) -> int:
    """Shuffle (non-broadcast) exchange count — each one is a full
    repartition of its input at scale."""
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def python_eval_nodes(plan: str) -> list[str]:
    """Python-evaluation operators present in the plan. Empty for pure
    relational paths; ArrowEvalPython/MapInPandas are the *intended*
    vectorized nodes for UDF surfaces, BatchEvalPython is the slow
    row-at-a-time fallback that should never appear."""
    return [n for n in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas") if n in plan]


def lint(plan: str) -> list[str]:
    """Plan lint: the antipatterns a query must not ship with at 100 TB.
    Returns human-readable findings (empty == clean). Rules are
    deliberately few and high-precision:

    - CartesianProduct: an unbounded n·m join — the join condition never
      reached the planner as an equi-key. (BroadcastNestedLoopJoin is NOT
      flagged: it appears legitimately for 1-row scalar cross joins and
      bound-checked tiny sides; CartesianProduct has no such excuse.)
    - BatchEvalPython: a row-at-a-time Python UDF — every row pays a
      pickle round-trip; Arrow nodes (ArrowEvalPython/MapInPandas) are
      the intended Python path.
    """
    findings = []
    if "CartesianProduct" in plan:
        findings.append(
            "CartesianProduct: unbounded cartesian join — no equi-key reached the planner"
        )
    if "BatchEvalPython" in plan:
        findings.append(
            "BatchEvalPython: row-at-a-time Python UDF — use pandas_udf/mapInPandas or built-ins"
        )
    return findings


def lint_df(df: DataFrame) -> list[str]:
    """Lint a DataFrame's optimized physical plan (see `lint`)."""
    return lint(formatted_plan(df))


def codegen_spans(executed: str) -> int:
    """Whole-stage-codegen span count: '*(n)' prefixes in the executed plan."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", executed)))
