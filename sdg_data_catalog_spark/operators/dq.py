"""Declarative single-scan constraint reports — the reusable half of the
`dq_constraints` query (queries/sketches_curation.py) in gate-callable form.

A report is ONE aggregate over the batch (every check folds into the same
scan — no per-check jobs, no self-joins), melted to (check_name,
violations) rows. `sources.atomic.publish(gate=...)` consumes exactly this
shape: any non-zero violation quarantines the staged snapshot and leaves
the LATEST pointer untouched.

Reference analog: the ad-hoc sanity queries around the reference's SQLite
writer (sdg-ai/sdg_data_catalog utils/db_connection.py:61-87) — which ran,
if at all, AFTER rows were already committed. Gating the atomic pointer
flip is the 100 TB-safe ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violations(cond: Column) -> Column:
    """Aggregate expression counting rows that violate (i.e. satisfy) cond."""
    return F.count(F.when(cond, 1))


def constraint_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Fold every check into one aggregate pass and melt to rows.

    checks maps check_name -> violation-COUNT aggregate expression (use
    `violations(cond)` for row predicates; PK uniqueness folds as
    count(*) - count_distinct(pk)). Output: (check_name, violations)."""
    agg = df.agg(
        *[expr.cast("bigint").alias(name) for name, expr in checks.items()]
    )
    stack_args = ", ".join(f"'{name}', {name}" for name in checks)
    return agg.selectExpr(
        f"stack({len(checks)}, {stack_args}) AS (check_name, violations)"
    )


def user_counts_gate(df: DataFrame) -> DataFrame:
    """Publish gate for the streaming per-user count state (streaming/
    windows.py::merge_counts_batch): a merge bug that duplicated a user or
    produced a non-positive count must fail the micro-batch loudly instead
    of becoming LATEST."""
    return constraint_report(
        df,
        {
            "user_id_unique": F.count(F.lit(1)) - F.count_distinct("user_id"),
            "n_events_positive": violations(
                F.col("n_events").isNull() | (F.col("n_events") <= 0)
            ),
        },
    )


def document_gate(df: DataFrame) -> DataFrame:
    """Publish gate for documents-shaped snapshots (doc_id PK + domains)."""
    return constraint_report(
        df,
        {
            "doc_id_unique": F.count(F.lit(1)) - F.count_distinct("doc_id"),
            "doc_id_not_null": violations(F.col("doc_id").isNull()),
            "n_chars_nonnegative": violations(
                F.col("n_chars").isNull() | (F.col("n_chars") < 0)
            ),
        },
    )
