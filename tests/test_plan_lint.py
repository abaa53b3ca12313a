"""Plan lint (plans/inspect.py::lint + the CLI audit command): headline
plans are clean, and the two antipatterns are actually caught."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_data_catalog_spark.cli import AUDIT_DEFAULT, main
from sdg_data_catalog_spark.plans.inspect import lint_df


def test_lint_catches_cartesian(spark):
    a = spark.range(100).withColumnRenamed("id", "x")
    b = spark.range(100).withColumnRenamed("id", "y")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    # disable broadcast so the cross join really plans as CartesianProduct
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = a.crossJoin(b).filter(F.col("x") + F.col("y") > 10)
        findings = lint_df(bad)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert any("CartesianProduct" in f for f in findings)


def test_lint_catches_row_udf(spark):
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())
    bad = spark.range(10).select(slow("id").alias("y"))
    findings = lint_df(bad)
    assert any("BatchEvalPython" in f for f in findings)


def test_lint_passes_arrow_udf(spark):
    from pyspark.sql.functions import pandas_udf

    fast = pandas_udf(lambda x: x + 1, "long")
    good = spark.range(10).select(fast("id").alias("y"))
    assert lint_df(good) == []


def test_audit_headline_plans_are_clean(spark, sf_dir):
    summary = main(["audit", "--sf-dir", sf_dir])
    assert summary["audited"] == len(AUDIT_DEFAULT)
    assert summary["flagged"] == {}
