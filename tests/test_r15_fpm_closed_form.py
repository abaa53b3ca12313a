"""r15: fpm_frequent_pairs moved from an MLlib FP-Growth fit (which
mined the full itemset lattice only to keep the declared size-≤2 slice)
to the closed-form basket-combinatorics counts. This differential test
keeps the model-driven formulation pinned as the reference: a live
FP-Growth fit over the same baskets must produce exactly the closed
form's (itemset, freq) rows for the size-≤2 slice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import all_queries


def test_closed_form_matches_fpgrowth(spark, sf_dir):
    from pyspark.ml.fpm import FPGrowth

    got = sorted(
        (r.itemset, r.freq)
        for r in all_queries()["fpm_frequent_pairs"](spark, sf_dir).collect()
    )
    li = table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set(F.col("l_suppkey").cast("string")).alias("items")
    )
    model = FPGrowth(itemsCol="items", minSupport=0.002, minConfidence=0.5).fit(
        baskets
    )
    expect = sorted(
        (r.itemset, r.freq)
        for r in model.freqItemsets.filter(F.size("items") <= 2)
        .select(
            F.concat_ws("+", F.array_sort("items")).alias("itemset"),
            F.col("freq").cast("bigint").alias("freq"),
        )
        .collect()
    )
    assert got == expect
