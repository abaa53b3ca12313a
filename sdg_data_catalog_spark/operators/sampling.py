"""Sampling and dataset-split operators (SURVEY.md §2.7).

The reference's stratified 85/15 split (ner_pipeline.py:71-77,
train_test_split(stratify=has_entity, random_state=42)) maps to
sampleBy + left-anti complement: per-stratum FRACTION semantics (not exact
counts) — the only distribution-friendly contract, since exact-count
stratified sampling needs a global per-stratum pass."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_split(
    df: DataFrame, stratum_col: str, train_fraction: float, key_cols: list[str], seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """(train, test): sampleBy per-stratum sample + anti-join complement.
    Deterministic for a fixed seed AND fixed partitioning of df (Spark's
    sample is per-partition pseudo-random — repartitioning changes the
    draw, so split once and persist at scale)."""
    strata = [r[0] for r in df.select(stratum_col).distinct().collect()]
    fractions = {s: train_fraction for s in strata}
    train = df.sampleBy(stratum_col, fractions, seed)
    test = df.join(train.select(*key_cols), key_cols, "left_anti")
    return train, test


def sample_fraction(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Plain Bernoulli sample (data_transformation.py:119-125 seed pool)."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_split_hash(
    df: DataFrame, stratum_col: str, train_fraction: float, key_col: str
) -> tuple[DataFrame, DataFrame]:
    """(train, test) by deterministic hash ranking — the reproducible twin
    of `stratified_split`: within each stratum, rank rows by
    md5(key) (tie-broken by the key itself) and take the first
    floor(train_fraction·n_s) as train. Engine- and run-independent
    (no RNG, no partitioning sensitivity), so the same split can be
    recomputed anywhere — the property a training pipeline actually needs
    from a split. One hash-partitioned window per stratum; the per-stratum
    size rides the same window as a COUNT frame (no second scan)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    w_n = Window.partitionBy(stratum_col)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_ns", F.count(F.lit(1)).over(w_n)
    )
    cut = F.floor(F.lit(train_fraction) * F.col("_ns"))
    train = ranked.filter(F.col("_rn") <= cut).drop("_rn", "_ns")
    test = ranked.filter(F.col("_rn") > cut).drop("_rn", "_ns")
    return train, test
