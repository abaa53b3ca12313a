"""Round-13 batch 1: column-level cross-engine reconciliation.

- ``dq_column_checksums`` — the drill-down ``dq_table_checksum`` hands an
  operator when a table fingerprint mismatches: per (table, column), the
  null count and an order-invariant checksum of the column alone (the
  same null-safe coalesce-to-chr(1) + 32-bit-md5-prefix mod 1e9+7 idiom,
  surfaced as BIGINT). A replication diff that moves one column's values
  flips exactly that column's row, so the blast radius of a divergence
  is localized without re-scanning with ad-hoc queries. One scan per
  table computes every column's pair of aggregates (a single agg node —
  no per-column scans), then a stack() unpivot to rows; at any scale the
  shuffle is one row per table.

Reference analog: none direct — SURVEY §2.11 north-star surface
(cross-engine reconciliation, extending the round-12/13 fingerprint op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_P = 1_000_000_007

_COLSETS = (
    ("orders", ("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")),
    ("customer", ("c_custkey", "c_mktsegment", "c_nationkey")),
)


def _col_oracle(tbl: str, col: str) -> str:
    return f"""
    SELECT CAST('{tbl}' AS VARCHAR) AS tbl, CAST('{col}' AS VARCHAR) AS col_name,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(SUM(CAST(CAST(('0x' || substr(md5(
             coalesce(CAST({col} AS VARCHAR), chr(1))), 1, 8))
             AS BIGINT) % {_P} AS DECIMAL(38,0))) % {_P} AS BIGINT) AS checksum
    FROM {tbl}"""


@register(
    "dq_column_checksums",
    oracle=" UNION ALL ".join(
        _col_oracle(t, c) for t, cols in _COLSETS for c in cols
    )
    + " ORDER BY tbl, col_name",
)
def dq_column_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null counts and order-invariant checksums for the
    audited tables — see module docstring. The hash input is the single
    column coalesced to chr(1) (null-safe, byte-identical across
    engines); the per-row 32-bit md5 prefix is reduced mod 1e9+7, summed
    exactly in a DECIMAL(38,0) carrier, and reduced again to a BIGINT.
    One agg computes all 2·n_cols aggregates in a single table scan;
    stack() unpivots the 1-row result to (col_name, n_nulls, checksum)
    rows driver-light."""

    def colsums(df: DataFrame, tbl: str, cols) -> DataFrame:
        aggs = []
        for c in cols:
            h = (
                F.conv(
                    F.substring(
                        F.md5(F.coalesce(F.col(c).cast("string"), F.lit("\x01"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % _P
            ).cast("decimal(38,0)")
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"n__{c}")
            )
            aggs.append((F.sum(h) % _P).cast("bigint").alias(f"h__{c}"))
        ag = df.agg(*aggs)
        stack_args = ", ".join(f"'{c}', n__{c}, h__{c}" for c in cols)
        return ag.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, checksum)"
        ).select(F.lit(tbl).alias("tbl"), "col_name", "n_nulls", "checksum")

    parts = [
        colsums(table(spark, sf_dir, tbl), tbl, cols) for tbl, cols in _COLSETS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl", "col_name")
