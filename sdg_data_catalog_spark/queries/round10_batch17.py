"""Round-10 operator batch 17: primary-key audits, brand return rates,
and shipping-latency percentiles.

- ``dq_primary_key_audit`` — the PK side of the integrity pair with
  dq_referential_orphans: per table, exact row / distinct-key / dup-key
  counts and the uniqueness verdict. Each table's census is one grouped
  pass; 'zero duplicates' becomes a certified fact instead of an
  assumption every downstream join silently depends on.
- ``agg_return_rate_by_brand`` — return rate per part brand (the
  retail quality metric): lineitem return flags joined to the
  broadcast part dimension, exact integer counts, rate as an integer
  DIV image, plus the returned-revenue exposure in exact micro cents.
- ``win_ship_latency_percentiles`` — order→ship latency p50/p90/p99
  per order priority from the exact integer day census (the bounded-
  census + in-bucket rank arithmetic of agg_hdr_percentiles /
  agg_lorenz_curve — no global sort, no per-order window): the
  fulfillment SLA readout.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000
_PCTS = (50, 90, 99)


@register(
    "dq_primary_key_audit",
    oracle="""
    SELECT 'customer.c_custkey' AS pk,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT)
             AS n_distinct,
           (SELECT COUNT(*) FROM customer)
             = (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS is_unique
    UNION ALL
    SELECT 'documents.doc_id',
           (SELECT COUNT(*) FROM documents),
           (SELECT COUNT(DISTINCT doc_id) FROM documents),
           (SELECT COUNT(*) FROM documents)
             = (SELECT COUNT(DISTINCT doc_id) FROM documents)
    UNION ALL
    SELECT 'events.event_id',
           (SELECT COUNT(*) FROM events),
           (SELECT COUNT(DISTINCT event_id) FROM events),
           (SELECT COUNT(*) FROM events)
             = (SELECT COUNT(DISTINCT event_id) FROM events)
    UNION ALL
    SELECT 'orders.o_orderkey',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
           (SELECT COUNT(*) FROM orders)
             = (SELECT COUNT(DISTINCT o_orderkey) FROM orders)
    UNION ALL
    SELECT 'part.p_partkey',
           (SELECT COUNT(*) FROM part),
           (SELECT COUNT(DISTINCT p_partkey) FROM part),
           (SELECT COUNT(*) FROM part)
             = (SELECT COUNT(DISTINCT p_partkey) FROM part)
    ORDER BY pk
    """,
)
def dq_primary_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness census for five declared keys: per table
    one pass computing rows + distinct keys (count_distinct partial-
    aggregates; no key list ever materializes), verdict by integer
    equality — the PK half of the integrity gate beside
    dq_referential_orphans."""

    def audit(name, df, key):
        return df.agg(
            F.lit(name).alias("pk"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.col(key)).cast("bigint").alias("n_distinct"),
        ).select(
            "pk",
            "n_rows",
            "n_distinct",
            (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
        )

    out = (
        audit("customer.c_custkey", table(spark, sf_dir, "customer"), "c_custkey")
        .unionAll(
            audit("documents.doc_id", table(spark, sf_dir, "documents"), "doc_id")
        )
        .unionAll(
            audit("events.event_id", table(spark, sf_dir, "events"), "event_id")
        )
        .unionAll(
            audit("orders.o_orderkey", table(spark, sf_dir, "orders"), "o_orderkey")
        )
        .unionAll(audit("part.p_partkey", table(spark, sf_dir, "part"), "p_partkey"))
    )
    return out.orderBy("pk")


@register(
    "agg_return_rate_by_brand",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(1000000 * SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                // COUNT(*) AS BIGINT) AS return_rate_x1e6,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                    THEN CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS returned_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    ORDER BY brand
    """,
)
def agg_return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate and returned-revenue exposure per part brand: one
    lineitem pass joined to the broadcast part dimension, exact integer
    counts and cent images, rate as an integer DIV image — the retail
    quality cut that tells merchandising which brands to audit. Rollup
    is partial-agg friendly into |brands| groups."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ret = (F.col("l_returnflag") == "R").cast("bigint")
    return (
        li.select(
            "l_partkey",
            ret.alias("is_ret"),
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
            F.sum("is_ret").cast("bigint").alias("n_returned"),
            F.expr(
                "CAST(1000000 * SUM(is_ret) DIV COUNT(*) AS BIGINT)"
            ).alias("return_rate_x1e6"),
            F.sum(F.when(F.col("is_ret") == 1, F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("returned_cents"),
        )
        .orderBy("brand")
    )


@register(
    "win_ship_latency_percentiles",
    oracle=f"""
    WITH lat AS (
        SELECT o.o_orderpriority AS priority,
               (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                 // {_DAY_US} AS days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    census AS (
        SELECT priority, days, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lat GROUP BY priority, days
    ),
    cum AS (
        SELECT priority, days, cnt,
               SUM(cnt) OVER (PARTITION BY priority ORDER BY days) AS cum_cnt,
               SUM(cnt) OVER (PARTITION BY priority) AS n
        FROM census
    )
    SELECT priority,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_lineitems,
           {', '.join(
               "CAST(MIN(CASE WHEN cum_cnt >= (" + str(p) + " * n + 99) // 100"
               " THEN days END) AS BIGINT) AS p" + str(p)
               for p in _PCTS)}
    FROM cum GROUP BY priority ORDER BY priority
    """,
)
def win_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency p50/p90/p99 in whole days per order priority:
    exact order statistics from the bounded (priority × days) census —
    the percentile day is the smallest day whose cumulative count
    reaches ceil(p·n/100), pure integer arithmetic on census prefix
    sums (per-priority windows over a metadata-sized table; the corpus
    work is one join + one grouped pass). The fulfillment-SLA readout
    beside q12's late-shipment classes."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            f"CAST((unix_micros(CAST(l_shipdate AS TIMESTAMP))"
            f" - unix_micros(CAST(o_orderdate AS TIMESTAMP)))"
            f" DIV {_DAY_US} AS BIGINT)"
        ).alias("days"),
    )
    census = (
        lat.groupBy("priority", "days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("priority").orderBy("days")
    w_all = Window.partitionBy("priority")
    cum = census.select(
        "priority",
        "days",
        F.sum("cnt").over(w).alias("cum_cnt"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    aggs = [F.any_value("n").cast("bigint").alias("n_lineitems")]
    for p in _PCTS:
        aggs.append(
            F.min(
                F.when(
                    F.col("cum_cnt")
                    >= F.expr(f"({p} * n + 99) DIV 100"),
                    F.col("days"),
                )
            )
            .cast("bigint")
            .alias(f"p{p}")
        )
    return cum.groupBy("priority").agg(*aggs).orderBy("priority")
