"""The remaining classic TPC-H shapes (q2/q8/q9/q11/q12/q16/q20/q21),
adapted to the driver's slimmed schema.

The testdata has no partsupp table and lineitem carries only l_shipdate
(no commit/receipt dates, no shipmode), so each query keeps its CLASSIC
PLAN SHAPE — the thing worth regression-testing at scale — while its
predicates are re-expressed over the available columns:

  q2  correlated per-part MIN subquery over a 4-dim snowflake
      (partsupp → the distinct (l_partkey, l_suppkey) shipped-by relation)
  q8  two-level market-share ratio per year (volume CASE inside / total)
  q9  profit per nation-year over a LIKE-filtered part set
      (ps_supplycost → p_retailprice as the unit-cost column)
  q11 grouped value with a global-scalar HAVING threshold
  q12 late-shipment conditional counts (receipt-vs-commit lateness →
      l_shipdate more than 90 days after o_orderdate)
  q16 count-distinct suppliers per part group with a NOT-IN exclusion
  q20 nested semi-join: suppliers whose shipped quantity of a part family
      dominates that part's per-supplier average (availqty → window share)
  q21 the double-correlated EXISTS / NOT-EXISTS: multi-supplier orders
      where exactly ONE supplier shipped late — decorrelated into one
      per-order aggregate instead of two correlated re-scans

Money aggregates follow the exact-decimal pattern established in
q10_returned_items (tpch_extra.py): the inputs sit on a 2-dp grid, so the
decimal cast is exact and the sum is order-independent — both engines hash
identically without ulp luck.

Reference parity note: the reference has no relational engine (joins are
dict lookups, SURVEY.md §2.3, utils/utils.py:18-21); these register under
the new-engine surface like q1/q3/q5/q6/q18.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

# Exact money arithmetic: inputs are on a 2-dp grid (verified in round 1),
# so DECIMAL(18,2) casts are exact and sums are order-independent.
_DEC = "decimal(18,2)"


def _dec(col: str) -> F.Column:
    return F.col(col).cast(_DEC)


@register(
    "q2_min_acctbal_supplier",
    oracle="""
    WITH shipped AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem)
    SELECT ROUND(CAST(s_acctbal AS DOUBLE), 2) AS s_acctbal,
           s_name, n_name, p_partkey, p_name
    FROM shipped
    JOIN part     ON p_partkey = pk
    JOIN supplier ON s_suppkey = sk
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_size <= 5 AND p_type = 'SMALL'
      AND s_acctbal = (
          SELECT MIN(s2.s_acctbal)
          FROM shipped ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.sk
          JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.pk = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal, p_partkey, s_name
    LIMIT 100
    """,
)
def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the EU supplier(s) with the
    minimum account balance among suppliers that shipped it (partsupp stands
    in as the distinct shipped-by relation; min supply cost → min acctbal).

    The correlated MIN subquery decorrelates into a window MIN partitioned
    by part — ONE pass over the shipped relation instead of a re-scan per
    part. Supplier/nation/region flatten into one filtered broadcast; the
    only shuffle is the distinct on (partkey, suppkey), which at 100 TB is
    also the natural bucketing key for the relation."""
    shipped = (
        table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
    ).distinct()
    part = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 5) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_name")
    )
    eu_supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(table(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(table(spark, sf_dir, "region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("pk")
    return (
        shipped.join(F.broadcast(eu_supp), F.col("sk") == F.col("s_suppkey"))
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .select(
            F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
        )
        .orderBy("s_acctbal", "p_partkey", "s_name")
        .limit(100)
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                      / SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
               n2.n_name AS nation
        FROM lineitem
        JOIN part      ON p_partkey = l_partkey
        JOIN supplier  ON s_suppkey = l_suppkey
        JOIN orders    ON o_orderkey = l_orderkey
        JOIN customer  ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for one part
    type, per year. The nation dim joins twice under different roles (the
    customer side restricts the market, the supplier side labels the
    competitor); the share is a conditional aggregate over ONE pass — no
    second scan for the denominator. Part (filtered) and both nation sides
    broadcast; the two fact-fact joins (lineitem⋈orders⋈customer) are the
    only shuffles and both shrink as the date filter pushes into orders."""
    part = (
        table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    eu_cust = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("c_custkey")
    )
    supp_nation = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("s_nk"),
        )
        .select("s_suppkey", "nation")
    )
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(eu_cust, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), F.col("s_suppkey") == F.col("l_suppkey"))
        .withColumn("volume", volume)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                (
                    F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(F.lit(0).cast(_DEC)))
                    / F.sum("volume")
                ).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, o_year, ROUND(CAST(SUM(amount) AS DOUBLE), 2) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 - CAST(0.2 AS DECIMAL(3,1)) * CAST(p_retailprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,0)) AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year over a
    name-LIKE-filtered part family (unit cost: ps_supplycost →
    0.2 × p_retailprice). The LIKE filter prunes part BEFORE its broadcast;
    lineitem⋈orders is the one big shuffle; the amount expression is exact
    decimal so the engines' sum order can't flip a rounding boundary."""
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp_nation = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    amount = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - (
        F.lit(0.2).cast("decimal(3,1)")
        * _dec("p_retailprice")
        * F.col("l_quantity").cast("decimal(18,0)")
    )
    return (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .withColumn("amount", amount)
        .groupBy(F.col("nation"), F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(F.sum("amount").cast("double"), 2).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH v AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,0))) AS val
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_8')
        GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(CAST(val AS DOUBLE), 2) AS value
    FROM v
    WHERE val > (SELECT SUM(val) * CAST(0.002 AS DECIMAL(4,3)) FROM v)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value restricted to one nation group, kept
    only where it exceeds a fraction of the GLOBAL total — the grouped-agg +
    scalar-subquery-HAVING pattern. The global total is an empty-frame
    window over the PER-PART AGGREGATE (q15's pattern): a naive
    `crossJoin(v.agg(total))` evaluates the aggregate subtree twice — two
    full lineitem scans, verified in the physical plan and gated against in
    tests/test_plans.py — while the window reuses the one evaluation. The
    window's single partition holds one row per part (dim-bounded), never
    fact-table rows. All sums exact decimal, so the threshold comparison
    can't flip on summation order."""
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name").isin("NATION_3", "NATION_8"))
        .select("s_suppkey")
    )
    v = (
        table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * F.col("l_quantity").cast("decimal(18,0)")).alias("val"))
    )
    # broadcast the 1-row grand total instead of an unpartitioned window —
    # v is partkey-grained (grows with SF), so the window's single-partition
    # pass is the avoidable scale hazard here; v persists so the total
    # reuses the aggregate (ONE lineitem scan, tests/test_plans.py)
    from pyspark import StorageLevel

    v = v.persist(StorageLevel.MEMORY_AND_DISK)
    tot = v.agg(F.sum("val").alias("tot"))
    return (
        v.crossJoin(F.broadcast(tot))
        .withColumn("threshold", F.col("tot") * F.lit(0.002).cast("decimal(4,3)"))
        .filter(F.col("val") > F.col("threshold"))
        .select("l_partkey", F.round(F.col("val").cast("double"), 2).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q12_late_shipments",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts over late shipments
    (receipt-vs-commit lateness → shipped more than 90 days after the order
    date; shipmode → l_linestatus as the group key). The year filter pushes
    into the lineitem scan; the cross-table lateness predicate runs as the
    join residual; both CASE branches fold into one partial aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") >= F.date_add(F.col("o_orderdate"), 90)),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q16_supplier_relation",
    oracle="""
    WITH shipped AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT sk) AS BIGINT) AS supplier_cnt
    FROM shipped
    JOIN part ON p_partkey = pk
    WHERE p_brand <> 'Brand#11' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND sk NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group, excluding a
    NOT-IN supplier set ("complaints" → negative account balance). The NOT IN
    becomes a LEFT ANTI join against the (tiny, broadcast) excluded set —
    valid because s_suppkey is non-null; the part filters broadcast into the
    shipped-by relation before the count-distinct shuffle."""
    shipped = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#11")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    )
    return (
        shipped.join(F.broadcast(part), F.col("pk") == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), F.col("sk") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("sk")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_part_promotion",
    oracle="""
    WITH qty AS (
        SELECT l_partkey AS pk, l_suppkey AS sk, SUM(l_quantity) AS sup_qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    ranked AS (
        SELECT sk, sup_qty, AVG(sup_qty) OVER (PARTITION BY pk) AS part_avg
        FROM qty
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT sk FROM ranked WHERE sup_qty > 1.5 * part_avg)
    ORDER BY s_suppkey
    """,
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers qualified through a nested subquery over a
    part family's shipment volumes (availqty > half demand → shipped more
    than 1.5× the part's per-supplier average). Decorrelated into ONE
    grouped pass + a window AVG over the (part, supplier) sums; the final
    IN becomes a LEFT SEMI join. Quantity sums are integral-valued doubles
    (exact in int range), so the threshold compare is engine-stable."""
    part = (
        table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    )
    qty = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum("l_quantity").alias("sup_qty"))
    )
    w = Window.partitionBy("pk")
    qualified = (
        qty.withColumn("part_avg", F.avg("sup_qty").over(w))
        .filter(F.col("sup_qty") > 1.5 * F.col("part_avg"))
        .select("sk")
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(qualified, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order (lateness: shipped >60 days after the order date —
    the receipt-vs-commit columns don't exist in this schema). The classic
    form is a double-correlated EXISTS / NOT-EXISTS that re-scans lineitem
    twice per outer row; here both collapse into ONE per-order aggregate —
    count of distinct suppliers and of distinct LATE suppliers — and the
    correlated predicates become `n_supp > 1 AND n_late = 1` on the joined
    stats. One extra shuffle on l_orderkey replaces two correlated scans;
    the oracle keeps the textbook correlated form as the semantic check."""
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    per_order = lo.groupBy("o_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
    )
    waiting = (
        lo.filter(late)
        .join(per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)), "o_orderkey")
        .select("o_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        waiting.join(
            F.broadcast(table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count_distinct("o_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
