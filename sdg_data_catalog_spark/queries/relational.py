"""Relational core: scans, filters, joins, aggregations, windows, sorts,
set operations — all built-in Catalyst operators, all oracle-checkable.

The reference (sdg-ai/sdg_data_catalog) expresses joins as dict lookups and
FK structure (SURVEY.md §2.3: utils/db_connection.py:30, utils/utils.py:18-21,
wrapper_ner.py:53-66); aggregations as Counter()/numpy reductions; top-k as
np.argpartition (dataset_ner/active_learning.py:59). Here each becomes the
idiomatic Spark DataFrame plan and Catalyst picks the physical strategy
(broadcast-hash vs sort-merge, partial aggregation, TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q5-shaped join-agg (SURVEY.md §7 Phase 0).
# lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, date filter, revenue agg.
# nation/region are broadcast (fixed-size dims); the l⋈o⋈c chain shuffles on
# its keys and AQE re-plans at runtime.
# ---------------------------------------------------------------------------
_Q5_ORACLE = """
    SELECT n_name,
           ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS line_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """


@register("q5_revenue_by_nation", oracle=_Q5_ORACLE)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured-route headline Q5: when the persisted per-tier A/B probe
    (scale_ops.ensure_route_probes — see q3_shipping_priority for the
    routing rationale) recorded the 32-bucket orderkey layout as faster,
    the orderkey join rides it exchange-free (scale_ops.q5_bucketed —
    the plan a warehouse runs daily; join-then-agg since r4, see its
    A/B); unprobed tiers and fresh directories fall back to the ad-hoc
    plan (q5_adhoc, same oracle, same answer)."""
    from sdg_data_catalog_spark.queries import scale_ops

    if scale_ops.route_choice(sf_dir, "q5") == "q5_bucketed":
        return scale_ops.q5_bucketed(spark, sf_dir)
    return q5_adhoc(spark, sf_dir)


@register("q5_adhoc", oracle=_Q5_ORACLE)
def q5_adhoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake agg with the join-reduction move a cost-based planner
    would make, done by hand: semi-join reduction down the dim chain —
    region filter → nation → customer (broadcast), so orders shrinks to
    the surviving ~40% BEFORE touching lineitem. The customer-side
    broadcast is correct while |filtered customers| fits a broadcast
    (true through sf100-ish); beyond that drop the hint and AQE
    shuffle-joins orders⋈customer.

    Small-side fast path (same bound-checked move as q3): when statistics
    prove the (o_orderkey, n_name) side fits a broadcast — parquet footer
    row count when the whole table is under the bound, else one
    session-memoized count probe (see _fits_broadcast) — lineitem is
    joined to it directly and aggregated by n_name in one pass: lineitem
    never shuffles at all.

    Above the bound: shuffle-hash join filtered lineitem against the
    reduced orders side, then aggregate by n_name ONCE (25 groups,
    partial map-side). The earlier above-bound form pre-aggregated
    lineitem per orderkey before the join; at ~1.2 filtered lines per
    order the map-side combine shrinks the shuffle barely at all, and
    the ~|orderkeys|-group hash table costs more than it saves —
    measured sf10 interleaved min-of-5 with GC barriers (2026-08-14):
    join-then-agg 2.03 s vs pre-agg 2.44 s, identical results (same A/B
    direction as q5_bucketed). The shuffle-hash build side is the
    reduced orders projection (two narrow columns, ~1/32 per partition);
    with pathological per-key skew drop the hint and let AQE pick."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    dim = (
        nation.join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(dim), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "n_name")
    ordn = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "n_name")
    lif = lineitem.filter(
        # predicate first so it pushes into the parquet scan
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    if _fits_broadcast(sf_dir, "q5_ordn", "orders", ordn):
        return (
            lif.join(F.broadcast(ordn), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("n_name")
            .agg(
                F.round(F.sum(rev), 2).alias("revenue"),
                F.count(F.lit(1)).alias("line_count"),
            )
        )
    return (
        lif.join(ordn.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q1 shape: wide partial-agg scan (the map-side-combine showcase).
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2)      AS sum_qty,
           ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS sum_disc_price,
           ROUND(CAST(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE), 2) AS sum_charge,
           ROUND(CAST(AVG(l_quantity) AS DOUBLE), 4)      AS avg_qty,
           ROUND(CAST(AVG(l_extendedprice) AS DOUBLE), 4) AS avg_price,
           ROUND(CAST(AVG(l_discount) AS DOUBLE), 4)      AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan grouped aggregation, sums-only agg buffers: the three
    averages are derived AFTER the (6-row) aggregate from sums and the
    count instead of using F.avg — Spark's Average otherwise maintains its
    own (sum, count) pair per column, so the rewrite cuts the per-row
    update from 11 buffer slots to 6 (measured 0.66 → 0.62 s min-of-6
    interleaved at sf10, identical output).

    sf10 gap profile (2026-08-14, local[32], min-of-N steady): DuckDB runs
    the whole query in 0.28 s. Spark decomposition: scan+filter+count of
    one column 0.19 s; decoding all 7 needed columns with a global
    (no-key) agg 0.40 s; adding the 2-string-key hash map 0.62-0.70 s.
    Levers tried and rejected: packed-int group key via ascii() (worse —
    per-row ascii eval), concat single key (equal), vectorized agg-map
    conf (worse), fastHashMap capacityBit (noise), 64m/32m
    maxPartitionBytes (noise — minPartitionNum=cores already floors the
    split count), off-heap column vectors (equal). The remaining ~2.2× is
    JVM parquet-decode + hash-agg codegen floor, not plan structure: the
    plan is shuffle-free (6-row exchange), fully pushed down, and the
    per-core decode gap is a constant factor at any cluster size."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("_sq"),
            F.sum("l_extendedprice").alias("_se"),
            F.sum(disc_price).alias("_sd"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("_sc"),
            F.sum("l_discount").alias("_sdisc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round("_sq", 2).alias("sum_qty"),
            F.round("_se", 2).alias("sum_base_price"),
            F.round("_sd", 2).alias("sum_disc_price"),
            F.round("_sc", 2).alias("sum_charge"),
            F.round(F.col("_sq") / F.col("count_order"), 4).alias("avg_qty"),
            F.round(F.col("_se") / F.col("count_order"), 4).alias("avg_price"),
            F.round(F.col("_sdisc") / F.col("count_order"), 4).alias("avg_disc"),
            "count_order",
        )
    )


# ---------------------------------------------------------------------------
# §2.3 join surface
# ---------------------------------------------------------------------------
@register(
    "join_fk",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(COUNT(o_orderkey) AS BIGINT) AS order_count,
           ROUND(CAST(COALESCE(SUM(o_totalprice), 0) AS DOUBLE), 2) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK equi-join (paper⋈paragraph analog, db_connection.py:30) with
    eager aggregation: the join key IS the group key, so orders aggregates
    per custkey BEFORE the join (N:1 row reduction with map-side combine)
    and the left join then attaches one pre-reduced row per customer —
    2.6× faster than join-then-group at sf1, identical results including
    zero-order customers (left join + COALESCE 0). This is the
    "aggregation pushdown through join" rewrite cost-based optimizers do;
    Catalyst doesn't, so it's encoded here. Join strategy for the reduced
    sides stays with Catalyst/AQE."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    oagg = orders.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.sum("o_totalprice").alias("spend"),
    )
    return customer.join(oagg, customer.c_custkey == oagg.o_custkey, "left").select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("order_count"),
        F.round(F.coalesce(F.col("spend"), F.lit(0.0)), 2).alias("total_spend"),
    )


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS customer_count,
           ROUND(CAST(AVG(c_acctbal) AS DOUBLE), 4) AS avg_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dict-lookup join (utils/utils.py:18-21 vocab lookup) as explicit
    broadcast-hash joins against fixed-size dims — no shuffle of the fact."""
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS active_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence probe (fastmatch.py:116 `in` membership) as LEFT SEMI."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("active_customers"))
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= '2000-01-01')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-processed predicate (papers_download.py:49,61 — skip ids with an
    existing artifact) as LEFT ANTI against the done-set. The done-set is
    the *recent* orders (>= 2000-01-01): in the synthetic data every
    customer has some order, so the unfiltered anti-join is vacuously empty
    — the date predicate keeps the check exercising real rows at every sf
    (and is pushed into the build-side scan)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "join_range",
    oracle="""
    WITH tiers(tier, lo, hi) AS (
        VALUES ('small', 0.0, 50000.0),
               ('medium', 50000.0, 150000.0),
               ('large', 150000.0, 1000000000.0)
    )
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS order_count,
           ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS tier_total
    FROM orders JOIN tiers ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY tier
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) range join: fact x broadcast band dim.

    With a broadcast build side this is BroadcastNestedLoopJoin — fine for a
    3-row dim at any fact scale; never do this with two large sides."""
    orders = table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(
        [("small", 0.0, 50_000.0), ("medium", 50_000.0, 150_000.0), ("large", 150_000.0, 1e9)],
        "tier string, lo double, hi double",
    )
    return (
        orders.join(
            F.broadcast(tiers),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("tier_total"),
        )
    )


@register(
    "join_asof",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           MAX(s.ts) AS last_signup_ts
    FROM events e
    LEFT JOIN events s
      ON s.user_id = e.user_id AND s.event_type = 'signup' AND s.ts <= e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the most recent prior signup of the
    same user. Implemented shuffle-once: union both sides, one window pass
    carrying the last signup ts forward — no self-join, no N^2 blowup.
    (Reference has no as-of; SURVEY.md §2.3 new-engine surface.)"""
    events = table(spark, sf_dir, "events")
    tagged = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_signup_ts", F.max("signup_ts").over(w))
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "last_signup_ts")
    )


@register(
    "join_isin_probe",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
    GROUP BY l_returnflag
    """,
)
def join_isin_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership probe (join_theta_semi analog) — pushed-down IN filter."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.4 aggregation surface
# ---------------------------------------------------------------------------
@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-set construction (utils.py:25 label set; ner_pipeline.py:111
    vocab build) as distinct aggregation."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.count(F.lit(1)).alias("order_count"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(c_acctbal) AS DOUBLE), 2) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (region > nation > grand total) via ROLLUP
    over two broadcast dim joins — one shuffle, subtotal rows computed in
    the same aggregate."""
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(AVG(o_totalprice) AS DOUBLE), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations of (status, priority) via CUBE in a
    single aggregate pass over orders."""
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent group-bys (segment-only, nation-only) in ONE pass
    via GROUPING SETS — the SQL form Spark expands without a self-union."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@register(
    "agg_minmax_row",
    oracle="""
    SELECT p_brand,
           ROUND(CAST(AVG(GREATEST(p_retailprice, CAST(p_size * 100 AS DOUBLE))) AS DOUBLE), 4) AS avg_row_max,
           ROUND(CAST(AVG(LEAST(p_retailprice, CAST(p_size * 100 AS DOUBLE))) AS DOUBLE), 4) AS avg_row_min
    FROM part GROUP BY p_brand
    """,
)
def agg_minmax_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise max/argmax (TM_2 cell 34 `highest_prob = max(t1..t8)`) via
    GREATEST/LEAST — codegen'd, no UDF."""
    part = table(spark, sf_dir, "part")
    size_scaled = (F.col("p_size") * 100).cast("double")
    return part.groupBy("p_brand").agg(
        F.round(F.avg(F.greatest(F.col("p_retailprice"), size_scaled)), 4).alias("avg_row_max"),
        F.round(F.avg(F.least(F.col("p_retailprice"), size_scaled)), 4).alias("avg_row_min"),
    )


@register(
    "agg_corpus_stats",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           ROUND(CAST(AVG(len(string_split(text, ' '))) AS DOUBLE), 4) AS avg_tokens,
           ROUND(CAST(AVG(CASE WHEN contains(text, 'data') THEN 1.0 ELSE 0.0 END) AS DOUBLE), 4) AS frac_with_data,
           ROUND(CAST(AVG(n_chars) AS DOUBLE), 4) AS avg_chars
    FROM documents
    """,
)
def agg_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-metric corpus accumulation (data_transformation.py:25-47
    update_statistics) as ONE single-pass agg — no per-metric scans."""
    docs = table(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).cast("bigint").alias("n_tokens"),
        F.round(F.avg(ntok), 4).alias("avg_tokens"),
        F.round(F.avg(F.col("text").contains("data").cast("double")), 4).alias("frac_with_data"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# §2.5 windows / ranking / top-k  +  §2.6 sorts / limits
# ---------------------------------------------------------------------------
@register(
    "win_rownum_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def win_rownum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (active_learning.py np.argpartition analog) via
    row_number window; deterministic tie-break on the unique key."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@register(
    "win_rank_dense",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INTEGER) AS bal_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INTEGER) AS bal_dense_rank,
           CAST(NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS bal_quartile
    FROM customer
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile(4) per nation over account balance — the
    three ranking window shapes in one partitioned pass."""
    customer = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    wt = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return customer.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(wt).alias("bal_quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
                o_orderdate) AS BIGINT) AS days_since_prev,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS next_orderkey
    FROM orders
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each customer's order history: days since previous
    order and next orderkey, deterministic (date, key) window order."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("bigint").alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(CAST(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend: rows-unbounded-preceding SUM window
    with a deterministic (date, key) order."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject (heap
    per partition + merge on driver) — no full sort, the Spark analog of
    np.argpartition (active_learning.py:59)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@register(
    "filter_range_slice",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey ASC
    LIMIT 50 OFFSET 100
    """,
)
def filter_range_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset/limit row window (papers_download.py:51-54 begin/maxlines)."""
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .offset(100)
        .limit(50)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations / dedup
# ---------------------------------------------------------------------------
@register(
    "setop_union",
    oracle="""
    SELECT k FROM (
        SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT s_nationkey AS k FROM supplier
    )
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets — unionByName + distinct, the
    shuffle dedups once."""
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_nationkey").alias("k"))
    b = supplier.select(F.col("s_nationkey").alias("k"))
    return a.unionByName(b).distinct()


@register(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of customer vs supplier nation keys — Catalyst plans a
    left-semi aggregate, no materialized distinct inputs."""
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("k")).intersect(
        supplier.select(F.col("s_nationkey").alias("k"))
    )


@register(
    "setop_except",
    oracle="""
    SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AL loop invariant U = U - x* (ner_pipeline.py:386-401) as EXCEPT:
    customers with a finished order but no open one. Both sides are real
    multi-partition sets (the earlier customer-minus-supplier nationkey
    variant was vacuously empty at every sf)."""
    orders = table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return f.subtract(o)


@register(
    "dedup_exact_keys",
    oracle="""
    SELECT o_custkey, o_orderstatus,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey
    FROM orders GROUP BY o_custkey, o_orderstatus
    """,
)
def dedup_exact_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with deterministic survivor (min key) — dropDuplicates
    keeps an arbitrary row, so scale pipelines should dedup via group-agg
    (one shuffle, deterministic, skew-safe with AQE)."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.min("o_orderkey").alias("first_orderkey")
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters
# ---------------------------------------------------------------------------
@register(
    "scan_pushdown_projection",
    oracle="""
    SELECT l_orderkey, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_quantity > 45
    """,
)
def scan_pushdown_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, predicate-pushed scan: .explain shows PushedFilters +
    2-column ReadSchema (the manual pruning of papers_download.py:48-60,
    done by Catalyst instead)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")) & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_shipdate")


@register(
    "proj_meta",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           substr(o_orderpriority, 1, 1) AS priority_code,
           CASE WHEN o_totalprice >= 100000 THEN 'big' ELSE 'small' END AS size_class
    FROM orders
    """,
)
def proj_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection (paper_processing.py:149-165 d_paper assembly) as
    computed-column select."""
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
        F.when(F.col("o_totalprice") >= 100_000, "big").otherwise("small").alias("size_class"),
    )


# ---------------------------------------------------------------------------
# Additional TPC-H-shaped headline queries (q3/q6/q18 shapes): the classic
# plan shapes — join+agg+top-k, pure filter-agg, and agg-filter-semi-join —
# that exercise TakeOrderedAndProject, full pushdown, and join planning on
# an aggregated build side.
# ---------------------------------------------------------------------------

# q3/q5: broadcast the filtered orders side only when it provably fits
# comfortably in executor memory (rows × ~24 B ≤ ~96 MB). Above the bound,
# fall back to the shuffle join and let AQE convert if runtime sizes allow.
_Q3_BROADCAST_ROW_BOUND = 4_000_000

# Gate statistics. Two tiers, so that building the plan is free in the
# common case and the probe is never paid twice (r3 review: the per-call
# `.count()` was an extra pass over filtered orders⋈customer on EVERY plan
# construction — a real scan tax at 100 TB, and it made plan-only tooling
# trigger cluster jobs):
#   1. parquet footer metadata (driver-side file read, no Spark job): if
#      the WHOLE table holds ≤ bound rows, any filtered subset fits — this
#      settles every sf ≤ ~sf2 instantly;
#   2. otherwise one exact count job, memoized per (sf_dir, gate key) for
#      the session lifetime — the ANALYZE-once pattern; re-running or
#      re-building the query never repeats the probe.
_FOOTER_ROWS: dict[str, int] = {}
_GATE_COUNTS: dict[tuple[str, str], int] = {}


def _table_rows(sf_dir: str, name: str) -> int | None:
    """Total row count from the parquet footer (no Spark job), or None."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    if path not in _FOOTER_ROWS:
        try:
            import pyarrow.dataset as ds

            _FOOTER_ROWS[path] = ds.dataset(path, format="parquet").count_rows()
        except Exception:
            return None
    return _FOOTER_ROWS[path]


def _fits_broadcast(
    sf_dir: str, key: str, base_table: str, df: DataFrame,
    bound: int = _Q3_BROADCAST_ROW_BOUND,
) -> bool:
    """Does `df` (a filtered/semi-joined subset of `base_table`) provably
    hold ≤ `bound` rows? Footer fast path first, else one memoized count."""
    import os

    total = _table_rows(sf_dir, base_table)
    if total is not None and total <= bound:
        return True
    k = (os.path.abspath(sf_dir), key)
    if k not in _GATE_COUNTS:
        _GATE_COUNTS[k] = df.count()
    return _GATE_COUNTS[k] <= bound


_Q3_ORACLE = """
    SELECT l_orderkey,
           ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """


@register("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured-route headline Q3: delegates to the date-clustered twin
    (scale_ops q3_clustered — both date predicates become row-group skips;
    identical oracle/answer) ONLY where a persisted per-tier A/B probe
    (scale_ops.ensure_route_probes, run by bench's layout step outside
    every timed window) recorded the twin as faster. The r9
    layout-exists-so-use-it gate regressed sf0.1 2x — 2x32 tiny clustered
    files cost more task overhead than skipping saves at that scale,
    while at sf10 the same layout wins — so the route is measured, never
    assumed; unprobed tiers (driver correctness runs, fresh dirs) stay on
    the ad-hoc plan. (An ORDERKEY-bucketed q3 twin measured WORSE and
    stays unregistered — see q3_adhoc's plan notes; the date-clustered
    twin attacks the scan component instead of the join.)"""
    from sdg_data_catalog_spark.queries import scale_ops

    if scale_ops.route_choice(sf_dir, "q3") == "q3_clustered":
        return scale_ops._q3_clustered_impl(spark, sf_dir)
    return q3_adhoc(spark, sf_dir)


@register("q3_adhoc", oracle=_Q3_ORACLE)
def q3_adhoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → joins → agg → top-10. Both
    date predicates push into their scans; the filtered BUILDING customers
    broadcast onto orders, and the JOIN RUNS BEFORE THE AGGREGATION: the
    order-date filter keeps ~9% of orders, so joining first discards ~91%
    of lineitem before aggregating anything. The lineitem⋈ords join is the
    scale decision: a SIZE-BOUNDED static broadcast — footer/memoized
    statistics (see _fits_broadcast) pick broadcast-hash when the filtered
    ords side provably fits
    (≤4M rows ≈ 96 MB), which removes the 30M-row lineitem shuffle
    entirely (scan → broadcast probe → partial agg; measured 1.9 → 0.6 s
    at sf10); beyond the bound (≈sf300+) the plan falls back to the
    shuffle join and AQE's runtime-sized broadcast conversion. The
    eager-aggregation form (pre-aggregate lineitem per orderkey, then
    join) measured 2.5× WORSE at sf10 — it aggregates the 95% of lineitem
    the join is about to throw away. The final orderBy+limit is
    TakeOrderedAndProject (per-partition top-k, k-row driver merge).

    sf10 floor profile (2026-08-14, min-of-4 interleaved): this plan
    0.87 s vs DuckDB 0.19 s. A bucketed-layout variant (filtered o_bkt ⋈
    broadcast customer, then bucket-local shuffle-hash against filtered
    li_bkt — skipping the 1.35 M-row broadcast build) measured WORSE,
    1.08 s: one shared broadcast probe beats 32 per-bucket hash builds at
    this selectivity, so a q3 layout twin is deliberately not registered.

    Component decomposition (round 5, same boot, min-of-3 each with GC
    barriers; boot ran ~1.5× slower than r4's — Spark absolutes inflate
    with host IO state while DuckDB's don't, see PERF.md): orders
    scan+date-filter+customer-probe alone 0.43 s (this is the broadcast
    BUILD input — 15 M rows × 3 cols parquet decode, filter already
    pushed); lineitem scan+shipdate-filter+sum alone 0.28 s; the full
    plan adds broadcast serialization + 33 M-row probe + 3 M-group
    partial agg + one 3 M-row exchange + top-10, landing at 1.48 s that
    boot (DuckDB 0.26). The two scans are ~0.7 s of irreducible decode
    that an in-process engine pipelines into one pass; a second A/B of
    the zero-exchange-agg form (broadcast ords probing li_bkt — the agg
    rides the bucket partitioning, no exchange) measured 1.40 vs 1.48 —
    within host noise, so the layout twin stays unregistered. A
    single-exchange plan with no structural scale-killer: at 100× the
    exchange carries only the 3 M aggregated rows, never lineitem."""
    customer = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    lineitem = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    ords = orders.join(
        F.broadcast(customer.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("o_orderkey", "o_orderdate")
    if _fits_broadcast(sf_dir, "q3_ords", "orders", ords):
        ords = F.broadcast(ords)
    return (
        lineitem.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q6_ORACLE = """
    SELECT ROUND(CAST(SUM(l_extendedprice * l_discount) AS DOUBLE), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured-route headline Q6: routes to the shipdate-clustered
    lineitem copy (scale_ops q6_clustered — the 1995-only predicate then
    skips ~85% of row groups on footer stats) only where the persisted
    per-tier A/B probe recorded it as faster (see q3_shipping_priority
    for the routing rationale); unprobed tiers run the ad-hoc
    pure-pushdown plan (q6_adhoc). Identical oracle/answer."""
    from sdg_data_catalog_spark.queries import scale_ops

    if scale_ops.route_choice(sf_dir, "q6") == "q6_clustered":
        return scale_ops._q6_clustered_impl(spark, sf_dir)
    return q6_adhoc(spark, sf_dir)


@register("q6_adhoc", oracle=_Q6_ORACLE)
def q6_adhoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate reaches the parquet scan (range +
    between + comparison), then a single global agg — the pure-pushdown
    benchmark; at 100 TB row-group statistics skip most of the table."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q18_ORACLE = """
    WITH big AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    SELECT c_name, o_orderkey, o_orderdate,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
           ROUND(CAST(sum_qty AS DOUBLE), 2) AS sum_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty FROM lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) q
      ON o_orderkey = q.l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """


@register("q18_large_orders", oracle=_Q18_ORACLE)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured-route headline Q18: when the persisted per-tier A/B probe
    (scale_ops.ensure_route_probes — see q3_shipping_priority for the
    routing rationale) recorded the 32-bucket orderkey layout as faster,
    the dominant exchange (the full-fact per-orderkey quantity sum) is
    free — delegate to the bucketed plan (scale_ops.q18_bucketed,
    identical oracle/answer). Unprobed tiers and fresh directories fall
    back to the ad-hoc plan (q18_adhoc). (r9 data made the measurement
    mandatory here: q18_bucketed was SLOWER than ad-hoc at sf10, 1.82 vs
    1.67 s, yet the existence gate still routed to it.)"""
    from sdg_data_catalog_spark.queries import scale_ops

    if scale_ops.route_choice(sf_dir, "q18") == "q18_bucketed":
        return scale_ops.q18_bucketed(spark, sf_dir)
    return q18_adhoc(spark, sf_dir)


@register("q18_adhoc", oracle=_Q18_ORACLE)
def q18_adhoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregation as the build side of a
    join (the aggregated side shrinks 4000:1 before shuffling), then ordered
    limit. The groupBy-then-join ordering is the scale-critical choice —
    joining first would shuffle every lineitem row."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Declared agg/window surface completions (§2.4 / §2.5 'new-engine' notes)
# ---------------------------------------------------------------------------
@register(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.75), 4) AS p75,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont). Surfaced as scalar p25/p50/p75 columns (array-typed
    outputs break order-insensitive canonicalization downstream). At
    100 TB prefer `approx_percentile` (t-digest, one pass, mergeable
    partials) — exact percentile needs a per-group sort; both are
    registered (see agg_approx_distinct for the sketch pattern)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25D)"), 4).alias("p25"),
        F.round(F.expr("percentile(value, 0.50D)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.75D)"), 4).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "agg_approx_quantiles",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.25), 4) AS p25,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.75), 4) AS p75,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS gk_within_rank_bound
    FROM events GROUP BY event_type
    """,
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (`approx_percentile`, Greenwald-Khanna): ONE
    pass, constant-size mergeable partials — the 100 TB path where the
    exact `percentile` in agg_percentiles needs a per-group sort of every
    value. accuracy=10000 bounds rank error at n/10000 per group.

    Sketch internals differ per engine, so (like sketch_hll_distinct) the
    hash-checked surface is the exact quartiles plus an in-bound boolean:
    the GK guarantee is on RANK, so the check recomputes each approx
    value's rank fraction in its group — frac(value < a) − ε ≤ p ≤
    frac(value ≤ a) + ε with ε = 1/accuracy + 2/n — and an out-of-bound
    sketch flips the boolean and the driver hash. Promoted from rows-only
    in round 4 (VERDICT r3 #6 pattern)."""
    ev = table(spark, sf_dir, "events")
    appr = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.25, 10000).alias("a25"),
        F.percentile_approx("value", 0.50, 10000).alias("a50"),
        F.percentile_approx("value", 0.75, 10000).alias("a75"),
    )
    # rank-bound check and the exact-quartile surface share ONE grouped
    # pass over the probe join (was two more corpus scans on top of the
    # sketch pass — audited 3 events scans, now 2: sketch + verify)
    joined = ev.join(appr, "event_type")
    chk = joined.groupBy("event_type").agg(
        *[
            f
            for q in ("25", "50", "75")
            for f in (
                F.avg((F.col("value") < F.col(f"a{q}")).cast("double")).alias(f"lt{q}"),
                F.avg((F.col("value") <= F.col(f"a{q}")).cast("double")).alias(f"le{q}"),
            )
        ],
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.25D)"), 4).alias("p25"),
        F.round(F.expr("percentile(value, 0.50D)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.75D)"), 4).alias("p75"),
    )
    eps = F.lit(1.0 / 10000) + 2.0 / F.col("n")
    ok = None
    for q, p in (("25", 0.25), ("50", 0.50), ("75", 0.75)):
        c = (F.col(f"lt{q}") - eps <= p) & (F.lit(p) <= F.col(f"le{q}") + eps)
        ok = c if ok is None else (ok & c)
    return chk.select(
        "event_type", "p25", "p50", "p75", "n", ok.alias("gk_within_rank_bound")
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_exact,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS hllpp_within_5pct
    FROM events GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch (`approx_count_distinct`,
    rsd=0.02) — the scale path for cardinality (exact distinct shuffles
    every distinct key; HLL partials are constant-size and mergeable).
    Engines' sketches differ, so the hash-checked surface is the exact
    count plus the estimate's in-bound boolean (±5%, 2.5σ headroom over
    the configured rsd, absolute slack 2 at tiny groups) — the
    sketch_hll_distinct pattern. Promoted from rows-only in round 4."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("users_exact"),
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("user_id", 0.02).alias("est"),
        )
        .select(
            "event_type",
            "users_exact",
            "n",
            (
                F.abs(F.col("est") - F.col("users_exact"))
                <= F.greatest(F.lit(2.0), 0.05 * F.col("users_exact"))
            ).alias("hllpp_within_5pct"),
        )
    )


@register(
    "win_ntile_firstlast",
    oracle="""
    SELECT event_id, event_type,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           ROUND(first_value(value) OVER w, 2) AS first_value,
           ROUND(last_value(value) OVER
                 (PARTITION BY event_type ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_value
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    """,
)
def win_ntile_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / first / last window surface (§2.5). last_value takes the
    full frame explicitly — the default frame ends at CURRENT ROW, a classic
    silent-wrong-answer; the plan stays one window exchange per partition
    key."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.first("value").over(w), 2).alias("first_value"),
        F.round(F.last("value").over(w_full), 2).alias("last_value"),
    )


@register(
    "win_range_between",
    oracle="""
    SELECT event_id, event_type, value,
           ROUND(SUM(value) OVER (PARTITION BY event_type ORDER BY value
                 RANGE BETWEEN 25.0 PRECEDING AND CURRENT ROW), 2) AS sum_near
    FROM events
    """,
)
def win_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (§2.5 rangeBetween): the frame is defined by
    VALUE distance, not row count — ties share a frame, so the result is
    deterministic without a tie-break column."""
    ev = table(spark, sf_dir, "events")
    # float range frames need the SQL form (the DataFrame API frame bounds
    # are integer row/range offsets only)
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.expr(
            "ROUND(SUM(value) OVER (PARTITION BY event_type ORDER BY value "
            "RANGE BETWEEN 25.0 PRECEDING AND CURRENT ROW), 2)"
        ).alias("sum_near"),
    )


@register(
    "win_percent_cume",
    oracle="""
    SELECT event_id, event_type,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume
    FROM events
    WHERE user_id % 7 = 0
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — the relative-standing window functions
    completing the §2.5 ranking surface (the scale-free way to express
    "top 1% by value" without knowing group sizes). Rank-ratio rationals
    like (rank−1)/(n−1) evaluate bit-identically across engines; the
    deterministic (value, event_id) order removes tie ambiguity. One
    window exchange on the partition key, same as every ranking op."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
