"""Round-8 operator batch 24: ABC classification, growth accounting,
and cluster balance.

- ``agg_abc_analysis`` — ABC inventory classification of parts by
  revenue (A = parts covering the first 80% of cumulative revenue,
  B = to 95%, C = the tail): THE warehouse prioritization readout,
  computed with a distributed global rank (never a single-partition
  revenue sort).
- ``agg_new_returning_split`` — per-day new vs returning active users
  (first-ever-event day vs repeat): the growth-accounting split every
  weekly business review opens with, exact (no sketch) via the
  first-occurrence-day table.
- ``curation_cluster_balance`` — normalized entropy of the
  cluster_kmeans assignment distribution: balance 1 = clusters split
  the corpus evenly, →0 = one cluster swallowed everything (the check
  run before trusting per-cluster curation quotas — the learned-cluster
  twin of curation_domain_mix's source balance).

Determinism: ABC cut points are integer cross-products over exact
revenue-cent images ranked by the two-phase running total; the growth
split is exact integer set accounting; balance entropy sums
FLOOR(p·ln p·10⁹) images of exact cluster-count ratios.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.queries.scoring_sampling import _kmeans_oracle_round

_DAY_US = 86_400_000_000


@register(
    "agg_abc_analysis",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS np FROM rev),
    ranked AS (
      SELECT cents,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum
      FROM rev
    ),
    classed AS (
      SELECT CASE WHEN (cum - cents) * 100 < t * 80 THEN 'A'
                  WHEN (cum - cents) * 100 < t * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents
      FROM ranked CROSS JOIN tot
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(cents) AS DOUBLE) / 100, 2) AS revenue,
           ROUND(CAST(SUM(cents) AS DOUBLE)
                 / (SELECT t FROM tot), 6) AS revenue_share
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
)
def agg_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classification of parts by discounted revenue: rank parts by
    revenue descending; a part is class A while the revenue ABOVE it is
    under 80% of the total, B under 95%, C otherwise (the prefix-
    exclusive convention, so the part that crosses a boundary still
    belongs to the higher class). Revenue is exact integer cents; the
    cumulative walk is the two-phase running total on the packed
    (−cents, partkey) order (a revenue ORDER BY window over all parts
    is the classic single-reducer sort this avoids); class cuts are
    integer cross-products (cum·100 < t·80) that cannot ulp-flip. The
    three-row summary carries counts, revenue, and shares."""
    from sdg_data_catalog_spark.operators.curation import running_total

    li = table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=True)  # part-grained; total + walk consume it
    )
    tot = rev.agg(
        F.sum("cents").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("np"),
    )
    # descending revenue order as an ascending integer key:
    # (max_cents - cents) would need the max; use the negation via a
    # large bias-free trick — running_total orders ASC, so key on
    # (-cents, partkey) packed as a string-safe pair via two-phase rank
    keyed = rev.select(
        "l_partkey",
        "cents",
        F.format_string(
            "%020d:%012d", (-F.col("cents") + F.lit(10**18)).cast("long"),
            F.col("l_partkey"),
        ).alias("key"),
    )
    walk = running_total(keyed, "key", F.col("cents"), "cum")
    classed = walk.crossJoin(F.broadcast(tot)).select(
        F.when((F.col("cum") - F.col("cents")) * 100 < F.col("t") * 80, "A")
        .when((F.col("cum") - F.col("cents")) * 100 < F.col("t") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "cents",
        "t",
    )
    return (
        classed.groupBy("abc_class", "t")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("rev_cents"),
        )
        .select(
            "abc_class",
            "n_parts",
            F.round(F.col("rev_cents").cast("double") / 100, 2).alias("revenue"),
            F.round(
                F.col("rev_cents").cast("double") / F.col("t"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@register(
    "agg_new_returning_split",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day
      FROM events
    ),
    first_day AS (
      SELECT user_id, MIN(day) AS fd FROM du GROUP BY user_id
    )
    SELECT CAST(du.day AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(SUM(CASE WHEN du.day = f.fd THEN 1 ELSE 0 END) AS BIGINT)
             AS new_users,
           CAST(SUM(CASE WHEN du.day > f.fd THEN 1 ELSE 0 END) AS BIGINT)
             AS returning_users,
           ROUND(CAST(SUM(CASE WHEN du.day = f.fd THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS new_ratio
    FROM du JOIN first_day f ON f.user_id = du.user_id
    GROUP BY du.day ORDER BY day
    """,
)
def agg_new_returning_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day new vs returning active users: a user is NEW on their
    first-ever-event day and RETURNING on every later active day — the
    growth-accounting split (acquisition vs retention) a weekly review
    opens with, computed EXACTLY (the HLL rolling-WAU sketch answers a
    different, windowed question). One distinct pass to (user, day),
    one user-grained MIN for the first day, one join back — the
    first-occurrence-flag trick of win_cumulative_distinct applied at
    user grain. All counts exact integers; one ratio division."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    du = ev.distinct().localCheckpoint(eager=True)  # (user, day); 2 consumers
    first_day = du.groupBy("user_id").agg(F.min("day").alias("fd"))
    return (
        du.join(first_day, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.sum(F.when(F.col("day") == F.col("fd"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("fd"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
        .select(
            F.col("day").cast("bigint").alias("day"),
            "active_users",
            "new_users",
            "returning_users",
            F.round(
                F.col("new_users").cast("double") / F.col("active_users"), 6
            ).alias("new_ratio"),
        )
        .orderBy("day")
    )


@register(
    "curation_cluster_balance",
    oracle="""
    WITH c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 4)
    ),"""
    + ",".join(_kmeans_oracle_round(i) for i in (1, 2, 3))
    + """,
    final AS (SELECT e.vec_id, c.cid,
             list_distance(list_transform(e.embedding,
                                           x -> CAST(x AS DOUBLE)),
                           c.cent)^2 AS d
      FROM embeddings e CROSS JOIN c3f c),
    asg AS (
      SELECT vec_id, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY d, cid) AS rn
        FROM final) WHERE rn = 1
    ),
    cnt AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS c FROM asg GROUP BY cid),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS k FROM cnt),
    ent AS (
      SELECT CAST(SUM(CAST(FLOOR(-(CAST(c AS DOUBLE) / t.n)
                                 * ln(CAST(c AS DOUBLE) / t.n) * 1e9)
                           AS BIGINT)) AS BIGINT) AS h_nano,
             MAX(t.n) AS n, MAX(t.k) AS k
      FROM cnt CROSS JOIN tot t
    )
    SELECT n, k,
           ROUND(h_nano / 1e9, 6) AS entropy,
           ROUND(h_nano / 1e9 / ln(CAST(k AS DOUBLE)), 6) AS balance
    FROM ent
    """,
)
def curation_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized entropy of the cluster_kmeans assignment sizes:
    balance = H(cluster shares)/ln k ∈ [0, 1] — 1 when the k clusters
    split the corpus evenly, →0 when one cluster absorbed everything
    (in which case per-cluster curation quotas, semantic-dedup budgets,
    and diversity sampling all silently degenerate — this is the gate
    that catches it). Cluster counts come from the deterministic fit;
    per-cluster −p·ln p terms are FLOOR(·10⁹) images of identical
    double chains on exact integer ratios, summed exactly (the
    curation_domain_mix convention applied to learned clusters instead
    of declared sources)."""
    from sdg_data_catalog_spark.operators.iterative import kmeans_fit

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    assigned, _ = kmeans_fit(emb, k=4, iters=3)
    cnt = (
        assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .coalesce(1)
        .localCheckpoint(eager=True)  # k rows; totals + entropy consume it
    )
    tot = cnt.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    p = F.col("c").cast("double") / F.col("n")
    ent = cnt.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.floor(-p * F.log(p) * 1e9).cast("bigint"))
        .cast("bigint")
        .alias("h_nano"),
        F.max("n").alias("n"),
        F.max("k").alias("k"),
    )
    return ent.select(
        "n",
        "k",
        F.round(F.col("h_nano") / 1e9, 6).alias("entropy"),
        F.round(
            F.col("h_nano") / 1e9 / F.log(F.col("k").cast("double")), 6
        ).alias("balance"),
    )
