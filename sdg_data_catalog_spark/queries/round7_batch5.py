"""Round-7 batch 5: sequence patterns, inferential statistics, forensic
digit analysis, and semi-supervised graph labeling.

- ``win_event_sequence`` — MATCH_RECOGNIZE-lite: count per-user
  occurrences of the consecutive funnel pattern view→click→purchase
  completed within one hour, reported as a users-per-match-count
  histogram (the sequence-pattern operator Spark lacks natively,
  expressed as per-key ordered LEAD windows).
- ``agg_welch_ttest`` — Welch's unequal-variance t-test of each event
  type's value against all other events, computed from EXACT integer
  micro-unit moments (n, Σx, Σx²) with one identical double expression
  at the end (the ts_xcorr_lagged convention).
- ``dq_benford_digits`` — first-significant-digit distribution vs
  Benford's law with per-digit χ² contributions and a per-group χ²
  total — the fraud/data-entry forensic screen.
- ``graph_label_prop`` — semi-supervised label propagation on the
  supplier→customer shipment graph (the graph_pagerank edge set):
  supplier seeds keep label = suppkey % 3, three synchronous rounds of
  majority-vote with a deterministic smallest-label tie-break; oracle is
  the fully unrolled three-round CTE chain.

Determinism: counts, micro-unit sums, and label votes are integers; the
few doubles are single identical expressions over exact integers,
ROUNDed at fixed precision on both engines.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_SEQ_WINDOW_US = 3_600_000_000  # 1 hour


@register(
    "win_event_sequence",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      FROM events
    ),
    seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(event_type, 2) OVER w AS t2,
             ts_us,
             LEAD(ts_us, 2) OVER w AS ts2
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    per_user AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'view' AND t1 = 'click'
                       AND t2 = 'purchase'
                       AND ts2 - ts_us <= {_SEQ_WINDOW_US}
                      THEN 1 ELSE 0 END) AS n_matches
      FROM seq GROUP BY user_id
    )
    SELECT CAST(n_matches AS BIGINT) AS n_matches,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY n_matches ORDER BY n_matches
    """,
)
def win_event_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (MATCH_RECOGNIZE-lite): how many times
    does each user complete the CONSECUTIVE view→click→purchase funnel
    within one hour? Two LEAD columns over one per-user ordered window
    turn the pattern into a row predicate — no self-join, no explosion;
    the per-user count then folds into a bounded users-per-match-count
    histogram. The window partitions by user_id (corpus-scale
    parallelism, millions of small partitions), with the (ts, event_id)
    tie-break making same-microsecond events deterministic — the r6
    ADVICE lesson. Complements funnel_conversion (stage reach rates)
    with strict adjacency + time-bound semantics."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        "ts_us",
        F.lead("ts_us", 2).over(w).alias("ts2"),
    )
    hit = (
        (F.col("event_type") == "view")
        & (F.col("t1") == "click")
        & (F.col("t2") == "purchase")
        & (F.col("ts2") - F.col("ts_us") <= _SEQ_WINDOW_US)
    )
    per_user = seq.groupBy("user_id").agg(
        F.sum(F.when(hit, 1).otherwise(0)).alias("n_matches")
    )
    return (
        per_user.groupBy("n_matches")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(F.col("n_matches").cast("bigint"), "n_users")
        .orderBy("n_matches")
    )


@register(
    "agg_welch_ttest",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(img) AS DECIMAL(38, 0)) AS s1,
             CAST(SUM(img * img) AS DECIMAL(38, 0)) AS s2
      FROM v GROUP BY event_type
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
                 CAST(SUM(s1) AS DECIMAL(38, 0)) AS ts1,
                 CAST(SUM(s2) AS DECIMAL(38, 0)) AS ts2 FROM g),
    m AS (
      SELECT g.event_type, g.n,
             CAST(g.s1 AS DOUBLE) / (g.n * 1e6) AS m1,
             CAST(t.tn - g.n AS BIGINT) AS n2,
             CAST(t.ts1 - g.s1 AS DOUBLE) / ((t.tn - g.n) * 1e6) AS m2,
             (CAST(g.n AS DOUBLE) * CAST(g.s2 AS DOUBLE)
              - CAST(g.s1 AS DOUBLE) * CAST(g.s1 AS DOUBLE))
               / (CAST(g.n AS DOUBLE) * (g.n - 1) * 1e12) AS var1,
             (CAST(t.tn - g.n AS DOUBLE) * CAST(t.ts2 - g.s2 AS DOUBLE)
              - CAST(t.ts1 - g.s1 AS DOUBLE) * CAST(t.ts1 - g.s1 AS DOUBLE))
               / (CAST(t.tn - g.n AS DOUBLE)
                  * (t.tn - g.n - 1) * 1e12) AS var2
      FROM g CROSS JOIN t
    )
    SELECT event_type, n, ROUND(m1, 6) AS mean_value,
           ROUND(m2, 6) AS mean_rest,
           ROUND((m1 - m2) / sqrt(var1 / n + var2 / n2), 6) AS t_stat,
           ROUND(((var1 / n + var2 / n2) * (var1 / n + var2 / n2))
                 / ((var1 / n) * (var1 / n) / (n - 1)
                    + (var2 / n2) * (var2 / n2) / (n2 - 1)), 2) AS df
    FROM m ORDER BY event_type
    """,
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of each event type's value
    against the pooled rest — the A/B significance readout, as a
    dataflow: ONE partially-aggregated groupBy collects exact integer
    micro-unit moments (n, Σx, Σx² in decimal(38,0) — Σx² of a 10^7-row
    group overflows int64), the complement group's moments are the
    broadcast total minus the group's (no second scan), and the t
    statistic and Welch–Satterthwaite df are a single double expression
    over those exact integers, written identically on both engines (the
    ts_xcorr_lagged integer-moments convention) and ROUNDed at 1e-6."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1e6).cast("long").alias("img")
    )
    g = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("img").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("s1"),
            F.sum((F.col("img") * F.col("img")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
        .localCheckpoint(eager=True)  # |types| rows; total + cells consume it
    )
    t = g.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("s1").cast("decimal(38,0)").alias("ts1"),
        F.sum("s2").cast("decimal(38,0)").alias("ts2"),
    )
    m = g.crossJoin(F.broadcast(t)).selectExpr(
        "event_type",
        "n",
        "CAST(s1 AS DOUBLE) / (n * 1e6) AS m1",
        "CAST(tn - n AS BIGINT) AS n2",
        "CAST(ts1 - s1 AS DOUBLE) / ((tn - n) * 1e6) AS m2",
        "(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
        " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * (n - 1) * 1e12) AS var1",
        "(CAST(tn - n AS DOUBLE) * CAST(ts2 - s2 AS DOUBLE)"
        " - CAST(ts1 - s1 AS DOUBLE) * CAST(ts1 - s1 AS DOUBLE))"
        " / (CAST(tn - n AS DOUBLE) * (tn - n - 1) * 1e12) AS var2",
    )
    return m.selectExpr(
        "event_type",
        "n",
        "ROUND(m1, 6) AS mean_value",
        "ROUND(m2, 6) AS mean_rest",
        "ROUND((m1 - m2) / sqrt(var1 / n + var2 / n2), 6) AS t_stat",
        "ROUND(((var1 / n + var2 / n2) * (var1 / n + var2 / n2))"
        " / ((var1 / n) * (var1 / n) / (n - 1)"
        "    + (var2 / n2) * (var2 / n2) / (n2 - 1)), 2) AS df",
    ).orderBy("event_type")


_BENFORD_PPM = {d: math.floor(math.log10(1 + 1 / d) * 1e6) for d in range(1, 10)}
_BENFORD_SQL = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items())
    + " END"
)


@register(
    "dq_benford_digits",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST(substr(CAST(CAST(FLOOR(value * 1e6) AS BIGINT) AS VARCHAR),
                         1, 1) AS INTEGER) AS digit
      FROM events WHERE value > 0
    ),
    obs AS (
      SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM v GROUP BY event_type, digit
    ),
    grid AS (
      SELECT g.event_type, d.digit, COALESCE(o.n_obs, 0) AS n_obs
      FROM (SELECT DISTINCT event_type FROM obs) g
      CROSS JOIN (SELECT unnest(range(1, 10)) AS digit) d
      LEFT JOIN obs o ON o.event_type = g.event_type AND o.digit = d.digit
    ),
    tot AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS n
            FROM grid GROUP BY event_type),
    c AS (
      SELECT grid.event_type, grid.digit, grid.n_obs, tot.n,
             ({_BENFORD_SQL}) AS p_ppm,
             ROUND((grid.n_obs - tot.n * ({_BENFORD_SQL}) / 1e6)
                   * (grid.n_obs - tot.n * ({_BENFORD_SQL}) / 1e6)
                   / (tot.n * ({_BENFORD_SQL}) / 1e6), 6) AS chi2_term
      FROM grid JOIN tot USING (event_type)
    )
    SELECT event_type, CAST(digit AS INTEGER) AS digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST(p_ppm AS BIGINT) AS benford_ppm, chi2_term,
           CAST(SUM(CAST(FLOOR(chi2_term * 1e6) AS BIGINT))
                OVER (PARTITION BY event_type) AS DOUBLE) / 1e6 AS chi2_total
    FROM c ORDER BY event_type, digit
    """,
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic screen: the distribution of first
    significant digits of event values per event type, with per-digit
    χ² contributions and the group χ² total — the classic fraud /
    synthetic-data / unit-mixup detector. Digit extraction runs on the
    micro-unit integer image (leading digit is scale-invariant), so the
    heavy pass is one partially-aggregated groupBy to ≤ 9·|types| rows;
    the Benford expectation is a shared ppm literal table on both
    engines, each χ² term is ONE identical double expression, and the
    χ² total sums the 1e-6-floored terms — an exact integer sum, immune
    to float association order."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .select(
            "event_type",
            F.substring(
                F.floor(F.col("value") * 1e6).cast("long").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit"),
        )
    )
    obs = (
        ev.groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
        .localCheckpoint(eager=True)  # <= 9·|types| rows; three consumers
        # (types grid, the left join, group totals) — without this the
        # corpus scan re-executes per consumer (the shared-subtree rule)
    )
    types = obs.select("event_type").distinct()
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    grid = (
        types.crossJoin(F.broadcast(digits))
        .join(obs, ["event_type", "digit"], "left")
        .select(
            "event_type", "digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
        )
    )
    tot = grid.groupBy("event_type").agg(F.sum("n_obs").cast("bigint").alias("n"))
    p_ppm = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in _BENFORD_PPM.items() for x in (d, p)]
        ),
        F.col("digit"),
    )
    c = (
        grid.join(F.broadcast(tot), "event_type")
        .withColumn("p_ppm", p_ppm)
        .withColumn(
            "chi2_term",
            F.round(
                (F.col("n_obs") - F.col("n") * F.col("p_ppm") / 1e6)
                * (F.col("n_obs") - F.col("n") * F.col("p_ppm") / 1e6)
                / (F.col("n") * F.col("p_ppm") / 1e6),
                6,
            ),
        )
    )
    w = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "digit",
        "n_obs",
        F.col("p_ppm").cast("bigint").alias("benford_ppm"),
        "chi2_term",
        (
            F.sum(F.floor(F.col("chi2_term") * 1e6).cast("long")).over(w)
            / F.lit(1e6)
        ).alias("chi2_total"),
    ).orderBy("event_type", "digit")


_LP_ROUNDS = 3


def _lp_round_sql(i: int) -> str:
    p = f"l{i-1}"
    return f"""
votes{i} AS (
  SELECT e.dst AS node, l.label, COUNT(*) AS c
  FROM e2 e JOIN {p} l ON e.src = l.node
  WHERE l.label IS NOT NULL
  GROUP BY e.dst, l.label),
win{i} AS (
  SELECT node, label,
         ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) AS rk
  FROM votes{i} QUALIFY rk = 1),
l{i} AS (
  SELECT p.node, p.is_seed,
         CASE WHEN p.is_seed THEN p.label
              ELSE COALESCE(w.label, p.label) END AS label
  FROM {p} p LEFT JOIN win{i} w ON p.node = w.node)"""


_LP_ORACLE = (
    """WITH e AS (SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e2 AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS node FROM e2),
l0 AS (SELECT node, node < 1000000 AS is_seed,
              CASE WHEN node < 1000000 THEN CAST(node % 3 AS INTEGER) END
                AS label
       FROM nodes),"""
    + ",".join(_lp_round_sql(i) for i in range(1, _LP_ROUNDS + 1))
    + f"""
SELECT CAST(COALESCE(label, -1) AS INTEGER) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_node_ids
FROM l{_LP_ROUNDS} GROUP BY label ORDER BY label"""
)


@register("graph_label_prop", oracle=_LP_ORACLE)
def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation on the supplier→customer
    shipment graph (the graph_pagerank edge derivation,
    scoring_sampling.py): supplier seeds carry fixed label suppkey % 3,
    customers are unlabeled; three synchronous rounds of
    neighbor-majority voting with a deterministic (count DESC, label
    ASC) tie-break — the community/propagation primitive next to
    graph_pagerank (importance) and graph_kcore (cohesion). Each round
    is one shuffle: edges join the label frame on src, votes partially
    aggregate on (dst, label), and the per-node argmax window sees at
    most 3 rows per node; the label frame is localCheckpointed per round
    to keep lineage flat (the iterative-operator convention). The
    output is the per-label census with a sum-of-node-ids checksum, so
    any single node landing on a different label flips the hash. Oracle:
    the same three rounds fully unrolled as chained CTEs."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + F.lit(1_000_000)).alias("dst"),
        )
        .distinct()
    )
    e2 = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)  # 3 rounds × (join + vote) consume it
    nodes = e2.select("src").distinct().withColumnRenamed("src", "node")
    labels = nodes.select(
        "node",
        (F.col("node") < 1_000_000).alias("is_seed"),
        F.when(F.col("node") < 1_000_000, (F.col("node") % 3).cast("int")).alias(
            "label"
        ),
    ).localCheckpoint(eager=True)
    for _ in range(_LP_ROUNDS):
        votes = (
            e2.join(
                labels.filter(F.col("label").isNotNull()).select(
                    F.col("node").alias("src"), "label"
                ),
                "src",
            )
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        wv = Window.partitionBy("dst").orderBy(F.desc("c"), "label")
        winner = (
            votes.withColumn("rk", F.row_number().over(wv))
            .filter(F.col("rk") == 1)
            .select(F.col("dst").alias("node"), F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(winner, "node", "left")
            .select(
                "node",
                "is_seed",
                F.when(F.col("is_seed"), F.col("label"))
                .otherwise(F.coalesce("new_label", "label"))
                .alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy(F.coalesce(F.col("label"), F.lit(-1)).alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("node").cast("bigint").alias("sum_node_ids"),
        )
        .select(F.col("label").cast("int"), "n_nodes", "sum_node_ids")
        .orderBy("label")
    )
