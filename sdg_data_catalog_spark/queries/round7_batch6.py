"""Round-7 batch 6: scalable heavy hitters, cumulative-distinct
maintenance, nonparametric inference, and HDR-style latency profiling.

- ``sketch_mg_heavy_hitters`` — exact frequent-token report computed the
  100-TB way: a per-partition Misra-Gries candidate pass (bounded
  memory, guaranteed superset of every token with count > N/200 by the
  pigeonhole argument), then an exact recount of ONLY the candidates via
  a broadcast semi-join. The OUTPUT is exact and partitioning-invariant;
  only the candidate set (an internal superset) depends on layout.
- ``win_cumulative_distinct`` — cumulative distinct users per
  (event_type, day) via the first-occurrence-flag trick: one per-(type,
  user) window marks each user's first event, then a bounded per-type
  window over the day series accumulates — never a COUNT(DISTINCT) over
  a growing prefix.
- ``agg_mann_whitney`` — Mann-Whitney U with tie-corrected normal
  approximation, each event type vs the pooled rest: average ranks come
  from ONE two-phase running total over the distinct-value table
  (2·R₁ stays an exact integer; Σ(t³−t) in decimal(38,0)); the z
  statistic is a single identical double expression.
- ``agg_hdr_percentiles`` — order-of-magnitude latency profile: decimal-
  digit bucketing of the micro-unit image (an exact integer stand-in for
  HDR-histogram log buckets), cumulative bucket counts, and p50/p90/p99
  bucket bounds at exact ceil(p·n/100) target ranks.

Determinism: candidate recounts, first-occurrence flags, rank sums, tie
sums, and bucket counts are integers; doubles are single identical
expressions (the ts_xcorr_lagged convention).

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators.lm_counts import token_count_partials
from sdg_data_catalog_spark.queries.registry import register

_MG_DENOM = 200  # heavy hitter := count * 200 > N
_MG_CAP = 400  # per-partition Misra-Gries capacity (2x margin)


def _mg_fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Batched Misra-Gries via summary MERGE (Agarwal et al., mergeable
    # summaries): fold each Arrow batch's exact value_counts into the
    # running summary, then prune to capacity by subtracting the
    # (cap+1)-th largest count from every entry and dropping <= 0.
    # Each prune's undercount is bounded by n_seen/(cap+1), summing to
    # < n_p/(cap+1) per partition — so any token with partition count
    # > n_p/200 keeps a positive residual at cap=400 and SURVIVES,
    # which is the only property phase 2 needs. The merge is a pandas
    # Series.add over the index union and the prune threshold comes
    # from np.partition — C-speed in the number of distinct tokens
    # held, no per-token Python loop (a dict fold measured equal at
    # this corpus's ~dozens-token vocabulary but is O(uniques) Python
    # per batch, the wrong shape for a real corpus's vocabulary;
    # tools/profile_mg.py carries the A/B, output proven identical).
    # r15: the input is now the per-DOC token ARRAY (the JVM's own
    # regexp_extract_all, so tokenization semantics are untouched)
    # instead of the exploded occurrence stream — the same multiset of
    # tokens reaches the same fold, minus a corpus-sized Generate and
    # an occurrence-sized Arrow transfer. Batch boundaries shift (docs
    # per batch, not tokens per batch), which only moves MG prune
    # points: the summary stays a superset of every partition-heavy
    # token (the bound above is segmentation-free), and phase 2's exact
    # recount makes the OUTPUT invariant to all of it.
    counters = pd.Series(dtype="int64")
    n_part = 0
    for pdf in batches:
        arrs = [a for a in pdf["toks"] if a is not None and len(a)]
        if not arrs:
            continue
        flat = np.concatenate([np.asarray(a, dtype=object) for a in arrs])
        n_part += len(flat)
        vc = pd.Series(flat).value_counts()
        counters = (
            vc.astype("int64")
            if counters.empty
            else counters.add(vc, fill_value=0).astype("int64")
        )
        if len(counters) > _MG_CAP:
            vals = counters.to_numpy()
            pos = len(vals) - 1 - _MG_CAP  # (cap+1)-th largest
            thresh = int(np.partition(vals, pos)[pos])
            counters = counters[counters > thresh] - thresh
    # the '' sentinel row carries the partition's exact token total —
    # '' can never be a token of the [a-z]+ tokenization, and folding
    # the total into this pass saves a whole extra corpus scan
    yield pd.DataFrame(
        {
            "token": list(counters.index) + [""],
            "c": [0] * len(counters) + [n_part],
        }
    )


@register(
    "sketch_mg_heavy_hitters",
    oracle="""
    WITH tok AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(COALESCE(text, '')), '[^a-z]+'),
               x -> x <> '')) AS token
      FROM documents
    ),
    c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c)
    SELECT c.token, c.cnt,
           CAST(c.cnt * 1000000 // t.n AS BIGINT) AS freq_ppm
    FROM c CROSS JOIN t
    WHERE c.cnt * 200 > t.n
    ORDER BY c.cnt DESC, c.token
    """,
)
def sketch_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (tokens with count > N/200), EXACT, computed the
    way a 100-TB corpus has to: phase 1 runs a Misra-Gries summary of
    capacity 400 inside each partition (an Arrow-batched mapInPandas
    pass with O(capacity) state — no corpus-sized groupBy on the full
    vocabulary), whose union is a guaranteed superset of every global
    heavy hitter: if count(w) > N/200 then w exceeds its partition's
    local n_p/200 in at least one partition (pigeonhole), and MG with
    capacity 2x that threshold never evicts it. Phase 2 recounts ONLY
    the candidates through a broadcast semi-join and applies the exact
    threshold — so the OUTPUT is partitioning-invariant and
    hash-checkable even though the internal candidate set is not. The
    oracle is the brute-force groupBy HAVING — equality with it is the
    whole point."""
    docs = table(spark, sf_dir, "documents")
    # r14 (guide §4.1): regexp_extract_all('[a-z]+') is value-identical
    # to filter(split(lower, '[^a-z]+'), != '') — maximal letter runs,
    # empties never emitted — and keeps the tokenization inside codegen
    # (the interpreted filter lambda is the _tok_array lesson); the win
    # lands on BOTH passes since `toks` feeds phase 1 and the recount:
    # 8.14 → 6.03 s min-of-3 same-window at the 100× replica,
    # oracle-green at sf0.001/0.01/0.1 (token stream and order are
    # identical, so the MG candidate set is unchanged too).
    # r15 (guide §2.3/§4.2, measured): neither pass explodes any more —
    # the per-doc token ARRAY (same JVM regexp_extract_all) goes
    # straight into the Arrow kernels, so the corpus-sized occurrence
    # stream never exists in the JVM: phase 1 folds arrays inside
    # _mg_fold, and the recount sums the shared lm_counts kernel's
    # vocabulary-sized per-batch integer partials (associative — exact
    # for any batch split) under the same candidate semi-join.
    toks = docs.select(
        F.regexp_extract_all(
            F.lower(F.coalesce(F.col("text"), F.lit(""))),
            F.lit("[a-z]+"),
            0,
        ).alias("toks")
    )

    summary = toks.mapInPandas(_mg_fold, "token string, c long")
    summary = summary.localCheckpoint(eager=True)  # partitions × cap rows
    cand = summary.filter(F.col("token") != "").select("token").distinct()
    total = summary.agg(F.sum("c").cast("bigint").alias("n"))
    counts = (
        token_count_partials(toks, tokens_col="toks", mode="unigrams")
        .join(F.broadcast(cand), F.col("w1") == F.col("token"), "left_semi")
        .groupBy(F.col("w1").alias("token"))
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * _MG_DENOM > F.col("n"))
        .select(
            "token",
            "cnt",
            F.expr("CAST(cnt * 1000000 DIV n AS BIGINT)").alias("freq_ppm"),
        )
        .orderBy(F.desc("cnt"), "token")
    )


_DAY_US = 86_400_000_000


@register(
    "win_cumulative_distinct",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, user_id, epoch_us(ts) AS ts_us, event_id,
             epoch_us(ts) // {_DAY_US} AS day
      FROM events
    ),
    firsts AS (
      SELECT event_type, user_id, day,
             ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                                ORDER BY ts_us, event_id) AS rn
      FROM ev
    ),
    new_users AS (
      SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts WHERE rn = 1 GROUP BY event_type, day
    ),
    active AS (SELECT DISTINCT event_type, day FROM ev)
    SELECT a.event_type, CAST(a.day AS BIGINT) AS day,
           CAST(COALESCE(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0))
                OVER (PARTITION BY a.event_type ORDER BY a.day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_distinct_users
    FROM active a LEFT JOIN new_users n
      ON a.event_type = n.event_type AND a.day = n.day
    ORDER BY a.event_type, a.day
    """,
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per (event_type, day) — the classic
    "users acquired to date" metric — via the first-occurrence-flag
    trick: a per-(type, user) window marks each user's first event (with
    the (ts, event_id) tie-break), those flags aggregate to per-day
    new-user counts, and a running sum over the DAY series (bounded:
    |types| × |days| rows) accumulates. A naive COUNT(DISTINCT) per
    growing prefix is quadratic and reshuffles the corpus per day; this
    shape is one corpus shuffle (the per-user window) + day-grain
    arithmetic, and is exactly how a warehouse maintains the metric
    incrementally."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    ev = ev.withColumn("day", F.expr(f"ts_us DIV {_DAY_US}"))
    w = Window.partitionBy("event_type", "user_id").orderBy("ts_us", "event_id")
    firsts = ev.withColumn("rn", F.row_number().over(w))
    new_users = (
        firsts.filter(F.col("rn") == 1)
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_users"))
    )
    active = ev.select("event_type", "day").distinct()
    wd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        active.join(new_users, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.col("day").cast("bigint").alias("day"),
            F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
        )
        .withColumn("cum_distinct_users", F.sum("new_users").over(wd).cast("bigint"))
        .orderBy("event_type", "day")
    )


@register(
    "agg_mann_whitney",
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT) AS img
      FROM events
    ),
    pv AS (SELECT img, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM v GROUP BY img, event_type),
    vals AS (SELECT img, CAST(SUM(cnt) AS BIGINT) AS tot FROM pv GROUP BY img),
    pref AS (
      SELECT img, tot,
             CAST(SUM(tot) OVER (ORDER BY img ROWS UNBOUNDED PRECEDING)
                  - tot AS BIGINT) AS prefix
      FROM vals
    ),
    n_all AS (SELECT CAST(SUM(tot) AS BIGINT) AS n,
                     CAST(SUM(CAST(tot AS DECIMAL(38,0)) * tot * tot - tot)
                          AS DECIMAL(38,0)) AS ties
              FROM vals),
    g AS (
      SELECT p.event_type,
             CAST(SUM(p.cnt) AS BIGINT) AS n1,
             CAST(SUM(p.cnt * (2 * f.prefix + f.tot + 1)) AS BIGINT) AS r2
      FROM pv p JOIN pref f ON p.img = f.img
      GROUP BY p.event_type
    )
    SELECT g.event_type, g.n1,
           CAST(g.r2 - g.n1 * (g.n1 + 1) AS DOUBLE) / 2 AS u,
           ROUND((CAST(g.r2 - g.n1 * (g.n1 + 1) AS DOUBLE) / 2
                  - CAST(g.n1 AS DOUBLE) * (a.n - g.n1) / 2)
                 / sqrt(CAST(g.n1 AS DOUBLE) * (a.n - g.n1) / 12
                        * ((a.n + 1)
                           - CAST(a.ties AS DOUBLE)
                             / (CAST(a.n AS DOUBLE) * (a.n - 1)))), 6) AS z
    FROM g CROSS JOIN n_all a ORDER BY g.event_type
    """,
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) of each event type's value
    against the pooled rest, with the tie-corrected normal
    approximation — the nonparametric twin of agg_welch_ttest for
    skewed metrics. Average ranks never materialize per row: the
    distinct-value table carries (prefix, tot) from ONE two-phase
    running total (operators/curation.py::running_total — the global
    ORDER BY window this would otherwise need is the classic
    scale-killer), and 2·R₁ = Σ cnt·(2·prefix + t + 1) stays an exact
    int64 (bounded by 2N², fine to ~10^9 rows; decimal beyond). The tie
    term Σ(t³−t) accumulates in decimal(38,0) — t³ overflows int64 at
    t > 2·10^6 — and z is one identical double expression, ROUNDed at
    1e-6 on both engines."""
    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * 1e6).cast("long").alias("img")
    )
    from pyspark import StorageLevel

    pv = (
        ev.groupBy("img", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
        # distinct-value-grained; both the value totals and the per-group
        # rank-sum join consume it — unpersisted, each rescans events
    )
    vals = pv.groupBy("img").agg(F.sum("cnt").cast("bigint").alias("tot"))
    pref = running_total(vals, "img", F.col("tot"), "run").select(
        "img", "tot", (F.col("run") - F.col("tot")).alias("prefix")
    )
    n_all = vals.agg(
        F.sum("tot").cast("bigint").alias("n"),
        F.sum(
            F.col("tot").cast("decimal(38,0)") * F.col("tot") * F.col("tot")
            - F.col("tot")
        )
        .cast("decimal(38,0)")
        .alias("ties"),
    )
    g = (
        pv.join(pref, "img")
        .groupBy("event_type")
        .agg(
            F.sum("cnt").cast("bigint").alias("n1"),
            F.sum(F.col("cnt") * (2 * F.col("prefix") + F.col("tot") + 1))
            .cast("bigint")
            .alias("r2"),
        )
    )
    return (
        g.crossJoin(F.broadcast(n_all))
        .selectExpr(
            "event_type",
            "n1",
            "CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u",
            "ROUND((CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / 2"
            "       - CAST(n1 AS DOUBLE) * (n - n1) / 2)"
            "      / sqrt(CAST(n1 AS DOUBLE) * (n - n1) / 12"
            "             * ((n + 1)"
            "                - CAST(ties AS DOUBLE)"
            "                  / (CAST(n AS DOUBLE) * (n - 1)))), 6) AS z",
        )
        .orderBy("event_type")
    )


@register(
    "agg_hdr_percentiles",
    oracle="""
    WITH v AS (
      SELECT event_type,
             length(CAST(CAST(FLOOR(value * 1e6) AS BIGINT) AS VARCHAR))
               AS bucket
      FROM events WHERE value > 0
    ),
    b AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM v GROUP BY event_type, bucket),
    c AS (
      SELECT event_type, bucket, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM b
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(POWER(10, MIN(CASE WHEN cum * 100 >= n * 50 THEN bucket END)
                          - 1) AS DOUBLE) / 1e6 AS p50_lo,
           CAST(POWER(10, MIN(CASE WHEN cum * 100 >= n * 50 THEN bucket END))
                AS DOUBLE) / 1e6 AS p50_hi,
           CAST(POWER(10, MIN(CASE WHEN cum * 100 >= n * 90 THEN bucket END)
                          - 1) AS DOUBLE) / 1e6 AS p90_lo,
           CAST(POWER(10, MIN(CASE WHEN cum * 100 >= n * 90 THEN bucket END))
                AS DOUBLE) / 1e6 AS p90_hi,
           CAST(POWER(10, MIN(CASE WHEN cum * 100 >= n * 99 THEN bucket END)
                          - 1) AS DOUBLE) / 1e6 AS p99_lo,
           CAST(POWER(10, MIN(CASE WHEN cum * 100 >= n * 99 THEN bucket END))
                AS DOUBLE) / 1e6 AS p99_hi
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def agg_hdr_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram-style latency profile: values bucket by decimal
    order of magnitude (digit count of the micro-unit integer image — an
    exact integer stand-in for log buckets, no float log at bucketing
    time), cumulative bucket counts locate the bucket containing each
    exact ceil(p·n/100) target rank, and the report gives [lo, hi)
    bucket bounds for p50/p90/p99 per event type. The corpus pass is one
    partially-aggregated groupBy to ≤ 19·|types| rows; the windows run
    on that tiny grid. This is the mergeable fixed-bucket shape
    monitoring systems actually ship (HdrHistogram, Prometheus) — exact
    percentiles stay with sketch_quantiles/catalog_equiheight_hist; this
    op trades resolution for an O(buckets) mergeable summary."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .select(
            "event_type",
            F.length(
                F.floor(F.col("value") * 1e6).cast("long").cast("string")
            ).alias("bucket"),
        )
    )
    b = ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    c = b.withColumn("cum", F.sum("cnt").over(wc).cast("bigint")).withColumn(
        "n", F.sum("cnt").over(wn).cast("bigint")
    )

    def pb(p: int, edge: str) -> Column:
        bucket = F.min(
            F.when(F.col("cum") * 100 >= F.col("n") * p, F.col("bucket"))
        )
        exp = bucket - 1 if edge == "lo" else bucket
        return (F.pow(F.lit(10.0), exp) / F.lit(1e6)).alias(f"p{p}_{edge}")

    return (
        c.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            pb(50, "lo"),
            pb(50, "hi"),
            pb(90, "lo"),
            pb(90, "hi"),
            pb(99, "lo"),
            pb(99, "hi"),
        )
        .orderBy("event_type")
    )
