"""Round-8 operator batch 3: randomization inference, trend smoothing,
and Bloom-filter semi-join reduction.

- `agg_permutation_test`: deterministic randomization test for a
  difference in mean document length between two sources — the
  nonparametric companion to the experimentation stack (Welch t /
  Mann-Whitney assume their nulls; the permutation test IS the null).
- `ts_holt_linear`: Holt's linear-trend double exponential smoothing
  over the daily event-count series per type, with the one-step-ahead
  forecast — the trend rung above `ts_ewma` (level only) and below
  seasonal decomposition (`ts_decompose_ma`).
- `sketch_bloom_membership`: a hash-Bloom filter built over the standing
  corpus's content fingerprints and probed by the incoming batch — the
  manual form of the runtime semi-join reduction (`join_bloom_runtime`
  lets AQE inject one; here the filter itself is a first-class, tested
  artifact with its no-false-negative guarantee hash-checked).

All deterministic (md5-derived randomness), all with full DuckDB
oracles generated from the same pinned constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_PERM_B = 64
_SRC_A, _SRC_B = "src0", "src1"


@register(
    "agg_permutation_test",
    oracle=f"""
    WITH pool AS (
      SELECT doc_id, n_chars, source = '{_SRC_A}' AS in_a
      FROM documents WHERE source IN ('{_SRC_A}', '{_SRC_B}')
    ),
    obs AS (
      SELECT CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN in_a THEN n_chars ELSE 0 END) AS BIGINT) AS sa,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE n_chars END) AS BIGINT) AS sb
      FROM pool
    ),
    perm AS (
      SELECT b,
             SUM(CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '@'
                             || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                      THEN 1 ELSE 0 END) AS pn_a,
             SUM(CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '@'
                             || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                      THEN n_chars ELSE 0 END) AS psa,
             SUM(n_chars) AS st, COUNT(*) AS nt
      FROM pool, range({_PERM_B}) t(b)
      GROUP BY b
    ),
    stats AS (
      SELECT b,
             CASE WHEN pn_a = 0 OR pn_a = nt THEN NULL
                  ELSE abs(CAST(psa AS DOUBLE) / pn_a
                           - CAST(st - psa AS DOUBLE) / (nt - pn_a)) END AS s
      FROM perm
    )
    SELECT n_a, n_b,
           FLOOR(abs(CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b)
                 * 1e6) / 1e6 AS obs_diff,
           CAST((SELECT COUNT(*) FROM stats
                 WHERE s IS NOT NULL
                   AND s >= abs(CAST(sa AS DOUBLE) / n_a
                                - CAST(sb AS DOUBLE) / n_b)) AS BIGINT)
             AS n_extreme,
           ROUND((1.0 + (SELECT COUNT(*) FROM stats
                         WHERE s IS NOT NULL
                           AND s >= abs(CAST(sa AS DOUBLE) / n_a
                                        - CAST(sb AS DOUBLE) / n_b)))
                 / (1.0 + (SELECT COUNT(*) FROM stats WHERE s IS NOT NULL)),
                 6) AS p_value
    FROM obs
    """,
)
def agg_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for mean({_SRC_A}) vs mean({_SRC_B}) document
    length: {_PERM_B} deterministic re-labelings (md5(doc_id, b) % 2 — the
    unconditional randomization variant, each doc independently coin-
    flipped; degenerate all-one-side draws are excluded) recompute the
    absolute mean difference; p = (1 + #extreme) / (1 + #valid), the
    standard add-one permutation p-value (Phipson & Smyth 2010). The
    experimentation stack's distribution-free member: Welch assumes
    normal-ish tails, Mann-Whitney tests stochastic dominance — this
    tests the sharp null with NO assumptions, and deterministically
    (an irreproducible permutation test cannot be audited or hash-checked).

    Plan: one pass over the two-source sliver explodes {_PERM_B} labels
    per row and partial-aggregates to {_PERM_B} rows before the shuffle;
    every statistic derives from exact integer sums, compared as
    identically-derived doubles on both engines. Output is ONE row."""
    docs = table(spark, sf_dir, "documents")
    pool = docs.filter(F.col("source").isin(_SRC_A, _SRC_B)).select(
        "doc_id", "n_chars", (F.col("source") == _SRC_A).alias("in_a")
    )
    obs = pool.agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("in_a"), F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("sa"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(F.col("n_chars")))
        .cast("bigint")
        .alias("sb"),
    ).localCheckpoint(eager=True)  # 1 row; feeds the obs stat + the final join
    flip = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("@"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0
    )
    perm = (
        pool.select(
            "doc_id", "n_chars", F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b")
        )
        .groupBy("b")
        .agg(
            F.sum(F.when(flip, 1).otherwise(0)).alias("pn_a"),
            F.sum(F.when(flip, F.col("n_chars")).otherwise(0)).alias("psa"),
            F.sum("n_chars").alias("st"),
            F.count(F.lit(1)).alias("nt"),
        )
    )
    s = F.when(
        (F.col("pn_a") > 0) & (F.col("pn_a") < F.col("nt")),
        F.abs(
            F.col("psa").cast("double") / F.col("pn_a")
            - (F.col("st") - F.col("psa")).cast("double")
            / (F.col("nt") - F.col("pn_a"))
        ),
    )
    obs_diff = F.abs(
        F.col("sa").cast("double") / F.col("n_a")
        - F.col("sb").cast("double") / F.col("n_b")
    )
    tail = (
        perm.select(s.alias("s"))
        .crossJoin(F.broadcast(obs))
        .agg(
            F.sum(F.when(F.col("s") >= obs_diff, 1).otherwise(0))
            .cast("bigint")
            .alias("n_extreme"),
            F.sum(F.when(F.col("s").isNotNull(), 1).otherwise(0)).alias("n_valid"),
        )
    )
    return tail.crossJoin(F.broadcast(obs)).select(
        "n_a",
        "n_b",
        (F.floor(obs_diff * 1e6) / 1e6).alias("obs_diff"),
        "n_extreme",
        F.round(
            (1.0 + F.col("n_extreme")) / (1.0 + F.col("n_valid")), 6
        ).alias("p_value"),
    )


_HOLT_A = 0.3
_HOLT_B = 0.1


@register(
    "ts_holt_linear",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY event_type, day
    ),
    idx AS (
      SELECT event_type, y,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    fold(event_type, i, n, level, trend) AS (
      SELECT a.event_type, 2, a.n, b.y,
             b.y - a.y
      FROM idx a JOIN idx b ON b.event_type = a.event_type AND b.i = 2
      WHERE a.i = 1
      UNION ALL
      SELECT f.event_type, f.i + 1, f.n,
             {_HOLT_A} * d.y + {1 - _HOLT_A} * (f.level + f.trend),
             {_HOLT_B} * (({_HOLT_A} * d.y + {1 - _HOLT_A} * (f.level + f.trend)) - f.level)
               + {1 - _HOLT_B} * f.trend
      FROM fold f JOIN idx d ON d.event_type = f.event_type AND d.i = f.i + 1
      WHERE f.i < f.n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           FLOOR(level * 1e6) / 1e6 AS level,
           FLOOR(trend * 1e6) / 1e6 AS trend,
           FLOOR((level + trend) * 1e6) / 1e6 AS forecast_1
    FROM fold WHERE i = n
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing (alpha={_HOLT_A}, beta={_HOLT_B})
    over each event type's daily-count series, emitting the final level,
    trend, and one-step-ahead forecast — the trend-aware rung of the
    smoothing ladder (`ts_ewma` tracks level only; `ts_decompose_ma`
    separates seasonality). Init is the standard l1=y1, b1=y2-y1; the
    recursion l_t = a*y_t + (1-a)(l+b), b_t = B*(l_t - l) + (1-B)*b is
    inherently sequential, so it runs as ONE codegen'd ordered
    `aggregate()` fold over the per-type day-sorted count array — the
    per-key-bounded-state shape every stateful smoother carries (30
    days per type here; a year is 365 doubles). The oracle replays the
    identical fold as a recursive CTE; both engines execute the same
    IEEE operations in the same order from integer daily counts, so the
    floored outputs are bit-equal.

    One corpus pass: the daily census is metadata-sized
    (|types| x |days|), and the fold happens on |types| rows."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("day", "y"))), lambda s: s["y"]
    )
    acc0 = F.struct(
        F.element_at(F.col("ys"), 2).alias("level"),
        (F.element_at(F.col("ys"), 2) - F.element_at(F.col("ys"), 1)).alias("trend"),
    )

    def step(acc, y):
        new_level = _HOLT_A * y + (1 - _HOLT_A) * (acc["level"] + acc["trend"])
        return F.struct(
            new_level.alias("level"),
            (
                _HOLT_B * (new_level - acc["level"]) + (1 - _HOLT_B) * acc["trend"]
            ).alias("trend"),
        )

    folded = F.aggregate(F.slice(F.col("ys"), 3, F.size("ys")), acc0, step)
    return (
        daily.groupBy("event_type")
        .agg(arr.alias("ys"))
        .select(
            "event_type",
            F.size("ys").cast("bigint").alias("n_days"),
            (F.floor(folded["level"] * 1e6) / 1e6).alias("level"),
            (F.floor(folded["trend"] * 1e6) / 1e6).alias("trend"),
            (F.floor((folded["level"] + folded["trend"]) * 1e6) / 1e6).alias(
                "forecast_1"
            ),
        )
    )


_BLOOM_M = 8192
_BLOOM_K = 3

_FP_SQL = "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"


def _bit_sql(h: str, j: int) -> str:
    return (
        f"(('0x' || substr(md5({h} || '#{j}'), 1, 8))::BIGINT % {_BLOOM_M})"
    )


@register(
    "sketch_bloom_membership",
    oracle=f"""
    WITH sig AS (
      SELECT doc_id, {_FP_SQL} AS h FROM documents
    ),
    existing AS (SELECT * FROM sig WHERE doc_id % 10 != 0),
    incoming AS (SELECT * FROM sig WHERE doc_id % 10 = 0),
    bits AS (
      SELECT DISTINCT bit FROM (
        {" UNION ALL ".join(f"SELECT {_bit_sql('h', j)} AS bit FROM existing" for j in range(_BLOOM_K))}
      )
    ),
    barr AS (SELECT list(bit) AS bs FROM bits)
    SELECT i.doc_id,
           {" AND ".join(f"list_contains(bs, {_bit_sql('i.h', j)})" for j in range(_BLOOM_K))}
             AS bloom_hit,
           EXISTS (SELECT 1 FROM existing e WHERE e.h = i.h) AS is_dup_exact,
           ({" AND ".join(f"list_contains(bs, {_bit_sql('i.h', j)})" for j in range(_BLOOM_K))})
             OR NOT EXISTS (SELECT 1 FROM existing e WHERE e.h = i.h)
             AS no_false_negative
    FROM incoming i, barr
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership for continuous-ingest dedup: the standing
    corpus's content fingerprints (the dedup_incremental identity) set
    {_BLOOM_K} md5-derived bits each in an m={_BLOOM_M} filter; each
    incoming document probes its {_BLOOM_K} bits. The filter is ~1 KB
    REGARDLESS of corpus size — at 100 TB it broadcasts where the exact
    fingerprint index cannot, pre-filtering the expensive semi-join to
    the bloom-positive sliver (the manual, inspectable form of the AQE
    runtime filter in `join_bloom_runtime`). The Bloom guarantee —
    NO false negatives, bounded false positives — is hash-checked: the
    output carries the exact membership verdict beside the bloom verdict
    plus a `no_false_negative` boolean that any engine/bit drift flips.

    Plan: one pass builds the <= {_BLOOM_M}-row distinct bit table
    (map-side combinable), which folds to a single array row and
    broadcasts onto the incoming probe; the exact side is the same
    left-semi hash probe dedup_incremental runs. All hash arithmetic is
    the pinned md5-prefix convention shared with the oracle."""
    docs = table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    )
    sig = docs.select("doc_id", fp.alias("h")).localCheckpoint(eager=True)
    existing = sig.filter(F.col("doc_id") % 10 != 0)
    incoming = sig.filter(F.col("doc_id") % 10 == 0)

    def bit(h, j: int):
        return (
            F.conv(
                F.substring(F.md5(F.concat(h, F.lit(f"#{j}"))), 1, 8), 16, 10
            ).cast("long")
            % _BLOOM_M
        )

    bits = (
        existing.select(
            F.explode(F.array(*[bit(F.col("h"), j) for j in range(_BLOOM_K)])).alias(
                "bit"
            )
        )
        .distinct()
        .agg(F.collect_set("bit").alias("bs"))
    )
    exact = incoming.join(existing, "h", "left_semi").select(
        "doc_id", F.lit(True).alias("is_dup_exact")
    )
    hit = None
    for j in range(_BLOOM_K):
        c = F.array_contains("bs", bit(F.col("h"), j))
        hit = c if hit is None else (hit & c)
    return (
        incoming.crossJoin(F.broadcast(bits))
        .select("doc_id", hit.alias("bloom_hit"))
        .join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce("is_dup_exact", F.lit(False)).alias("is_dup_exact"),
            (
                F.col("bloom_hit")
                | ~F.coalesce("is_dup_exact", F.lit(False))
            ).alias("no_false_negative"),
        )
    )
