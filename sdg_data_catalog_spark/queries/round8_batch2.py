"""Round-8 operator batch 2: embedding drift, deterministic bootstrap
CIs, and the forward as-of join.

- `emb_centroid_drift`: per-label squared centroid shift between the two
  hash-split halves of the embedding table — the embedding-distribution
  drift monitor (a re-embedded corpus whose centroids move has a model
  shift, not a data shift). Exact integer moments, one corpus pass.
- `agg_bootstrap_ci`: Poisson bootstrap confidence interval for the mean
  document length per source — THE bootstrap that works on distributed
  data (per-row Poisson(1) resample weights need no global coordination;
  Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
  Google 2012). Weights come from md5-derived uniforms through a fixed
  inverse-CDF table, so every engine draws the SAME resamples.
- `join_asof_fwd_tolerance`: forward as-of join with a tolerance bound
  (pandas merge_asof(direction='forward', tolerance=...) semantics) —
  each signup matched to the user's NEXT purchase within 7 days.
  Shuffle-once union + one backward-looking window pass, no self-join.

All three carry full DuckDB oracles built from the same pinned constants
as the Spark side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DIM = 64
_Q = 1000

_QSPLIT_SQL = (
    "q AS (SELECT label, "
    "CAST(CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS INTEGER) AS half, "
    + ", ".join(
        f"CAST(ROUND(CAST(embedding[{d + 1}] AS DOUBLE) * {_Q}) AS BIGINT) AS q{d}"
        for d in range(_DIM)
    )
    + " FROM embeddings)"
)


@register(
    "emb_centroid_drift",
    oracle=f"""
    WITH {_QSPLIT_SQL},
    m AS (
      SELECT label,
             CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             {", ".join(f"SUM(CASE WHEN half = 0 THEN q{d} ELSE 0 END) AS a{d}, SUM(CASE WHEN half = 1 THEN q{d} ELSE 0 END) AS b{d}" for d in range(_DIM))}
      FROM q GROUP BY label
    )
    SELECT label, n_a, n_b,
           FLOOR(CAST({" + ".join(f"CAST(n_b * a{d} - n_a * b{d} AS HUGEINT) * (n_b * a{d} - n_a * b{d})" for d in range(_DIM))}
                      AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * n_b * n_a * n_b)
                 / {_Q}.0 / {_Q}.0 * 1e6) / 1e6 AS centroid_shift_sq
    FROM m WHERE n_a > 0 AND n_b > 0
    """,
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding drift: ||mu_A - mu_B||^2 between the two
    md5-hash halves of the table — the readout that separates a MODEL
    shift (centroids move everywhere) from sampling noise (shifts near
    zero), run between embedding versions or ingest batches. The hash
    split is the deterministic stand-in for the batch boundary a real
    deployment would use.

    Exactness (emb_diversity_by_label machinery): fixed-point quantized
    vectors, conditional per-dimension integer sums for both halves in
    ONE pass (128 sum slots + 2 counts, map-side combinable), numerator
    sum_d (n_B*A_d - n_A*B_d)^2 in decimal/HUGEINT (the cross-term
    exceeds int64 past ~1e9-row labels), one double division + 1e-6
    floor. Labels with an empty half are dropped (drift undefined)."""
    emb = table(spark, sf_dir, "embeddings")
    # r15 (guide §2.3/§4.2, operators/moments.py — the documented Arrow
    # route the r14 expression A/Bs pointed at): md5 half split,
    # quantization AND the per-(label, half) partial aggregation run in
    # one numpy mapInPandas pass; the 130-state wide hash aggregate over
    # N rows becomes 130 conditional sums over the ≤ 2·|labels|·batches
    # partial rows. All sums are exact int64 (associative), the md5 half
    # is the same hex-prefix image both engines compute, and the
    # half-away quantization is bit-pinned in
    # tests/test_r15_moments_kernel.py; the decimal numerator machinery
    # below is unchanged.
    from sdg_data_catalog_spark.operators.moments import label_moment_partials

    parts = label_moment_partials(emb, _Q, _DIM, with_half=True)
    zero = F.lit(0).cast("bigint")
    is_a, is_b = F.col("half") == 0, F.col("half") == 1
    m = parts.groupBy("label").agg(
        F.sum(F.when(is_a, F.col("n")).otherwise(zero)).alias("n_a"),
        F.sum(F.when(is_b, F.col("n")).otherwise(zero)).alias("n_b"),
        *[
            agg
            for d in range(_DIM)
            for agg in (
                F.sum(F.when(is_a, F.col(f"s{d}")).otherwise(zero)).alias(f"a{d}"),
                F.sum(F.when(is_b, F.col(f"s{d}")).otherwise(zero)).alias(f"b{d}"),
            )
        ],
    )
    diffs = F.array(
        *[
            (F.col("n_b") * F.col(f"a{d}") - F.col("n_a") * F.col(f"b{d}"))
            for d in range(_DIM)
        ]
    )
    num = F.aggregate(
        diffs,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: acc + x.cast("decimal(19,0)") * x.cast("decimal(19,0)"),
    )
    shift = (
        num.cast("double")
        / (
            F.col("n_a").cast("double")
            * F.col("n_b")
            * F.col("n_a")
            * F.col("n_b")
        )
        / float(_Q)
        / float(_Q)
    )
    return (
        m.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "label",
            "n_a",
            "n_b",
            (F.floor(shift * 1e6) / 1e6).alias("centroid_shift_sq"),
        )
    )


_B = 32  # bootstrap resamples
# cumulative Poisson(1) probabilities — the inverse-CDF table both engines
# share, emitted as exact repr() literals so the comparison constants are
# bit-identical
_POIS_CDF = []
_acc, _term = 0.0, math.exp(-1.0)
for _k in range(8):
    _acc += _term
    _POIS_CDF.append(_acc)
    _term /= _k + 1


def _pois_w_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {p!r} THEN {k}" for k, p in enumerate(_POIS_CDF)
    )
    return f"(CASE {cases} ELSE 8 END)"


@register(
    "agg_bootstrap_ci",
    oracle=f"""
    WITH expanded AS (
      SELECT source, n_chars, b,
             ((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
                                     || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT)
               % 1000000) + 0.5) / 1000000.0 AS u
      FROM documents, range({_B}) t(b)
    ),
    res AS (
      SELECT source, b,
             CAST(SUM({_pois_w_sql("u")} * n_chars) AS BIGINT) AS wx,
             CAST(SUM({_pois_w_sql("u")}) AS BIGINT) AS w
      FROM expanded GROUP BY source, b
    ),
    means AS (
      SELECT source, CAST(wx AS DOUBLE) / w AS mb FROM res WHERE w > 0
    ),
    base AS (
      SELECT source, CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_raw,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    )
    SELECT base.source, n_docs,
           FLOOR(mean_raw * 1e6) / 1e6 AS mean_chars,
           FLOOR(quantile_cont(mb, 0.025) * 1e6) / 1e6 AS ci_lo,
           FLOOR(quantile_cont(mb, 0.975) * 1e6) / 1e6 AS ci_hi
    FROM means JOIN base USING (source)
    GROUP BY base.source, n_docs, mean_raw
    """,
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for the mean document length per source, via the
    POISSON bootstrap — the only bootstrap that distributes: classical
    resampling draws n rows WITH replacement (global coordination), while
    Poisson(1) per-row weights are independent, so each of the {_B}
    resamples is one weighted aggregation riding a single corpus pass
    (Chamandy et al. 2012; the estimator ships in every large-scale
    experiment platform). Weights are DETERMINISTIC: md5(doc_id, b) ->
    uniform -> fixed inverse-CDF table (exact repr literals shared with
    the oracle), so the same resamples materialize on every engine and
    run — rand()-based bootstraps are untestable and irreproducible.

    Dataflow: one explode of a {_B}-slot weight array per row, partial
    aggregation collapses to |sources| x {_B} rows before the shuffle;
    resample sums are exact integers (weight x n_chars); the CI is the
    2.5/97.5 interpolated percentile of the resample means (Spark
    percentile == DuckDB quantile_cont, the ts_anomaly_mad-proven
    equivalence), floor-truncated at 1e-6."""
    docs = table(spark, sf_dir, "documents")
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit("#"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        )
        + 0.5
    ) / 1000000.0
    w = F.lit(8)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    expanded = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    )
    res = expanded.groupBy("source", "b").agg(
        F.sum(w * F.col("n_chars")).cast("bigint").alias("wx"),
        F.sum(w).cast("bigint").alias("w"),
    )
    means = res.filter(F.col("w") > 0).select(
        "source", (F.col("wx").cast("double") / F.col("w")).alias("mb")
    )
    base = docs.groupBy("source").agg(
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("mean_raw"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    ci = means.groupBy("source").agg(
        (F.floor(F.percentile(F.col("mb"), F.lit(0.025)) * 1e6) / 1e6).alias("ci_lo"),
        (F.floor(F.percentile(F.col("mb"), F.lit(0.975)) * 1e6) / 1e6).alias("ci_hi"),
    )
    return (
        base.join(ci, "source")
        .select(
            "source",
            "n_docs",
            (F.floor(F.col("mean_raw") * 1e6) / 1e6).alias("mean_chars"),
            "ci_lo",
            "ci_hi",
        )
    )


_ASOF_TOL_US = 7 * 24 * 3600 * 1_000_000  # 7 days


@register(
    "join_asof_fwd_tolerance",
    oracle=f"""
    WITH s AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'signup'
    ),
    p AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
      WHERE event_type = 'purchase'
    )
    SELECT s.event_id, s.user_id,
           CAST(MIN(CASE WHEN p.ts_us >= s.ts_us
                          AND p.ts_us - s.ts_us <= {_ASOF_TOL_US}
                         THEN p.ts_us END) AS BIGINT) AS next_purchase_us,
           MIN(CASE WHEN p.ts_us >= s.ts_us
                     AND p.ts_us - s.ts_us <= {_ASOF_TOL_US}
                    THEN p.ts_us END) IS NOT NULL AS matched
    FROM s LEFT JOIN p ON p.user_id = s.user_id
    GROUP BY s.event_id, s.user_id, s.ts_us
    """,
)
def join_asof_fwd_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: each signup event matched to
    the same user's NEXT purchase no more than 7 days later — pandas
    merge_asof(direction='forward', tolerance=...) semantics, the other
    half of the as-of family (`join_asof` is backward/unbounded).

    Shuffle-once (the join_asof template, time-reversed): both event
    slivers union, ONE window per user ordered by ts DESCENDING with an
    event-kind tie-break (purchases sort before same-microsecond
    signups, matching the oracle's >= bound) carries the minimum future
    purchase timestamp backward; the tolerance is a map-side filter on
    the result. No self-join, no per-row subquery — the oracle pays the
    quadratic LEFT JOIN + per-pair MIN precisely because declarative SQL
    without windows cannot express this shape efficiently, which is the
    point of owning the operator. Timestamps surface as epoch
    MICROSECONDS (repo convention)."""
    ev = table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    tagged = ev.filter(F.col("event_type").isin("signup", "purchase")).select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        "event_type",
        F.when(F.col("event_type") == "purchase", ts_us).alias("purchase_ts"),
    )
    # descending scan: at each row, min purchase_ts over rows with
    # ts_us >= current (purchase first on exact ties via the kind key)
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts_us").desc(),
            # purchases precede signups at the same microsecond so an
            # equal-ts purchase is visible to the signup's frame (>= bound)
            F.when(F.col("event_type") == "purchase", 0).otherwise(1).asc(),
            F.col("event_id").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt = F.min("purchase_ts").over(w)
    return (
        tagged.withColumn("next_any", nxt)
        .filter(F.col("event_type") == "signup")
        .select(
            "event_id",
            "user_id",
            F.when(
                F.col("next_any") - F.col("ts_us") <= _ASOF_TOL_US, F.col("next_any")
            ).alias("next_purchase_us"),
            (
                F.coalesce(
                    F.col("next_any") - F.col("ts_us") <= _ASOF_TOL_US, F.lit(False)
                )
            ).alias("matched"),
        )
    )
