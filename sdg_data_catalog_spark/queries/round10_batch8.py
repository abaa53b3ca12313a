"""Round-10 operator batch 8: LSH recall/precision evaluation, CDC
compaction, Neyman sampling allocation, and freshness SLA monitoring.

- ``curation_lsh_recall_eval`` — the evaluation a dedup pipeline runs
  before trusting LSH: candidate pairs from the pinned 4×4 minhash
  banding vs ground-truth pairs (exact 3-shingle Jaccard ≥ 0.6) on the
  planted near-dup corpus; recall/precision as exact integer DIV
  images. Both pair sets come from the ladder's own operators, so this
  certifies the production path end-to-end (at 100 TB the truth side
  runs on a sample; the candidate side is the production band join).
- ``etl_cdc_compact`` — change-data-capture compaction (the
  last-write-wins MERGE a lakehouse table keeps running): events are
  versions keyed by (user_id, event_type), latest (ts, event_id) wins,
  value < 100 marks a tombstone. One groupBy with an in-row lexical
  max-struct — never a per-key sort window; versions-per-key and
  live/deleted verdicts ride the same pass.
- ``sample_neyman_allocation`` — optimal (Neyman) stratified-sample
  allocation n_h ∝ N_h·S_h over source strata, with LARGEST-REMAINDER
  rounding so the allocations sum to the budget exactly: per-stratum
  exact decimal moments → one identical double σ_h → integer floor +
  remainder-ranked top-up. The planning step before split/sample ops.
- ``dq_freshness_sla`` — per-event-type freshness: latest timestamp,
  lag behind the corpus watermark in exact epoch-micros, and the SLA
  verdict (lag ≤ 24 h) as integer comparisons.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_BUDGET = 1000  # Neyman total sample budget
_SLA_MICROS = 24 * 3600 * 1_000_000


def _lsh_eval_oracle() -> str:
    from sdg_data_catalog_spark.queries.dedup_similarity import (
        _BANDS_SQL,
        _CORPUS_SQL,
        _SHINGLE_SQL,
        _SIG_SQL,
        _XP_SQL,
    )

    return f"""
    WITH {_CORPUS_SQL},
    {_SHINGLE_SQL},
    {_XP_SQL},
    {_SIG_SQL},
    {_BANDS_SQL},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT doc_a, doc_b FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(common AS DOUBLE) / (sa.n_sh + sb.n_sh - common) >= 0.6
    ),
    counts AS (
        SELECT (SELECT COUNT(*) FROM truth) AS n_true,
               (SELECT COUNT(*) FROM cand) AS n_candidates,
               (SELECT COUNT(*) FROM truth t
                JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
                 AS n_hits
    )
    SELECT CAST(n_true AS BIGINT) AS n_true,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(CASE WHEN n_true = 0 THEN 0
                     ELSE 1000000 * n_hits // n_true END AS BIGINT)
             AS recall_x1e6,
           CAST(CASE WHEN n_candidates = 0 THEN 0
                     ELSE 1000000 * n_hits // n_candidates END AS BIGINT)
             AS precision_x1e6
    FROM counts
    """


@register("curation_lsh_recall_eval", oracle=_lsh_eval_oracle())
def curation_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the production MinHash-LSH candidate join
    against exact-Jaccard ground truth on the planted near-dup corpus —
    run THROUGH the ladder's own operators (minhash_band_pairs,
    jaccard_pairs_blocked), so the number certifies the deployed path:
    signature build, banding, bucket join, and the truth pipeline all
    sit inside the hash check. Two corpus passes by design (one per pair
    generator — the plan-audit allowance for two-pipeline evaluators);
    the comparison join runs on pair lists, which are bounded by bucket
    occupancy, not corpus size."""
    from sdg_data_catalog_spark.operators import dedup as D
    from sdg_data_catalog_spark.queries.dedup_similarity import (
        _near_dup_corpus,
    )

    docs = table(spark, sf_dir, "documents")
    corpus = _near_dup_corpus(docs)
    truth = (
        D.jaccard_pairs_blocked(corpus, threshold=0.6)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    cand = D.minhash_band_pairs(corpus).localCheckpoint(eager=True)
    hits = truth.join(cand, ["doc_a", "doc_b"])
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_hit = hits.agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_true.crossJoin(n_cand)
        .crossJoin(n_hit)
        .select(
            F.col("n_true").cast("bigint").alias("n_true"),
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
            F.col("n_hits").cast("bigint").alias("n_hits"),
            F.expr(
                "CAST(CASE WHEN n_true = 0 THEN 0"
                " ELSE 1000000 * n_hits DIV n_true END AS BIGINT)"
            ).alias("recall_x1e6"),
            F.expr(
                "CAST(CASE WHEN n_candidates = 0 THEN 0"
                " ELSE 1000000 * n_hits DIV n_candidates END AS BIGINT)"
            ).alias("precision_x1e6"),
        )
    )


@register(
    "etl_cdc_compact",
    oracle="""
    WITH versioned AS (
        SELECT user_id, event_type, event_id,
               epoch_us(ts) AS ts_us,
               CAST(FLOOR(value * 1e6) AS BIGINT) AS value_x1e6,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               COUNT(*) OVER (PARTITION BY user_id, event_type)
                 AS n_versions
        FROM events
    )
    SELECT user_id, event_type,
           CAST(n_versions AS BIGINT) AS n_versions,
           CAST(event_id AS BIGINT) AS last_event_id,
           value_x1e6 AS last_value_x1e6,
           value_x1e6 >= 100000000 AS is_live
    FROM versioned WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def etl_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins CDC compaction: every event is a version of the
    (user_id, event_type) key; the latest (ts, event_id) version
    survives, and a final value < 100 is a tombstone (is_live = false) —
    the MERGE a lakehouse runs to keep a compacted current-state table.
    ONE groupBy with an in-row lexical max-struct over (ts, event_id,
    payload) — no per-key sort window, so the compaction is a single
    partial-agg-friendly shuffle at any corpus size. The version count
    rides the same pass."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1e6).cast("bigint").alias("value_x1e6"),
    )
    last = F.max(
        F.struct("ts", "event_id", "value_x1e6")
    ).alias("last")
    return (
        v.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_versions"), last)
        .select(
            "user_id",
            "event_type",
            "n_versions",
            F.col("last.event_id").cast("bigint").alias("last_event_id"),
            F.col("last.value_x1e6").alias("last_value_x1e6"),
            (F.col("last.value_x1e6") >= 100_000_000).alias("is_live"),
        )
        .orderBy("user_id", "event_type")
    )


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH m AS (
        SELECT source,
               CAST(COUNT(*) AS HUGEINT) AS n_h,
               CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS s1,
               CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT) AS s2
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_h,
               CAST(n_h AS DOUBLE)
                 * sqrt(CAST(n_h * s2 - s1 * s1 AS DOUBLE)
                        / (CAST(n_h AS DOUBLE) * CAST(n_h AS DOUBLE)))
                 AS weight
        FROM m
    ),
    tot AS (SELECT SUM(weight) AS tw FROM w),
    raw AS (
        SELECT source, CAST(n_h AS BIGINT) AS n_h,
               CAST(FLOOR({_BUDGET} * weight / tw) AS BIGINT) AS base,
               CAST(FLOOR(1e9 * ({_BUDGET} * weight / tw
                    - FLOOR({_BUDGET} * weight / tw))) AS BIGINT) AS rem_img
        FROM w, tot
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem_img DESC, source) AS rk,
               (SELECT {_BUDGET} - SUM(base) FROM raw) AS shortfall
        FROM raw
    )
    SELECT source, n_h, base,
           CAST(base + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END
                AS BIGINT) AS n_alloc
    FROM ranked ORDER BY source
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified allocation of a 1000-doc sample
    budget across source strata: n_h ∝ N_h·σ_h (σ_h of n_chars from
    exact decimal moments — one identical sqrt expression both engines),
    then largest-remainder rounding so Σ n_alloc = budget EXACTLY (base
    floors + top-up of the largest 10⁻⁹-imaged remainders, source as
    tie-break). Moments are one corpus pass; everything after runs on
    the 20-row strata table, where the rank window is free. The
    allocation feeds split_stratified/sample_pps downstream."""
    docs = table(spark, sf_dir, "documents")
    m = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_h"),
        F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("n_chars").cast("decimal(38,0)") * F.col("n_chars")).alias(
            "s2"
        ),
    )
    weight = F.col("n_h").cast("double") * F.sqrt(
        (F.col("n_h") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("n_h").cast("double") * F.col("n_h").cast("double"))
    )
    w = m.select("source", "n_h", weight.alias("weight")).localCheckpoint(
        eager=True
    )
    tot = w.agg(F.sum("weight").alias("tw"))
    raw_alloc = _BUDGET * F.col("weight") / F.col("tw")
    raw = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_h").cast("bigint").alias("n_h"),
        F.floor(raw_alloc).cast("bigint").alias("base"),
        F.floor(1e9 * (raw_alloc - F.floor(raw_alloc)))
        .cast("bigint")
        .alias("rem_img"),
    )
    shortfall = raw.agg(
        (F.lit(_BUDGET) - F.sum("base")).cast("bigint").alias("shortfall")
    )
    # the rank window runs on the 20-row strata table, coalesced to one
    # partition with a non-foldable constant partition key (the repo's
    # bounded-global-window convention — no WindowExec warning, no
    # corpus-sized single partition anywhere near this)
    rk = F.row_number().over(
        Window.partitionBy(F.spark_partition_id()).orderBy(
            F.col("rem_img").desc(), "source"
        )
    )
    return (
        raw.crossJoin(F.broadcast(shortfall))
        .coalesce(1)
        .withColumn("rk", rk)
        .select(
            "source",
            "n_h",
            "base",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("shortfall"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_alloc"),
        )
        .orderBy("source")
    )


@register(
    "dq_freshness_sla",
    oracle=f"""
    WITH per_type AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(epoch_us(ts)) AS last_us
        FROM events GROUP BY event_type
    ),
    wm AS (SELECT MAX(last_us) AS watermark_us FROM per_type)
    SELECT event_type, n_events,
           CAST(watermark_us - last_us AS BIGINT) AS lag_micros,
           (watermark_us - last_us) <= {_SLA_MICROS} AS within_sla
    FROM per_type, wm
    ORDER BY event_type
    """,
)
def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness monitor: each event type's latest timestamp,
    its lag behind the corpus watermark (max ts anywhere) in exact
    epoch-micros, and the 24 h SLA verdict — the ingestion-health check
    a pipeline pages on. One grouped pass to the 5-row type table; the
    watermark is a broadcast 1-row aggregate of that table (no second
    corpus scan); every comparison is exact integer micros."""
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_us"),
    ).localCheckpoint(eager=True)
    wm = per_type.agg(F.max("last_us").alias("watermark_us"))
    return (
        per_type.crossJoin(F.broadcast(wm))
        .select(
            "event_type",
            "n_events",
            (F.col("watermark_us") - F.col("last_us"))
            .cast("bigint")
            .alias("lag_micros"),
            (
                (F.col("watermark_us") - F.col("last_us")) <= _SLA_MICROS
            ).alias("within_sla"),
        )
        .orderBy("event_type")
    )
