"""Round-4 curation additions: sessionization, deterministic weighted
sampling, per-domain quotas, curriculum interleaving, feature hashing,
group modes, and character-entropy quality scoring.

All seven are engine-added operators (SURVEY.md §2.11 — no reference
analog; the reference's closest moves are pandas `.apply` loops over an
in-memory frame, e.g. `dataset_ner/ner_pipeline.py:117-143`'s per-row
vectorize). Each is a pure declarative DataFrame plan:

- hash-determinism via the same md5-prefix arithmetic `sample_hash` /
  `split_hash` established (queries/scoring_sampling.py:202-258) — the
  selection is a function of row identity, reproducible across engines,
  partitionings, and cluster sizes;
- windows are hash-partitioned on a real key (user_id / source) — no
  global single-partition sort anywhere except over the distinct-source
  dimension, whose cardinality is bounded (domains, not rows);
- every aggregation is map-side-combinable; the only shuffles are the
  per-key groupBys a 1000-executor cluster handles by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

# Session gap: a new session starts after >6h of user inactivity.
_SESSION_GAP_US = 6 * 3600 * 1_000_000


@register(
    "etl_sessionize",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
      FROM ordered
    )
    SELECT user_id,
           CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 6) AS sum_value
    FROM sess
    GROUP BY user_id, session_no
    """,
)
def etl_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization: a session is a maximal run of one
    user's events with no >6h silence between consecutive events.

    The classic two-window formulation — `lag` marks session starts,
    a running `sum` of the start flags numbers the sessions — then one
    groupBy rolls each session up. Both windows and the final aggregation
    hash-partition on `user_id`, so the whole plan is ONE shuffle of the
    events table and scales with users, not with any global sort.
    (`stream_session` at queries/events_json.py is the streaming
    session_window twin of this batch operator; the batch form is what a
    backfill over 100 TB of history runs.) Gap comparisons use integer
    microseconds on both engines (`unix_micros` ≡ `epoch_us`) so the
    boundary is exact, not float."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # The driver parquet types ts as TIMESTAMP_NTZ; unix_micros requires
    # TIMESTAMP, so cast for the gap arithmetic only. The cast's timezone
    # interpretation shifts every value equally, so gap DIFFERENCES are
    # tz-invariant, and the output columns carry the untouched ts.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | (ts_us - prev_us > _SESSION_GAP_US), 1
    ).otherwise(0)
    sess = ev.withColumn("session_no", F.sum(is_new).over(w))
    return sess.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


@register(
    "sample_weighted",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM (
      SELECT doc_id, source, n_chars,
             ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) + 1) / 4294967296.0) / n_chars AS k
      FROM documents
    )
    ORDER BY k DESC, doc_id
    LIMIT 100
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row gets key ln(u)/w with u a
    uniform(0,1] derived from md5(doc_id) and w = n_chars; the k largest
    keys ARE a weighted sample without replacement. Because u is a pure
    function of row identity (not rand()), the sample is reproducible
    across engines, runs, and cluster sizes — same auditable-pipeline
    property as `sample_hash`, extended to non-uniform weights (longer
    documents proportionally likelier, the standard size-weighted corpus
    subsample). Plan: codegen'd key expression + TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver, no global sort
    shuffle. Tie risk at the k-th key is ln() ulp-level (~1e-16 relative
    on random 32-bit u) and carries a doc_id tie-break."""
    docs = table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
    u = (h.cast("double") + F.lit(1.0)) / F.lit(4294967296.0)
    key = F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), "doc_id")
        .limit(100)
        .select("doc_id", "source", "n_chars")
    )


@register(
    "sample_domain_quota",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY source
                               ORDER BY n_chars DESC, doc_id) <= 5
    """,
)
def sample_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling: keep at most 5 documents per source,
    preferring longer ones (n_chars as the quality proxy, doc_id
    tie-break). The web-corpus curation staple — cap any one domain's
    contribution so crawl skew doesn't dominate the training mixture.
    One hash-partitioned window on `source`; Spark runs it as a single
    shuffle with the rank filter applied before anything downstream, and
    AQE's skew handling covers a pathological mega-domain."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "source", "n_chars")
    )


@register(
    "etl_interleave",
    oracle="""
    WITH s AS (
      SELECT source,
             row_number() OVER (ORDER BY source) - 1 AS sidx,
             COUNT(*) OVER () AS n_src
      FROM (SELECT DISTINCT source FROM documents)
    ),
    r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS rn
      FROM documents
    )
    SELECT r.doc_id, r.source,
           CAST(r.rn * s.n_src + s.sidx AS BIGINT) AS pos
    FROM r JOIN s USING (source)
    """,
)
def etl_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin interleave across sources — the training
    curriculum order that alternates domains instead of streaming one
    domain's shard block after another's (a shuffled-enough batch mix
    without a global shuffle). Position arithmetic: doc i of source s
    lands at `rank_within_source * n_sources + source_index`, which is a
    bijection, so a trainer can range-partition on `pos` and read a
    balanced mixture in every span. The only global window runs over the
    DISTINCT source dimension (bounded cardinality — domains, not rows);
    the per-source rank is hash-partitioned and the dimension joins back
    via broadcast. Contrast `shuffle_shards` (hash-random order): this is
    the stratified-order twin."""
    docs = table(spark, sf_dir, "documents")
    src = docs.select("source").distinct().coalesce(1)
    # Tiny dimension (distinct domains, one partition): partition both
    # windows on the constant physical partition id — bounded by domain
    # cardinality, never by corpus size, and no WindowExec warning.
    sw = Window.partitionBy(F.spark_partition_id()).orderBy("source")
    src = src.select(
        "source",
        (F.row_number().over(sw) - 1).alias("sidx"),
        F.count(F.lit(1))
        .over(Window.partitionBy(F.spark_partition_id()))
        .alias("n_src"),
    )
    rw = Window.partitionBy("source").orderBy("doc_id")
    ranked = docs.select(
        "doc_id", "source", (F.row_number().over(rw) - 1).alias("rn")
    )
    return ranked.join(F.broadcast(src), "source").select(
        "doc_id",
        "source",
        (F.col("rn") * F.col("n_src") + F.col("sidx")).cast("long").alias("pos"),
    )


@register(
    "feat_hashing_tf",
    oracle="""
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64
                AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS tf
    FROM (
      SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS tok
      FROM documents
      WHERE doc_id % 20 = 0
    )
    WHERE tok <> ''
    GROUP BY doc_id, bucket
    """,
)
def feat_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick): token → md5-derived bucket in
    [0, 64), per-document term frequencies per bucket — a fixed-width
    sparse feature vector with NO vocabulary table to build, broadcast, or
    keep consistent across runs (the property that matters when the vocab
    itself won't fit or drifts between corpus versions; cf. MLlib
    HashingTF, re-expressed engine-portably via the md5 arithmetic both
    engines share). Plan: explode + codegen'd bucket expression + one
    map-side-combinable groupBy on (doc_id, bucket). The doc_id % 20
    subsample bounds the driver-side comparison; the operator itself is
    corpus-wide. Reference analog: the ad-hoc vocab id maps of
    dataset_ner/ner_pipeline.py:111-115, which require a driver-resident
    dict."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    # r14 (guide §4.1): regexp_extract_all('[a-z]+') emits the same
    # maximal letter runs as split-on-'[^a-z]+' + drop-empties, with no
    # empty-token rows ever exploded (the curation_quality tokenization
    # lesson, ~1.7x on explode paths)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % 64
    ).alias("bucket")
    return toks.groupBy("doc_id", bucket).agg(
        F.count(F.lit(1)).alias("tf")
    )


@register(
    "agg_mode_per_group",
    oracle="""
    SELECT source, lang AS mode_lang, CAST(cnt AS BIGINT) AS n_docs
    FROM (
      SELECT source, lang, COUNT(*) AS cnt
      FROM documents
      GROUP BY source, lang
    )
    QUALIFY row_number() OVER (PARTITION BY source
                               ORDER BY cnt DESC, lang) = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value, deterministic tie-break):
    the dominant language of each source — the curation signal behind
    per-domain language routing. Two-level plan: a map-side-combinable
    (source, lang) count, then a window rank over the *aggregated* frame
    (cardinality = sources × langs, already tiny), so the corpus is
    touched exactly once and the window never sees raw rows."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), "lang")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("lang").alias("mode_lang"),
            F.col("cnt").alias("n_docs"),
        )
    )


@register(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c
      FROM documents
      WHERE doc_id % 20 = 0
    ),
    counts AS (
      SELECT doc_id, c, COUNT(*) AS cnt
      FROM chars
      GROUP BY doc_id, c
    ),
    totals AS (
      SELECT doc_id, SUM(cnt) AS n
      FROM counts
      GROUP BY doc_id
    )
    SELECT counts.doc_id,
           ROUND(-SUM((cnt / CAST(n AS DOUBLE))
                      * ln(cnt / CAST(n AS DOUBLE))), 6) AS entropy
    FROM counts JOIN totals ON counts.doc_id = totals.doc_id
    GROUP BY counts.doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap
    gibberish/boilerplate detector (near-zero entropy = repeated filler,
    ~log(alphabet) = natural text; used alongside `text_repetition_score`
    and `text_quality_score` as a corpus quality gate). Both groupBys
    hash-partition on doc_id, so the char explosion never crosses
    documents and partial aggregation collapses it map-side; the totals
    join is doc-level (post-aggregation), not char-level. The doc_id % 20
    subsample bounds the driver comparison; at 100 TB the same plan runs
    unfiltered."""
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    ).filter(F.col("c") != "")
    counts = chars.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n").cast("double")
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )


@register(
    "plan_token_budget",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, tokens,
               pow(tokens, CAST(0.7 AS DOUBLE))
                 / SUM(pow(tokens, CAST(0.7 AS DOUBLE))) OVER () AS weight
        FROM s
    )
    SELECT source, tokens,
           FLOOR(weight * 1e6) / 1e6 AS weight,
           CAST(FLOOR(weight * 500000) AS BIGINT) AS quota_tokens,
           FLOOR(LEAST(CAST(1.0 AS DOUBLE), weight * 500000 / tokens) * 1e6)
             / 1e6 AS sampling_rate
    FROM w
    """,
)
def plan_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget planning: turn a global training budget (500k tokens)
    into per-source quotas under temperature-weighted mixing (T=0.7 —
    upweights small sources relative to proportional sampling, the
    standard multilingual/multi-domain recipe). This is the PLANNING
    step ahead of the samplers: sample_temperature draws with these
    relative weights, sample_mixture enforces per-domain keep-rates, and
    this operator computes what those rates should BE — per-source token
    mass (one shuffle, partial-aggregated word counts), share^T
    normalization over the sources dimension (a |sources|-row window),
    and the resulting quota + capped sampling rate. All closed-form
    column math; floor-truncated surfaces (pow is libm — identical
    doubles, but half-up rounding would diverge on ties)."""
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("tokens")
    )
    # broadcast the 1-row denominator instead of an unpartitioned window;
    # persisted so the denominator reuses the aggregate (one docs scan)
    from pyspark import StorageLevel

    s = s.persist(StorageLevel.MEMORY_AND_DISK)
    denom = s.agg(F.sum(F.pow(F.col("tokens"), 0.7)).alias("denom"))
    s = s.crossJoin(F.broadcast(denom))
    weight = F.pow(F.col("tokens"), 0.7) / F.col("denom")
    budget = 500000
    return s.select(
        "source",
        "tokens",
        (F.floor(weight * 1e6) / 1e6).alias("weight"),
        F.floor(weight * budget).cast("bigint").alias("quota_tokens"),
        (
            F.floor(F.least(F.lit(1.0), weight * budget / F.col("tokens")) * 1e6)
            / 1e6
        ).alias("sampling_rate"),
    )
