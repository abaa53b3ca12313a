"""Round-6 operator batch: dimensional-warehouse and rule-mining surface.

Four operators a catalog/warehouse engine is expected to carry that the
registry did not yet: incremental Type-2 SCD maintenance
(`etl_scd2_merge` — the nightly merge, vs the existing from-scratch
`etl_scd2` build), a binned interval-overlap range join
(`join_interval_overlap` — the "range join" custom-operator class Spark
has no native operator for), association rules with confidence/lift on
top of the frequent-pair miner (`fpm_assoc_rules`), and a per-language
tokenizer-fertility audit (`agg_tokenizer_fertility` — the
tokens-per-word statistic multilingual LLM data work sizes corpora by).

All four carry full DuckDB oracles. Conventions: timestamps surface as
epoch MICROSECONDS (`unix_micros` ≡ `epoch_us`, the repo-wide rule for
cross-engine timestamp hashing), ratios are exact integer-count ratios
rounded to 6 dp on both sides, and every output is scalar-typed (driver
canonicalization is scalar-only).

Reference analog: none direct — the reference is a flat pandas/SQLite
pipeline; this is new-engine surface in the SURVEY §2.11 north-star
class (warehouse dimension maintenance, range joins, rule mining).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


_SCD2_CUTOFF = "2024-01-24 00:00:00"  # ~77% of the 30-day event span


@register(
    "etl_scd2_merge",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      FROM events WHERE user_id % 3 = 0
    ),
    ordered AS (
      SELECT user_id, event_type, ts_us, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts_us, event_id) AS prev_type
      FROM ev
    ),
    changes AS (
      SELECT user_id, event_type, ts_us, event_id FROM ordered
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    -- event_id tie-break: two same-microsecond change rows for one user
    -- would otherwise make the LEAD (valid_to/is_current) nondeterministic
    -- and free to diverge between engines
    SELECT user_id,
           event_type AS status,
           CAST(ts_us AS BIGINT) AS valid_from_us,
           CAST(LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                AS BIGINT) AS valid_to_us,
           CAST(LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
                IS NULL AS INTEGER) AS is_current
    FROM changes
    """,
)
def etl_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL Type-2 SCD maintenance — the merge pattern a warehouse
    runs nightly, distinct from the from-scratch build (`etl_scd2`): an
    existing dimension (built from events before the cutoff) absorbs a
    new change batch WITHOUT reprocessing history. The apply is exactly
    the dimension-side twin of `etl_cdc_apply`'s fact merge:

      1. compress the batch per user, SEEDED with the user's current open
         status (a broadcast join against the open-row sliver) — a batch
         event equal to the current state creates no version;
      2. close each affected open row at its user's first new version
         timestamp (left join + coalesce — untouched users pass through);
      3. union closed history + updated opens + new versions.

    Work is proportional to the BATCH (plus the open-row sliver, one row
    per dimension key), never to history — the property that makes SCD2
    maintainable at 100 TB. The oracle is the full-stream rebuild:
    incremental == batch-rebuild is the correctness contract, proven by
    hash (the etl_ann_index_upsert pattern). Validity bounds in epoch
    µs; user_id % 3 bounds the driver comparison."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") % 3 == 0)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    cutoff = F.unix_micros(F.lit(_SCD2_CUTOFF).cast("timestamp"))
    base = ev.select(
        "user_id", "event_type", ts_us.alias("ts_us"), "event_id",
        (ts_us < cutoff).alias("is_hist"),
    )

    def _compress(df: DataFrame, seed: DataFrame | None) -> DataFrame:
        """State-change compression per user: keep rows whose type differs
        from the previous one; `seed` (user_id, seed_status) pre-seeds the
        fold so a batch can continue an existing dimension's state."""
        w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        out = df.withColumn("prev_type", F.lag("event_type").over(w))
        if seed is not None:
            out = out.join(F.broadcast(seed), "user_id", "left").withColumn(
                "prev_type", F.coalesce("prev_type", "seed_status")
            ).drop("seed_status")
        return out.filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        ).select(
            "user_id", F.col("event_type").alias("status"), "ts_us", "event_id"
        )

    def _interval(df: DataFrame) -> DataFrame:
        # event_id tie-break (ADVICE r6): same-microsecond change rows would
        # otherwise make valid_to/is_current order-dependent across engines
        w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        valid_to = F.lead("ts_us").over(w)
        return df.select(
            "user_id", "status",
            F.col("ts_us").cast("bigint").alias("valid_from_us"),
            valid_to.cast("bigint").alias("valid_to_us"),
            valid_to.isNull().cast("int").alias("is_current"),
        )

    # Existing dimension: from-scratch build over pre-cutoff history. In
    # production this is a STORED table — materialize it once here too
    # (it feeds opens, closed, and the seed; without the lineage cut the
    # events scan re-expanded 6x in the audited plan).
    dim = _interval(_compress(base.filter("is_hist"), None)).localCheckpoint(
        eager=True
    )
    opens = dim.filter(F.col("is_current") == 1)
    closed = dim.filter(F.col("is_current") == 0)
    # Batch compression seeded with each user's current open status.
    seed = opens.select("user_id", F.col("status").alias("seed_status"))
    # batch-sized; feeds first_new, the open-row close, and the final union
    new_versions = _interval(
        _compress(base.filter(~F.col("is_hist")), seed)
    ).localCheckpoint(eager=True)
    # Close affected open rows at the user's first new version timestamp.
    first_new = new_versions.groupBy("user_id").agg(
        F.min("valid_from_us").alias("first_new_us")
    )
    updated_opens = (
        opens.join(F.broadcast(first_new), "user_id", "left")
        .select(
            "user_id", "status", "valid_from_us",
            F.coalesce("first_new_us", "valid_to_us").alias("valid_to_us"),
            F.col("first_new_us").isNull().cast("int").alias("is_current"),
        )
    )
    return closed.unionByName(updated_opens).unionByName(new_versions)


_PAD_US = 600_000_000  # ±10 min interval pad
_GAP_US = 1_800_000_000  # 30-min session gap
_BUCKET_US = 3_600_000_000  # 1-hour bin for the range join


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events
    ),
    marked AS (
      SELECT user_id, ts_us, event_id,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > {_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM ev WHERE user_id % 7 = 0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    sess AS (
      -- event_id tie-break: same-microsecond events would otherwise leave
      -- the running-sum frame (hence session bounds) nondeterministic
      SELECT user_id, ts_us,
             SUM(new_s) OVER (PARTITION BY user_id
                 ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    iv AS (
      SELECT user_id, MIN(ts_us) - {_PAD_US} AS lo, MAX(ts_us) + {_PAD_US} AS hi
      FROM sess GROUP BY user_id, sid
    ),
    ivb AS (
      SELECT user_id, lo, hi, UNNEST(range(lo // {_BUCKET_US},
                                           hi // {_BUCKET_US} + 1)) AS bkt
      FROM iv
    ),
    err AS (
      SELECT ts_us, ts_us // {_BUCKET_US} AS bkt FROM ev
      WHERE event_type = 'error'
    )
    SELECT i.user_id,
           CAST(i.lo AS BIGINT) AS lo_us,
           CAST(i.hi AS BIGINT) AS hi_us,
           CAST(COUNT(e.ts_us) AS BIGINT) AS n_err
    FROM ivb i LEFT JOIN err e
      ON e.bkt = i.bkt AND e.ts_us BETWEEN i.lo AND i.hi
    GROUP BY i.user_id, i.lo, i.hi
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap RANGE JOIN, the custom-operator class Spark has
    no native operator for: per-user activity sessions (30-min gap,
    padded ±10 min) probed against the corpus-wide error stream — "how
    many errors landed inside each user's active window". A naive
    theta-join (ts BETWEEN lo AND hi) is a broadcast-nested-loop — a
    corpus × corpus disaster at scale. The scalable shape is BINNING:
    each interval explodes into its covered 1-hour buckets
    (intervals are gap-bounded, so the fan-out per interval is small and
    bounded by interval length / bucket width), each point maps to
    exactly ONE bucket, and the join becomes a hash equi-join on bucket
    followed by the exact containment filter. No point can match an
    interval twice (one bucket per point), so counts need no dedup.
    Sessionization is the standard gap-flag + running-sum pair of
    per-user windows. LEFT join keeps zero-overlap intervals — the
    monitoring answer needs them."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        "event_type",
    )
    mine = ev.filter(F.col("user_id") % 7 == 0)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = mine.withColumn(
        "new_s",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(w) > _GAP_US),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")  # tie-break — see oracle comment
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.withColumn("sid", F.sum("new_s").over(w_run))
    iv = sess.groupBy("user_id", "sid").agg(
        (F.min("ts_us") - _PAD_US).alias("lo"),
        (F.max("ts_us") + _PAD_US).alias("hi"),
    )
    ivb = iv.select(
        "user_id", "lo", "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BUCKET_US),
                F.floor(F.col("hi") / _BUCKET_US),
            )
        ).alias("bkt"),
    )
    err = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("ts_us").alias("err_ts_us"),
            F.floor(F.col("ts_us") / _BUCKET_US).alias("err_bkt"),
        )
    )
    joined = ivb.join(
        err,
        (F.col("bkt") == F.col("err_bkt"))
        & F.col("err_ts_us").between(F.col("lo"), F.col("hi")),
        "left",
    )
    return joined.groupBy("user_id", "lo", "hi").agg(
        F.count("err_ts_us").cast("bigint").alias("n_err")
    ).select(
        "user_id",
        F.col("lo").cast("bigint").alias("lo_us"),
        F.col("hi").cast("bigint").alias("hi_us"),
        "n_err",
    )


_MIN_SUPPORT = 0.002


@register(
    "fpm_assoc_rules",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
    singles AS (
      SELECT l_suppkey AS item, COUNT(*) AS freq FROM b GROUP BY l_suppkey
    ),
    pairs AS (
      SELECT a.l_suppkey AS ia, c.l_suppkey AS ib, COUNT(*) AS fab
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_suppkey < c.l_suppkey
      GROUP BY a.l_suppkey, c.l_suppkey
    ),
    freq_pairs AS (
      SELECT ia, ib, fab FROM pairs, nb
      WHERE fab >= CEIL({_MIN_SUPPORT} * n)
    ),
    rules AS (
      SELECT ia AS ante, ib AS cons, fab FROM freq_pairs
      UNION ALL
      SELECT ib AS ante, ia AS cons, fab FROM freq_pairs
    )
    SELECT CAST(r.ante AS VARCHAR) AS antecedent,
           CAST(r.cons AS VARCHAR) AS consequent,
           CAST(r.fab AS BIGINT) AS pair_freq,
           ROUND(CAST(r.fab AS DOUBLE) / sa.freq, 6) AS confidence,
           ROUND((CAST(r.fab AS DOUBLE) * nb.n)
                 / (CAST(sa.freq AS DOUBLE) * sb.freq), 6) AS lift
    FROM rules r
    JOIN singles sa ON sa.item = r.ante
    JOIN singles sb ON sb.item = r.cons
    CROSS JOIN nb
    """,
)
def fpm_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules with confidence and lift over the supplier
    baskets — the decision layer on top of `fpm_frequent_pairs`: each
    frequent pair (a,b) yields both directed rules with
    confidence(a→b) = supp(ab)/supp(a) and lift = supp(ab)·n /
    (supp(a)·supp(b)). Everything derives from exact integer counts, so
    both engines compute identical doubles (one product, one division —
    no fold-order sensitivity). Scale shape: ONE basket aggregate
    (collect_set per order — the oracle's DISTINCT projection), items
    pruned to the FREQUENT universe first (Apriori monotonicity: an
    infrequent item cannot appear in a frequent pair, so the pre-filter
    provably changes nothing; the frequent-item list is bounded by
    avg_basket/minSupport regardless of corpus size — the
    fpm_frequent_pairs bound), then pairs generated IN-ROW from each
    basket's sorted item array (map-side combinatorics, bounded by
    basket size² — no self shuffle join anywhere) into one
    map-side-combined pair count. Rule stats come from two broadcast
    joins against the metadata-sized singles table. MLlib's FPGrowth
    associationRules is the model-driven twin; this is the
    hash-verifiable closed form."""
    li = table(spark, sf_dir, "lineitem")
    # NOTE r14: replacing the literal array_intersect pre-filter with the
    # fpm_frequent_pairs broadcast-join shape was A/B'd and REJECTED here
    # (2.73 -> 3.22 s at sf0.1): without MLlib's two-pass fit to amortize
    # it, the extra (orderkey, suppkey) DISTINCT exchange costs more than
    # the per-basket literal scan it removes.
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("all_items")
    )
    # The basket table feeds FOUR consumers (n, singles, the frequent-item
    # collect, pair expansion) — persist around them, then localCheckpoint
    # the two SMALL derived tables (result-sized: frequent pairs and the
    # item census) so the returned plan never re-runs the heavy lineage
    # (the FPGrowthModel.freqItemsets lesson from fpm_frequent_pairs).
    baskets = baskets.persist()
    try:
        n_val = baskets.count()
        thresh_val = math.ceil(_MIN_SUPPORT * n_val)
        singles = (
            baskets.select(F.explode("all_items").alias("item"))
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("freq"))
            .localCheckpoint(eager=True)
        )
        # Bounded driver read (≤ avg_basket/minSupport items at any scale —
        # the same bounded-scalar class as the fpm_frequent_pairs collect)
        flist = sorted(
            r.item for r in singles.filter(F.col("freq") >= thresh_val).collect()
        )
        fl_arr = (
            F.array(*[F.lit(x) for x in flist])
            if flist
            else F.array(F.lit(-1).cast("bigint"))
        )
        items = F.sort_array(F.array_intersect("all_items", fl_arr))
        pair_structs = (
            "flatten(transform(items, (x, i) ->"
            " transform(slice(items, i + 2, size(items)),"
            " y -> struct(x AS ia, y AS ib))))"
        )
        pairs = (
            baskets.select(items.alias("items"))
            .select(F.explode(F.expr(pair_structs)).alias("p"))
            .groupBy(F.col("p.ia").alias("ia"), F.col("p.ib").alias("ib"))
            .agg(F.count(F.lit(1)).alias("fab"))
            .filter(F.col("fab") >= thresh_val)
            .withColumn("n", F.lit(n_val))
            .localCheckpoint(eager=True)  # result-sized: frequent pairs only
        )
    finally:
        baskets.unpersist()
    # Both rule directions via ONE explode — a union of two selects over
    # `pairs` would execute the pair-counting self-join subtree twice
    # (the dq_constraints r5 lesson).
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("ia").alias("ante"), F.col("ib").alias("cons")),
                F.struct(F.col("ib").alias("ante"), F.col("ia").alias("cons")),
            )
        ).alias("r"),
        "fab",
        "n",
    ).select("r.ante", "r.cons", "fab", "n")
    sa = singles.select(F.col("item").alias("ante"), F.col("freq").alias("fa"))
    sb = singles.select(F.col("item").alias("cons"), F.col("freq").alias("fb"))
    out = rules.join(F.broadcast(sa), "ante").join(F.broadcast(sb), "cons")
    return out.select(
        F.col("ante").cast("string").alias("antecedent"),
        F.col("cons").cast("string").alias("consequent"),
        F.col("fab").cast("bigint").alias("pair_freq"),
        F.round(F.col("fab").cast("double") / F.col("fa"), 6).alias("confidence"),
        F.round(
            (F.col("fab").cast("double") * F.col("n"))
            / (F.col("fa").cast("double") * F.col("fb")),
            6,
        ).alias("lift"),
    )


_TOK_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


@register(
    "agg_tokenizer_fertility",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             len(string_split(text, ' ')) AS words,
             len(regexp_extract_all(lower(text), '{_TOK_RE}')) AS toks,
             n_chars
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS n_words,
           CAST(SUM(toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(toks) AS DOUBLE) / SUM(words), 6) AS fertility,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(toks), 6)
             AS chars_per_token
    FROM per_doc
    GROUP BY lang
    """,
)
def agg_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility audit — tokens-per-word and
    chars-per-token under a BPE-ish word-piece proxy (lowercase letter
    runs, single digits, single punctuation marks — the pre-tokenizer
    split every BPE/WordPiece vocabulary starts from). Fertility is THE
    statistic multilingual LLM data work sizes corpora by: a language
    with fertility 2× the corpus mean pays 2× the context budget per
    word, which drives per-language sampling quotas
    (sample_domain_quota) and token-budget planning (plan_token_budget).
    Entirely map-side (regexp count per row, no explode — the token
    ARRAY never materializes in the shuffle) into a |languages|-row
    aggregate; all ratios are exact integer-count ratios rounded on both
    engines."""
    docs = table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(F.split("text", " ")).alias("words"),
        F.size(
            F.expr(f"regexp_extract_all(lower(text), '{_TOK_RE}', 0)")
        ).alias("toks"),
        "n_chars",
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("n_words"),
        F.sum("toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("toks").cast("double") / F.sum("words"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("toks"), 6
        ).alias("chars_per_token"),
    )
