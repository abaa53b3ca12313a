"""ML-evaluation, experimentation, and governance operators (engine-added,
SURVEY.md §2.11 north star).

The training-data loop needs more than curation: once a model exists you
need fold assignment that is reproducible across engines and corpus
growth (`split_kfold`), evaluation that is a dataflow rather than a
driver-side sklearn call (`agg_confusion_matrix` — the reference's
missing `evaluation` module, SURVEY §0 known defects, recast as a
groupBy), behavioural experiment readouts (`agg_ab_test`), distribution
monitoring between ingest periods (`dq_profile_drift`), and
privacy-governance passes before publication (`etl_k_anonymize`).
All are pure column arithmetic — every operator here is hash-checked
against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


def _hash_long(col):
    """First 8 md5 hex digits as a long — the engine-portable hash unit
    shared with sample_hash / feat_hashing_tf (curation_extra.py)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


@register(
    "split_kfold",
    oracle="""
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 5 AS INTEGER) AS fold
    FROM documents
    """,
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (k=5) by md5 arithmetic on the key.

    Cross-validation folds from `rand()` are irreproducible across runs and
    engines and reshuffle every row when the corpus grows; hashing the key
    gives folds that are stable per document forever — a new document lands
    in one fold without moving any existing one (the property
    train_test_split(random_state=42) at ner_pipeline.py:71-77 only
    approximates within a single process). Pure map-side: no shuffle, no
    state, embarrassingly parallel at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", (_hash_long(F.col("doc_id")) % 5).cast("int").alias("fold")
    )


@register(
    "agg_confusion_matrix",
    oracle="""
    SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS label,
           CASE WHEN list_contains(string_split(text, ' '), 'the')
                THEN 'en' ELSE 'other' END AS pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents
    GROUP BY 1, 2
    """,
)
def agg_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix as a dataflow: label × prediction → count.

    The reference imports a missing `evaluation` module for exactly this
    readout (ner_pipeline.py:294-334, SURVEY §0 defects); here the whole
    matrix is one groupBy over indicator columns — partial-aggregated
    map-side, four result rows regardless of corpus size. The stand-in
    classifier is the deterministic token heuristic ('the' ∈ tokens ⇒
    English) so both engines reproduce it bit-for-bit; a real model slots
    in as a mapInPandas scorer upstream (udf_bert_classify) without
    touching this aggregation."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.when(F.col("lang") == "en", "en").otherwise("other").alias("label"),
            F.when(
                F.array_contains(F.split(F.col("text"), " "), "the"), "en"
            )
            .otherwise("other")
            .alias("pred"),
        )
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "agg_entropy_by_group",
    oracle="""
    WITH cnt AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(SUM(c) AS BIGINT) AS n_events,
           ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 4) AS entropy
    FROM cnt GROUP BY user_id
    """,
)
def agg_entropy_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioural-diversity signal (bot traffic ≈ zero entropy, organic ≈
    high). Uses the algebraic form H = ln(n) − Σc·ln(c)/n so both
    aggregation levels are plain sums: the per-(user,type) count shuffles
    once, then the per-user fold runs over the already-tiny counts table
    (≤ |users|×|types| rows) — no window, no second scan of raw events."""
    ev = table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.round(
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 4
        ).alias("entropy"),
    )


@register(
    "agg_ab_test",
    oracle="""
    WITH u AS (
        SELECT user_id,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                 % 2 AS variant,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    v AS (
        SELECT variant, COUNT(*) AS n, SUM(converted) AS conv
        FROM u GROUP BY variant
    ),
    w AS (
        SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n_a,
               MAX(CASE WHEN variant = 1 THEN n END) AS n_b,
               MAX(CASE WHEN variant = 0 THEN conv END) AS c_a,
               MAX(CASE WHEN variant = 1 THEN conv END) AS c_b
        FROM v
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(c_a * 1.0 / n_a, 4) AS rate_a,
           ROUND(c_b * 1.0 / n_b, 4) AS rate_b,
           ROUND((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
                 / NULLIF(sqrt((c_a + c_b) * 1.0 / (n_a + n_b)
                               * (1 - (c_a + c_b) * 1.0 / (n_a + n_b))
                               * (1.0 / n_a + 1.0 / n_b)), 0), 4) AS z
    FROM w
    """,
)
def agg_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B readout: hash-split users into variants (the
    deterministic assignment every experimentation platform uses — a user
    re-bucketing between reads would corrupt the experiment), conversion =
    ≥1 'purchase', pooled two-proportion z statistic in closed form.

    Plan: one shuffle on user_id for the per-user fold, then the variant
    rollup is 2 rows — the z arithmetic is driver-free column math on a
    single-row frame. At 100 TB the per-user agg is the only real work and
    it is partial-aggregated map-side."""
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    )
    u = u.select(
        (_hash_long(F.col("user_id")) % 2).alias("variant"), "converted"
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c_a"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c_b"),
    )
    p_a = F.col("c_a") / F.col("n_a")
    p_b = F.col("c_b") / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pooled * (1 - pooled) * (1 / F.col("n_a") + 1 / F.col("n_b")))
    return w.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(p_a, 4).alias("rate_a"),
        F.round(p_b, 4).alias("rate_b"),
        F.round((p_a - p_b) / F.nullif(se, F.lit(0)), 4).alias("z"),
    )


@register(
    "dq_profile_drift",
    oracle="""
    WITH s AS (
        SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'a' ELSE 'b' END
                 AS period,
               COUNT(*) AS n, AVG(o_totalprice) AS m,
               VAR_SAMP(o_totalprice) AS v
        FROM orders GROUP BY 1
    ),
    w AS (
        SELECT MAX(CASE WHEN period = 'a' THEN n END) AS n_a,
               MAX(CASE WHEN period = 'b' THEN n END) AS n_b,
               MAX(CASE WHEN period = 'a' THEN m END) AS m_a,
               MAX(CASE WHEN period = 'b' THEN m END) AS m_b,
               MAX(CASE WHEN period = 'a' THEN v END) AS v_a,
               MAX(CASE WHEN period = 'b' THEN v END) AS v_b
        FROM s
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(m_a, 4) AS mean_a, ROUND(m_b, 4) AS mean_b,
           ROUND((m_b - m_a) / sqrt(v_a / n_a + v_b / n_b), 4) AS drift_z
    FROM w
    """,
)
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between ingest periods (Welch z on the mean of
    o_totalprice, old period vs new) — the monitoring companion to
    dq_constraints' hard checks and dq_anomaly_days' volume screen:
    constraint-clean data can still drift into a different distribution
    and silently skew every model trained on it. One scan, two grouped
    (count, mean, variance) folds — all partial-aggregated; the z
    arithmetic runs on a 2-row frame. At 100 TB this is the per-batch
    profile a publish gate would persist beside catalog_stats."""
    od = table(spark, sf_dir, "orders")
    s = od.groupBy(
        F.when(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "a")
        .otherwise("b")
        .alias("period")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("o_totalprice").alias("m"),
        F.var_samp("o_totalprice").alias("v"),
    )
    w = s.agg(
        *[
            F.max(F.when(F.col("period") == p, F.col(c))).alias(f"{c}_{p}")
            for p in ("a", "b")
            for c in ("n", "m", "v")
        ]
    )
    return w.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round(
            (F.col("m_b") - F.col("m_a"))
            / F.sqrt(F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")),
            4,
        ).alias("drift_z"),
    )


@register(
    "etl_k_anonymize",
    oracle="""
    WITH g AS (
        SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY lang, source
    )
    SELECT d.doc_id,
           CASE WHEN g.c < 3 THEN '*' ELSE d.lang END AS lang_anon,
           CASE WHEN g.c < 3 THEN '*' ELSE d.source END AS source_anon
    FROM documents d JOIN g USING (lang, source)
    """,
)
def etl_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression pass (k=3) over the quasi-identifier pair
    (lang, source): any combination shared by fewer than k documents is
    generalized to '*' so no published row is re-identifiable by its QI
    tuple. The group-size table is a tiny aggregate (|langs|×|sources|)
    broadcast back against the corpus — no window over the full data, no
    second shuffle. The 100 TB shape: QI cardinality stays metadata-sized
    even when the corpus doesn't, so suppression is one broadcast join."""
    docs = table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    return docs.join(F.broadcast(g), ["lang", "source"]).select(
        "doc_id",
        F.when(F.col("c") < 3, "*").otherwise(F.col("lang")).alias("lang_anon"),
        F.when(F.col("c") < 3, "*").otherwise(F.col("source")).alias("source_anon"),
    )


@register(
    "text_readability",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
           CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS syllables,
           FLOOR((CAST(206.835 AS DOUBLE)
                  - CAST(1.015 AS DOUBLE) * len(string_split(text, ' '))
                  - CAST(84.6 AS DOUBLE)
                    * (len(regexp_extract_all(text, '[aeiouy]+')) * CAST(1.0 AS DOUBLE)
                       / len(string_split(text, ' ')))) * 1000) / 1000 AS flesch
    FROM documents
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring — the classic readability filter in
    curation stacks (complements text_quality_score's length/punct ratios
    and filter_gopher_rules' thresholds). Syllables are approximated by
    vowel-group runs ([aeiouy]+), the standard dictionary-free heuristic;
    each document is one sentence in this corpus (no terminal punctuation
    in the synthetic text), so the sentence term reduces to the word
    count. Pure codegen'd regex/length arithmetic — zero shuffles, zero
    Python. The score is truncated (floor at 3 decimals), not rounded:
    both engines compute the identical IEEE double, so floor is
    bit-stable while half-up rounding diverges on representation-edge
    ties (seen at .xxx5 in validation)."""
    docs = table(spark, sf_dir, "documents")
    words = F.size(F.split(F.col("text"), " "))
    syl = F.regexp_count(F.col("text"), F.lit("[aeiouy]+"))
    flesch = F.lit(206.835) - 1.015 * words - 84.6 * (syl * 1.0 / words)
    return docs.select(
        "doc_id",
        words.cast("bigint").alias("words"),
        syl.cast("bigint").alias("syllables"),
        (F.floor(flesch * 1000) / 1000).alias("flesch"),
    )


@register(
    "graph_jaccard_neighbors",
    oracle="""
    WITH e AS (
        SELECT DISTINCT l_orderkey AS ord, l_partkey AS part FROM lineitem
    ),
    deg AS (SELECT part, COUNT(*) AS d FROM e GROUP BY part),
    common AS (
        SELECT a.part AS p1, b.part AS p2, COUNT(*) AS c
        FROM e a JOIN e b ON a.ord = b.ord AND a.part < b.part
        GROUP BY a.part, b.part
    )
    SELECT p1, p2,
           ROUND(c * 1.0 / (da.d + db.d - c), 4) AS jaccard
    FROM common
    JOIN deg da ON da.part = p1
    JOIN deg db ON db.part = p2
    ORDER BY jaccard DESC, p1, p2
    LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-Jaccard link prediction on the part co-purchase graph:
    score candidate part pairs by |orders(p1) ∩ orders(p2)| /
    |orders(p1) ∪ orders(p2)|. Candidates come from the wedge join on the
    shared order (same degree-bounded shape as graph_triangle_count —
    never all pairs): only pairs with ≥1 common order are materialized,
    the union size is derived algebraically from the two degrees, and the
    result is a deterministic top-20 (jaccard desc, then keys) →
    TakeOrderedAndProject. At 100 TB the wedge join is bounded by
    Σ_orders |items|² with the hub-order cap that dedup blocking uses —
    items-per-order is naturally small in a retail graph."""
    li = table(spark, sf_dir, "lineitem")
    # the distinct edge list feeds degrees AND both wedge-join sides —
    # materialize once instead of re-scanning lineitem per reference
    # (audited 4 lineitem scans before)
    e = li.select(
        F.col("l_orderkey").alias("ord"), F.col("l_partkey").alias("part")
    ).distinct().localCheckpoint(eager=True)
    deg = e.groupBy("part").agg(F.count(F.lit(1)).alias("d"))
    a = e.alias("a")
    b = e.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.ord") == F.col("b.ord")) & (F.col("a.part") < F.col("b.part")),
        )
        .groupBy(F.col("a.part").alias("p1"), F.col("b.part").alias("p2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    da = deg.select(F.col("part").alias("p1"), F.col("d").alias("d1"))
    db = deg.select(F.col("part").alias("p2"), F.col("d").alias("d2"))
    return (
        common.join(da, "p1")
        .join(db, "p2")
        .select(
            "p1",
            "p2",
            F.round(
                F.col("c") * 1.0 / (F.col("d1") + F.col("d2") - F.col("c")), 4
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "p1", "p2")
        .limit(20)
    )


@register("etl_column_crypto")  # JVM-side AES: rows-only (no AES in DuckDB)
def etl_column_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption for PII-bearing fields: the source column is
    AES-encrypted JVM-side (`aes_encrypt`, 128-bit key) so the published
    table carries ciphertext while authorized readers decrypt in the same
    engine — the governance rung between etl_k_anonymize (suppression)
    and agg_dp_count (noisy aggregates) when the VALUE must survive but
    only for key-holders. ECB mode is chosen deliberately: deterministic
    ciphertext keeps the column joinable/groupable (the classic
    searchable-encryption trade-off — equal plaintexts are linkable,
    which is the point for key-preserving pipelines; swap to GCM when
    linkability itself is the leak). Everything runs in codegen'd JVM
    expressions — no Python, no driver round-trip; rows-only because
    DuckDB has no AES, with the decrypt-equals-original proof emitted as
    a hashed-path column and pinned in tests."""
    docs = table(spark, sf_dir, "documents").limit(500)
    key = "0123456789abcdef"  # demo key; production: column-keyed KMS secret
    enc = docs.select(
        "doc_id",
        F.expr(f"base64(aes_encrypt(source, '{key}', 'ECB'))").alias("source_ct"),
        "source",
    )
    return enc.select(
        "doc_id",
        "source_ct",
        (
            F.expr(f"CAST(aes_decrypt(unbase64(source_ct), '{key}', 'ECB') AS STRING)")
            == F.col("source")
        ).alias("roundtrip_ok"),
    )


@register(
    "etl_pit_features",
    oracle="""
    SELECT e.event_id AS label_event_id,
           e.user_id,
           CAST(COUNT(h.event_id) AS BIGINT) AS n_prior_events,
           CAST(COALESCE(SUM(CAST(ROUND(h.value * 100) AS BIGINT)), 0) AS DOUBLE)
             / 100.0 AS sum_prior_value
    FROM events e
    LEFT JOIN events h
      ON h.user_id = e.user_id
     AND (h.ts < e.ts OR (h.ts = e.ts AND h.event_id < e.event_id))
    WHERE e.event_type = 'purchase'
    GROUP BY e.event_id, e.user_id
    """,
)
def etl_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature assembly: for every label event
    (purchase), the user's activity features computed over STRICTLY
    PRIOR history — the leakage-free training-set construction a feature
    store exists for (a feature computed over rows at-or-after the label
    timestamp trains a model on the future). One shuffle on user_id and
    one running window with a rows-preceding frame builds features for
    every label simultaneously — never a per-label range scan; the
    (ts, event_id) tie-break makes "prior" total and reproducible, and
    the oracle replays exactly that frame as a correlated inequality
    join. Sums ride the exact integer-cent trick (FP summation order
    differs across engines)."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    feat = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.count(F.lit(1)).over(w).alias("n_prior_events"),
        (
            F.coalesce(
                F.sum(F.round(F.col("value") * 100).cast("bigint")).over(w),
                F.lit(0),
            ).cast("double")
            / 100.0
        ).alias("sum_prior_value"),
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_event_id"),
        "user_id",
        F.col("n_prior_events").cast("bigint").alias("n_prior_events"),
        "sum_prior_value",
    )


_BERT_P_SQL = """1.0 / (1.0 + exp(-list_sum(list_transform(range(1, 65),
    i -> CAST(embedding[i] AS DOUBLE)
         * ((((i + 17) * 2654435761) % 1000003 % 97 - 48) / 48.0)))))"""


@register(
    "agg_calibration_bins",
    oracle=f"""
    WITH scored AS (
        SELECT vec_id, {_BERT_P_SQL} AS p, label % 2 AS y FROM embeddings
    )
    SELECT CAST(LEAST(FLOOR(p * 10), 9) AS INTEGER) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(FLOOR(p * 1e6)) AS DOUBLE) / (1e6 * COUNT(*)) AS avg_p,
           CAST(SUM(y) AS DOUBLE) / COUNT(*) AS pos_rate
    FROM scored GROUP BY 1
    """,
)
def agg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-calibration readout: predicted-probability deciles vs the
    empirical positive rate in each bin — the reliability-diagram data
    behind every "is this model over-confident?" review (the evaluation
    depth the reference's missing `evaluation` module never reached).
    Scores come from the deterministic classifier head
    (udf_bert_classify's mapInPandas path), labels from the embeddings
    table (y = label % 2); one partial-aggregated shuffle into ≤10 bins.
    The mean prediction is folded as an exact integer sum of
    FLOOR(p·1e6) — FP summation order differs across engines, truncated
    micro-units don't."""
    from sdg_data_catalog_spark.operators import scoring as SC

    emb = table(spark, sf_dir, "embeddings")
    scored = SC.classify_embeddings(emb).join(
        emb.select("vec_id", (F.col("label") % 2).alias("y")), "vec_id"
    )
    p = F.col("p_positive")
    return (
        scored.groupBy(
            F.least(F.floor(p * 10), F.lit(9)).cast("int").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum(F.floor(p * 1e6)).cast("double")
                / (1e6 * F.count(F.lit(1)))
            ).alias("avg_p"),
            (F.sum("y").cast("double") / F.count(F.lit(1))).alias("pos_rate"),
        )
    )


@register(
    "agg_roc_auc",
    oracle=f"""
    WITH scored AS (
        SELECT vec_id, {_BERT_P_SQL} AS p, label % 2 AS y FROM embeddings
    ),
    ranked AS (
        -- rank the FLOORED atto-fixed-point image of p (multiplication by
        -- a positive constant and floor are both monotone, so the order
        -- is p's order) — the same integer key the Spark side's two-phase
        -- distributed rank sorts, pinning both engines to one total order
        SELECT y, ROW_NUMBER() OVER (ORDER BY FLOOR(p * 1e18), vec_id) AS r
        FROM scored
    )
    SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
           FLOOR((SUM(CASE WHEN y = 1 THEN r END)
                  - SUM(y) * (SUM(y) + 1) / 2.0)
                 / (SUM(y) * (COUNT(*) - SUM(y))) * 1e6) / 1e6 AS auc
    FROM ranked
    """,
)
def agg_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC as a dataflow: the Mann-Whitney rank-sum identity
    AUC = (Σ ranks(positives) − n₊(n₊+1)/2) / (n₊·n₋) — one global rank
    and one aggregate, no quadratic pair comparison. The rank runs
    through `operators/curation.py::running_total` (range-repartition +
    per-partition window + broadcast prefix offsets — was a
    single-partition ORDER BY window until round 7; predictions are
    corpus-sized, so that window was this module's one real scale
    hazard). Both engines rank the floored atto-fixed-point image of p
    with a vec_id tie-break — one pinned total order, exactly
    reproducible — classifier evaluation with a hash-checked AUC."""
    from sdg_data_catalog_spark.operators import scoring as SC
    from sdg_data_catalog_spark.operators.curation import running_total

    emb = table(spark, sf_dir, "embeddings")
    scored = SC.classify_embeddings(emb).join(
        emb.select("vec_id", (F.col("label") % 2).alias("y")), "vec_id"
    )
    # fixed-width key: lexicographic == numeric ONLY while every field
    # fits its width. p*1e18 <= 1e18 always fits %020d; vec_id must stay
    # < 1e12 for %012d (Java Formatter WIDENS on overflow — the order
    # would silently diverge from the oracle's numeric sort), so overflow
    # raises instead of corrupting
    key = F.when(
        F.col("vec_id") < F.lit(10**12),
        F.format_string(
            "%020d:%012d",
            F.floor(F.col("p_positive") * 1e18).cast("long"),
            F.col("vec_id"),
        ),
    ).otherwise(F.raise_error(F.lit("agg_roc_auc: vec_id >= 1e12 overflows the %012d rank key")))
    ranked = running_total(
        scored.withColumn("__key", key), "__key", F.lit(1), "r"
    ).select("y", "r")
    n_pos = F.sum("y")
    n = F.count(F.lit(1))
    rank_sum = F.sum(F.when(F.col("y") == 1, F.col("r")))
    auc = (rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * (n - n_pos))
    return ranked.agg(
        n_pos.cast("bigint").alias("n_pos"),
        (n - n_pos).cast("bigint").alias("n_neg"),
        (F.floor(auc * 1e6) / 1e6).alias("auc"),
    )


@register(
    "agg_pr_curve",
    oracle=f"""
    WITH scored AS (
        SELECT {_BERT_P_SQL} AS p, label % 2 AS y FROM embeddings
    )
    SELECT t.thr AS threshold,
           CAST(SUM(CASE WHEN p >= t.thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN p >= t.thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN p < t.thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           FLOOR(SUM(CASE WHEN p >= t.thr AND y = 1 THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(CASE WHEN p >= t.thr THEN 1 ELSE 0 END), 0) * 1e6)
             / 1e6 AS precision,
           FLOOR(SUM(CASE WHEN p >= t.thr AND y = 1 THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(y), 0) * 1e6) / 1e6 AS recall
    FROM scored
    CROSS JOIN (SELECT unnest([0.3, 0.4, 0.5, 0.6, 0.7]) AS thr) t
    GROUP BY t.thr
    """,
)
def agg_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall operating curve: TP/FP/FN and derived P/R at five
    decision thresholds in ONE pass — the scored frame is crossed against
    the tiny threshold dimension and conditionally counted, never
    re-scored per threshold (the dedup_threshold_sweep shape applied to
    classifier evaluation; together with agg_roc_auc and
    agg_calibration_bins this is the complete model-eval readout the
    reference's missing `evaluation` module promised as
    entity_level_f1/detailed_metrics, ner_pipeline.py:294-334)."""
    from sdg_data_catalog_spark.operators import scoring as SC

    emb = table(spark, sf_dir, "embeddings")
    scored = SC.classify_embeddings(emb).join(
        emb.select("vec_id", (F.col("label") % 2).alias("y")), "vec_id"
    )
    thr = spark.createDataFrame(
        [(t,) for t in (0.3, 0.4, 0.5, 0.6, 0.7)], "threshold double"
    )
    j = scored.crossJoin(F.broadcast(thr))
    pred_pos = F.col("p_positive") >= F.col("threshold")
    tp = F.sum((pred_pos & (F.col("y") == 1)).cast("bigint"))
    fp = F.sum((pred_pos & (F.col("y") == 0)).cast("bigint"))
    fn = F.sum(((~pred_pos) & (F.col("y") == 1)).cast("bigint"))
    return j.groupBy("threshold").agg(
        tp.alias("tp"),
        fp.alias("fp"),
        fn.alias("fn"),
        (F.floor(tp * 1.0 / F.nullif(tp + fp, F.lit(0)) * 1e6) / 1e6).alias(
            "precision"
        ),
        (F.floor(tp * 1.0 / F.nullif(F.sum("y"), F.lit(0)) * 1e6) / 1e6).alias(
            "recall"
        ),
    )


@register(
    "sample_balanced_classes",
    oracle="""
    WITH sized AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ),
    floor_n AS (
        SELECT MIN(c) AS m FROM (SELECT COUNT(*) AS c FROM documents GROUP BY lang)
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM sized, floor_n
    WHERE rn <= floor_n.m
    GROUP BY lang
    """,
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class balancing by deterministic downsampling: every language is
    cut to the MINORITY class size via the md5-ranked per-stratum window
    (sample_stratified_exact's mechanism with a data-derived n) — the
    class-imbalance fix applied before training a classifier on skewed
    labels, reproducible across engines and runs where rand()
    downsampling is not. The minority size is a 1-row broadcast from a
    |classes|-row aggregate; per-class ranking is one hash-partitioned
    window. Output is the per-class census — every class exactly equal —
    with the selection itself available upstream of the final count."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    sized = docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
    floor_n = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).agg(
        F.min("c").alias("m")
    )
    return (
        sized.join(F.broadcast(floor_n))
        .filter(F.col("rn") <= F.col("m"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@register(
    "etl_gdpr_erasure",
    oracle="""
    WITH erased AS (
        SELECT DISTINCT user_id FROM events
        WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 1) = '0'
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS rows_before,
           CAST(SUM(CASE WHEN e.user_id IN (SELECT user_id FROM erased)
                         THEN 0 ELSE 1 END) AS BIGINT) AS rows_after,
           CAST(SUM(CASE WHEN e.user_id IN (SELECT user_id FROM erased)
                         THEN 1 ELSE 0 END) AS BIGINT) AS rows_erased
    FROM events e
    GROUP BY event_type
    """,
)
def etl_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten pass: every event of the erasure set (users
    whose md5 leads with '0' — standing in for a deletion-request list)
    is removed by LEFT ANTI JOIN and the cleaned table is atomically
    published as a NEW version — the erasure a versioned lake actually
    performs: readers flip to the cleaned snapshot at the pointer, the
    prior version ages out under retention (the documented compliance
    window), and the operation is a full-scan rewrite ONLY of affected
    partitions at 100 TB (partition by user-bucket and the anti-join
    prunes untouched files). The audit output is the per-stream
    before/after/erased census; the pytest twin additionally proves the
    published LATEST contains zero erased users while the prior version
    still does (history until retention)."""
    from sdg_data_catalog_spark.sources.atomic import publish, read_latest
    from sdg_data_catalog_spark.sources.formats import io_dir

    ev = table(spark, sf_dir, "events")
    erased = ev.select("user_id").filter(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) == "0"
    ).distinct()
    cleaned = ev.join(F.broadcast(erased), "user_id", "left_anti")
    root = io_dir(sf_dir, "gdpr_events")
    publish(ev, root, 0, keep=10)
    publish(cleaned, root, 1, keep=10)
    after = (
        read_latest(spark, root)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_after"))
    )
    before = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("rows_before")
    )
    return before.join(after, "event_type").select(
        "event_type",
        "rows_before",
        "rows_after",
        (F.col("rows_before") - F.col("rows_after")).alias("rows_erased"),
    )


@register(
    "dq_divergence_js",
    oracle="""
    WITH c AS (
        SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY source, lang
    ),
    src_tot AS (SELECT source, SUM(n) AS st FROM c GROUP BY source),
    gl AS (SELECT lang, SUM(n) AS g FROM c GROUP BY lang),
    gtot AS (SELECT SUM(n) AS gt FROM c),
    grid AS (
        SELECT st.source, st.st, gl.lang,
               CAST(gl.g AS DOUBLE) / gtot.gt AS q
        FROM src_tot st CROSS JOIN gl CROSS JOIN gtot
    ),
    terms AS (
        SELECT grid.source,
               COALESCE(CAST(c.n AS DOUBLE) / grid.st, CAST(0 AS DOUBLE)) AS p,
               grid.q
        FROM grid
        LEFT JOIN c ON c.source = grid.source AND c.lang = grid.lang
    )
    SELECT source,
           FLOOR(SUM(CASE WHEN p > 0
                          THEN 0.5 * p * ln(p / ((p + q) / 2))
                               + 0.5 * q * ln(q / ((p + q) / 2))
                          ELSE 0.5 * q * ln(CAST(2 AS DOUBLE)) END) * 1e6)
             / 1e6 AS js_divergence
    FROM terms GROUP BY source
    """,
)
def dq_divergence_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's language distribution
    from the corpus-wide distribution — the categorical-drift monitor
    beside dq_profile_drift's numeric Welch-z: a crawler source whose
    language mix silently shifts flags here even when volumes and means
    look normal. All terms are exact count ratios (the count tables are
    |sources|×|langs|, metadata-sized at any corpus scale), the ln
    arithmetic is floor-truncated. The (source × lang) grid is densified
    before the sum: a language present globally but absent from a source
    has p = 0 and contributes its exact limit term 0.5·q·ln 2 (the
    0.5·p·ln(p/m) part → 0), so the divergence is the true JS over the
    full global support — a source whose mix drifts AWAY from corpus
    languages is charged for the mass it no longer carries. Both engines
    densify via the same src×lang cross join (metadata-sized) and use
    the same ln(2) constant, keeping the hash bit-stable."""
    docs = table(spark, sf_dir, "documents")
    # |sources| x |langs| rows; feeds both margins, the total, and the
    # densify join — one corpus pass, not four (audited 4 document scans)
    c = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    st = c.groupBy("source").agg(F.sum("n").alias("st"))
    g = c.groupBy("lang").agg(F.sum("n").alias("g"))
    gt = c.agg(F.sum("n").alias("gt"))
    grid = (
        st.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(gt))
        .select(
            "source", "st", "lang",
            (F.col("g").cast("double") / F.col("gt")).alias("q"),
        )
    )
    terms = grid.join(c, ["source", "lang"], "left").select(
        "source",
        F.coalesce(
            F.col("n").cast("double") / F.col("st"), F.lit(0.0)
        ).alias("p"),
        "q",
    )
    m = (F.col("p") + F.col("q")) / 2
    term = F.when(
        F.col("p") > 0,
        0.5 * F.col("p") * F.log(F.col("p") / m)
        + 0.5 * F.col("q") * F.log(F.col("q") / m),
    ).otherwise(0.5 * F.col("q") * F.log(F.lit(2.0)))
    return terms.groupBy("source").agg(
        (F.floor(F.sum(term) * 1e6) / 1e6).alias("js_divergence")
    )


@register(
    "agg_gini_concentration",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars, doc_id
               ) AS r
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR((2.0 * SUM(CAST(r AS BIGINT) * n_chars)
                  / (COUNT(*) * SUM(n_chars))
                  - (COUNT(*) + 1.0) / COUNT(*)) * 1e6) / 1e6 AS gini
    FROM ranked GROUP BY source
    """,
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the document-length distribution per source —
    the concentration signal curators read before sampling: a source
    whose token mass sits in a few giant documents (high Gini) behaves
    very differently under doc-level sampling than a uniform one, and
    plan_token_budget's per-source quotas silently assume the latter.
    Computed by the exact rank identity G = 2·Σ(rᵢ·xᵢ)/(n·Σx) − (n+1)/n:
    one per-source rank window over integer lengths, integer products and
    sums throughout (bit-exact in both engines), one floor-truncated
    division at the end. The (n_chars, doc_id) tie-break makes ranks
    total; per-source windows shuffle once on the source key."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "source", "n_chars", F.row_number().over(w).cast("bigint").alias("r")
    )
    n = F.count(F.lit(1))
    gini = (
        2.0 * F.sum(F.col("r") * F.col("n_chars")) / (n * F.sum("n_chars"))
        - (n + 1.0) / n
    )
    return ranked.groupBy("source").agg(
        n.cast("bigint").alias("n_docs"),
        (F.floor(gini * 1e6) / 1e6).alias("gini"),
    )
