"""Alignment filters, XML-ish projections, positional join, and ML-metric
aggregations (SURVEY.md §2.2, §2.3 join_index, §2.4 agg_accuracy/agg_prf/
agg_entitycount, §2.6 sorts/limits).

Reference analogs (sdg-ai/sdg_data_catalog):
  - cross-column length-alignment drop: ner_pipeline.py:146-156 (repeated at
    :275-283 and :296-303 — the same 11 lines three times);
  - short-sentence skip in CoNLL parsing: data_transformation.py:82-84;
  - numeric-token drop: TM_1_DataCleaning.ipynb cell 6;
  - abstract/author extraction from CERMXML: paper_processing.py:71-77,
    105-118,120-129;
  - positional joins: wrapper_ner.py:66 (dat.loc[res]) and TM_2 cell 33
    (df.join(df_topic_prob) by row position);
  - accuracy / P-R-F1: model_optimization.py:176-179,186 and the implied
    EvaluationIndex API at ner_pipeline.py:294-334;
  - B- entity counting: data_transformation.py:19-23;
  - length sort for LSTM packing: model.py:31-39; head(150) caps:
    test_ner_pipeline.ipynb cell 11.

All are Catalyst built-ins here — the metric aggregations in particular are
single-pass conditional aggregates (partial map-side combine for free), not
the reference's driver-side sklearn loops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


# ---------------------------------------------------------------------------
# Filters over array shapes
# ---------------------------------------------------------------------------
@register(
    "filter_aligned",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
    FROM documents
    WHERE len(string_split(text, ' ')) = len(string_split(text, 'e'))
    """,
)
def filter_aligned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-column length-equality filter (ner_pipeline.py:146-156: drop
    rows where token-vector length != tag-vector length). Pure column
    expression — `size(a) == size(b)` — where the reference loops a Python
    list three separate times."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    tags = F.split(F.col("text"), "e")  # stand-in second sequence with varying length
    return (
        docs.filter(F.size(toks) == F.size(tags))
        .select("doc_id", F.size(toks).alias("n_tokens"))
    )


@register(
    "filter_emptysent",
    oracle="""
    SELECT doc_id, sent, CAST(len(string_split(trim(sent), ' ')) AS INT) AS n_tokens
    FROM (SELECT doc_id, unnest(string_split(text, ' a ')) AS sent FROM documents)
    WHERE len(string_split(trim(sent), ' ')) >= 2
    """,
)
def filter_emptysent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Short-record skip while exploding sentences (data_transformation.py:
    82-84: skip sentences with < 2 tokens). Explode + size filter; the
    filter lands before any downstream shuffle."""
    docs = table(spark, sf_dir, "documents")
    sents = docs.select("doc_id", F.explode(F.split("text", " a ")).alias("sent"))
    n_tokens = F.size(F.split(F.trim("sent"), " "))
    return sents.filter(n_tokens >= 2).select("doc_id", "sent", n_tokens.alias("n_tokens"))


@register(
    "filter_notdigit",
    oracle="""
    SELECT doc_id,
           array_to_string(
             list_filter(string_split(text || ' ' || CAST(n_chars AS VARCHAR), ' '),
                         x -> NOT regexp_matches(x, '^[0-9]+\\z')), '|') AS word_tokens
    FROM documents
    """,
)
def filter_notdigit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop purely-numeric tokens inside a token array (TM_1 cell 6).
    Higher-order `filter` on the array column — no explode, no UDF. Output
    is surfaced '|'-joined: scalar columns keep the result safe for
    order-insensitive canonicalization (list cells are unhashable in a
    pandas sort)."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.concat_ws(" ", "text", "n_chars"), " ")
    return docs.select(
        "doc_id",
        F.array_join(F.filter(toks, lambda x: ~x.rlike(r"^[0-9]+\z")), "|").alias("word_tokens"),
    )


@register(
    "proj_abstract",
    oracle="""
    SELECT doc_id,
           substr(text, 1, 80) AS abstract,
           source || '|' || lang AS authors
    FROM documents
    """,
)
def proj_abstract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath field extraction (paper_processing.py:71-77,105-118:
    get_abstract / get_authors over BeautifulSoup XML). A nested XML
    fragment is rendered per row — abstract under front/abstract/p, authors
    as repeated contrib elements — then parsed back out with `xpath_string`
    (scalar) and `xpath` (multi-valued node-set), all JVM-side. The oracle
    checks render→extract is the identity on the underlying fields; the
    full file-based nested scan is scan_xml (sources_sinks.py)."""
    docs = table(spark, sf_dir, "documents")
    xml = F.format_string(
        '<front><abstract><p>%s</p></abstract>'
        '<contrib contrib-type="author"><name>%s</name></contrib>'
        '<contrib contrib-type="author"><name>%s</name></contrib></front>',
        F.col("text").substr(1, 80), F.col("source"), F.col("lang"),
    )
    return docs.select("doc_id", xml.alias("xml")).select(
        "doc_id",
        F.expr("xpath_string(xml, '/front/abstract/p')").alias("abstract"),
        F.array_join(
            F.expr("xpath(xml, '/front/contrib[@contrib-type=\"author\"]/name/text()')"),
            "|",
        ).alias("authors"),
    )


# ---------------------------------------------------------------------------
# Positional join
# ---------------------------------------------------------------------------
@register(
    "join_index",
    oracle="""
    WITH a AS (SELECT row_number() OVER (ORDER BY doc_id) AS pos, doc_id, lang FROM documents),
         b AS (SELECT row_number() OVER (ORDER BY vec_id) AS pos, vec_id, label FROM embeddings)
    SELECT CAST(a.pos AS BIGINT) AS pos, a.doc_id, a.lang, b.vec_id, b.label
    FROM a JOIN b ON a.pos = b.pos
    """,
)
def join_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-position zip join (TM_2 cell 33 df.join(df_topic_prob);
    wrapper_ner.py:66 dat.loc[res]). `monotonically_increasing_id` is NOT
    stable across shuffles (SURVEY §7), so both sides get a GLOBAL position
    over an explicit total order, then equi-join on position.

    Scale path: a bare `row_number() OVER (ORDER BY key)` is a
    single-partition window — every row through one task. Both sides
    instead use the two-phase prefix sum (operators/curation.running_total
    with a constant 1: range-shuffle by key, O(#partitions) offsets to the
    driver, per-partition local row_number + broadcast offset), so position
    assignment parallelizes like a sort. The position join itself then
    shuffles both sides on `pos` — at 100 TB, positional identity should be
    carried as a real key column from ingest; this operator exists for
    parity with the reference's pandas positional semantics."""
    from sdg_data_catalog_spark.operators.curation import running_total

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    embs = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    a = running_total(docs, "doc_id", F.lit(1).cast("bigint"), "pos")
    b = running_total(embs, "vec_id", F.lit(1).cast("bigint"), "pos")
    return a.join(b, "pos").select("pos", "doc_id", "lang", "vec_id", "label")


# ---------------------------------------------------------------------------
# ML-metric aggregations as relational plans
# ---------------------------------------------------------------------------
@register(
    "agg_entitycount",
    oracle="""
    SELECT lang,
           CAST(SUM(len(list_filter(string_split(text, ' '), x -> starts_with(x, 's')))) AS BIGINT)
             AS n_entities,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def agg_entitycount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional count inside an array (data_transformation.py:19-23:
    count BILUO labels starting 'B-'). size(filter(arr, pred)) per row,
    summed per group — one pass, map-side partials."""
    docs = table(spark, sf_dir, "documents")
    n_b = F.size(F.filter(F.split("text", " "), lambda x: x.startswith("s")))
    return docs.groupBy("lang").agg(
        F.sum(n_b).alias("n_entities"), F.count("*").alias("n_docs")
    )


@register(
    "agg_accuracy",
    oracle="""
    SELECT ROUND(CAST(AVG(CASE WHEN (value > 250) = (event_type = 'click') THEN 1 ELSE 0 END) AS DOUBLE), 6)
             AS accuracy,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    """,
)
def agg_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-of-indicator accuracy (model_optimization.py:176-179:
    (preds == labels).sum() / n). The 'model' is a deterministic threshold
    rule so the metric is oracle-checkable; swap in any scored column."""
    ev = table(spark, sf_dir, "events")
    pred = F.col("value") > 250
    actual = F.col("event_type") == "click"
    return ev.agg(
        F.round(F.avg((pred == actual).cast("double")), 6).alias("accuracy"),
        F.count("*").alias("n"),
    )


_PRED_CASE = """CASE WHEN value < 100 THEN 'view' WHEN value < 200 THEN 'click'
                WHEN value < 300 THEN 'signup' WHEN value < 400 THEN 'purchase'
                ELSE 'error' END"""


@register(
    "agg_prf",
    oracle=f"""
    WITH scored AS (SELECT event_type AS actual, {_PRED_CASE} AS pred FROM events),
    tp AS (SELECT actual AS cls, COUNT(*) AS n FROM scored WHERE actual = pred GROUP BY actual),
    pp AS (SELECT pred   AS cls, COUNT(*) AS n FROM scored GROUP BY pred),
    aa AS (SELECT actual AS cls, COUNT(*) AS n FROM scored GROUP BY actual)
    SELECT aa.cls AS label,
           CAST(COALESCE(tp.n, 0) AS BIGINT) AS tp,
           CAST(COALESCE(pp.n, 0) AS BIGINT) AS n_pred,
           CAST(aa.n AS BIGINT) AS n_actual,
           ROUND(CAST(COALESCE(tp.n, 0) AS DOUBLE) / NULLIF(pp.n, 0), 6) AS precision,
           ROUND(CAST(COALESCE(tp.n, 0) AS DOUBLE) / aa.n, 6) AS recall,
           ROUND(CAST(2.0 * COALESCE(tp.n, 0) AS DOUBLE) / (COALESCE(pp.n, 0) + aa.n), 6) AS f1
    FROM aa LEFT JOIN tp ON aa.cls = tp.cls LEFT JOIN pp ON aa.cls = pp.cls
    """,
)
def agg_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 (the missing EvaluationIndex API implied
    at ner_pipeline.py:294-334: entity_level_f1 / detailed_metrics). Three
    grouped counts (TP, predicted-per-class, actual-per-class) outer-joined
    on class — a relational confusion matrix; F1 = 2·TP/(pred+actual).
    Class counts are tiny post-agg, so the joins broadcast."""
    ev = table(spark, sf_dir, "events")
    scored = ev.select(
        F.col("event_type").alias("actual"), F.expr(_PRED_CASE).alias("pred")
    )
    # ONE corpus pass builds the |classes|^2 confusion grid; TP/predicted/
    # actual marginals all derive from it (the three separate grouped
    # counts re-scanned events 3x in the audited plan)
    grid = (
        scored.groupBy("actual", "pred")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)
    )
    tp = (
        grid.filter("actual = pred")
        .groupBy(F.col("actual").alias("cls"))
        .agg(F.sum("n").alias("tp"))
    )
    pp = grid.groupBy(F.col("pred").alias("cls")).agg(F.sum("n").alias("n_pred"))
    aa = grid.groupBy(F.col("actual").alias("cls")).agg(F.sum("n").alias("n_actual"))
    joined = (
        aa.join(F.broadcast(tp), "cls", "left")
        .join(F.broadcast(pp), "cls", "left")
        .na.fill({"tp": 0, "n_pred": 0})
    )
    return joined.select(
        F.col("cls").alias("label"),
        "tp",
        "n_pred",
        "n_actual",
        F.round(F.col("tp") / F.nullif(F.col("n_pred"), F.lit(0)), 6).alias("precision"),
        F.round(F.col("tp") / F.col("n_actual"), 6).alias("recall"),
        F.round(F.lit(2.0) * F.col("tp") / (F.col("n_pred") + F.col("n_actual")), 6).alias("f1"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits
# ---------------------------------------------------------------------------
@register(
    "sort_desc_len",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
    FROM documents
    ORDER BY n_tokens DESC, doc_id
    LIMIT 100
    """,
)
def sort_desc_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Descending length sort (model.py:31-39: seq_length.sort(descending)
    for LSTM packing). orderBy+limit compiles to TakeOrderedAndProject —
    per-partition top-k then a single k-row merge on the driver, never a
    full global sort. Tie-break on doc_id keeps the limit deterministic."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return (
        docs.select("doc_id", n_tokens.alias("n_tokens"))
        .orderBy(F.col("n_tokens").desc(), "doc_id")
        .limit(100)
    )


@register(
    "limit_head",
    oracle="SELECT doc_id, source FROM documents ORDER BY doc_id LIMIT 150",
)
def limit_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """head(150) cap (test_ner_pipeline.ipynb cell 11 dat.head(150);
    papers_download.py:128 [:3]). Ordered limit — TakeOrderedAndProject."""
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .orderBy("doc_id")
        .limit(150)
    )


@register(
    "join_outer",
    oracle="""
    WITH oc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey)
    SELECT COALESCE(c.c_custkey, oc.o_custkey) AS custkey,
           c.c_name,
           CAST(COALESCE(oc.n_orders, 0) AS BIGINT) AS n_orders,
           (c.c_custkey IS NOT NULL) AS has_customer
    FROM customer c FULL OUTER JOIN oc ON c.c_custkey = oc.o_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join surface (SURVEY §2.3 'new-engine join surface':
    inner/left/right/full/semi/anti). Orders are pre-aggregated to custkey
    before the join — the shuffle moves one row per customer, not one per
    order, and AQE coalesces the post-agg partitions."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    oc = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (
        customer.join(oc, F.col("c_custkey") == F.col("o_custkey"), "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "c_name",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.col("c_custkey").isNotNull().alias("has_customer"),
        )
    )


@register(
    "udaf_grouped_agg",
    oracle="""
    SELECT event_type,
           ROUND(CAST(SUM(value * (user_id % 10 + 1)) AS DOUBLE)
                 / CAST(SUM(user_id % 10 + 1) AS DOUBLE), 4) AS weighted_avg_value
    FROM events GROUP BY event_type
    """,
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDAF via pandas_udf GROUPED_AGG (SURVEY §2.4 'new-engine agg surface';
    SNIPPETS.md pattern). The kernel sees each group's columns as whole
    pandas Series (one Arrow transfer per group-partition) — the vectorized
    path; a weighted mean the oracle re-derives relationally."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    ev = table(spark, sf_dir, "events")
    w = (F.col("user_id") % 10 + 1).cast("double")
    return (
        ev.groupBy("event_type")
        .agg(F.round(wavg(F.col("value"), w), 4).alias("weighted_avg_value"))
    )
