"""Sketch-based approximate analytics and corpus-curation scale operators.

At 100 TB you cannot afford exact `COUNT(DISTINCT)` / full-histogram passes
per question; the lake answer is MERGEABLE SKETCHES (Datasketches HLL,
count-min, heavy-hitters) materialized once per partition/day and re-unioned
for any slice — Spark ships these as JVM aggregates (`hll_sketch_agg`,
`hll_union_agg`, `count_min_sketch`, `approx_top_k`), so the sketch build is
whole-stage-codegen'd, map-side partial, and shuffle-light (one small binary
per group instead of the key universe).

Oracle strategy for approximate results: the query returns the EXACT answer
(oracle-checkable in DuckDB) *plus* a boolean asserting the sketch estimate
landed inside its published error bound. A sketch drifting out of bound flips
the boolean and fails the value-hash — so the driver gate really does verify
the sketch path end-to-end without requiring DuckDB to reproduce Datasketches
internals bit-for-bit.

The curation half: per-group quantile thresholding, deterministic global
shuffle+shard, SCD2 history build, BPE pair counting, one-pass column stats —
the table-maintenance / training-prep ops the reference's single-node pandas
pipeline (e.g. dataset_tools/curate.py) does in-memory, re-expressed as
two-pass broadcast patterns that survive a 1000-executor scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register


# --- sketches --------------------------------------------------------------

@register(
    "sketch_hll_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           TRUE AS hll_within_2pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts per return flag via a Datasketches HLL sketch (lgK=12,
    ±~1.6% rse) next to the exact count. At 100 TB the exact count shuffles
    every distinct key; the sketch shuffles 2^12 registers per group and is
    mergeable across days/files. The oracle checks the exact column and the
    in-bound boolean — an out-of-bound estimate flips the hash."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").cast("bigint").alias("n_exact"),
            F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))").alias("est"),
        )
        .select(
            "l_returnflag",
            "n_exact",
            (F.abs(F.col("est") - F.col("n_exact"))
             <= 0.02 * F.col("n_exact")).alias("hll_within_2pct"),
        )
    )


@register(
    "sketch_hll_union",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_exact,
           TRUE AS union_within_2pct
    FROM events
    GROUP BY event_type
    """,
)
def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-users: build one HLL sketch PER (event_type,
    day) — the granularity a daily ETL job would persist — then
    `hll_union_agg` the daily sketches into per-type totals. This is the
    sketch-table pattern that makes any date-range distinct-user question a
    metadata-sized merge instead of a raw-event scan; union is register-max,
    so it is order-insensitive and exactly as accurate as one big sketch."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk"),
        F.count_distinct("user_id").alias("d_users"),
    )
    # exact per-type distinct cannot be summed from days (users repeat across
    # days) — recompute from raw for the oracle column; the sketch union is
    # the scale path under test.
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("users_exact")
    )
    unioned = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    return exact.join(unioned, "event_type").select(
        "event_type",
        "users_exact",
        (F.abs(F.col("est") - F.col("users_exact"))
         <= F.greatest(F.lit(1.0), 0.02 * F.col("users_exact"))).alias("union_within_2pct"),
    )


@register(
    "sketch_cms_freq",
    oracle="""
    SELECT l_partkey AS probe_key,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           TRUE AS cms_within_bound
    FROM lineitem
    WHERE l_partkey IN (1, 2, 3, 5, 8)
    GROUP BY l_partkey
    """,
)
def sketch_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-frequency estimates from a count-min sketch built in one
    distributed pass (`count_min_sketch` is a JVM aggregate; merge is cellwise
    addition, so partition order is irrelevant). The 112 KB binary answers
    'how often does key X appear?' for ANY key without re-scanning — the
    streaming/telemetry staple. Probing is a driver-side deserialize of the
    sketch bytes (`CountMinSketch.readFrom` via the JVM gateway) for a handful
    of keys — O(probes), not a distributed op. CMS guarantees
    exact ≤ est ≤ exact + eps*N with prob ≥ confidence; the boolean asserts
    that bound, the exact column carries the oracle-checked truth."""
    li = table(spark, sf_dir, "lineitem")
    probes = [1, 2, 3, 5, 8]
    eps, conf, seed = 0.0001, 0.99, 42
    row = li.agg(
        F.expr(f"count_min_sketch(l_partkey, {eps}d, {conf}d, {seed})").alias("sk"),
        F.count(F.lit(1)).alias("n_total"),
    ).collect()[0]
    jvm = li.sparkSession._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(row.sk))
    )
    slack = int(eps * row.n_total) + 1
    est = {k: cms.estimateCount(k) for k in probes}
    exact = (
        li.filter(F.col("l_partkey").isin(probes))
        .groupBy(F.col("l_partkey").alias("probe_key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    est_df = li.sparkSession.createDataFrame(
        [(k, int(v)) for k, v in est.items()], "probe_key bigint, est bigint"
    )
    return exact.join(F.broadcast(est_df), "probe_key").select(
        "probe_key",
        "n_exact",
        ((F.col("est") >= F.col("n_exact"))
         & (F.col("est") <= F.col("n_exact") + F.lit(slack))).alias("cms_within_bound"),
    )


@register(
    "sketch_topk_vocab",
    oracle="""
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    """,
)
def sketch_topk_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary heavy-hitters: top-1000 tokens by count. k is set
    beyond this corpus's vocab so tie-order at the cut cannot make the
    comparison flap (the r02 approx_top_k contract, unchanged).

    r15 (guide §2.3/§4.2, measured): the former single-aggregate
    `approx_top_k` still streamed the corpus-sized exploded token
    stream through per-row JVM sketch updates; the shared lm_counts
    Arrow kernel counts each batch's tokens in Python and emits only
    vocabulary-sized integer partials, and the winners come from a
    TakeOrderedAndProject over the exact summed census — identical rows
    (exact counts ≥-vocab-sized k, deterministic (n DESC, tok) order at
    any tie), no occurrence stream in the JVM. Kernel pinned in
    tests/test_r15_lm_counts_kernel.py."""
    from sdg_data_catalog_spark.operators.lm_counts import token_count_partials

    docs = table(spark, sf_dir, "documents")
    parts = token_count_partials(
        docs.select(F.split("text", " ").alias("t")), mode="unigrams"
    )
    return (
        parts.filter(F.col("kind") == 1)
        .groupBy(F.col("w1").alias("tok"))
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(1000)
    )


# --- curation / maintenance ------------------------------------------------

@register(
    "filter_quality_quantile",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' '))
                 * ln(1 + len(string_split(text, ' '))) AS q
        FROM documents
    ),
    thresholds AS (
        SELECT source, quantile_cont(q, 0.3) AS q30 FROM scored GROUP BY source
    )
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(CAST(MIN(s.q) AS DOUBLE), 6) AS min_kept_q
    FROM scored s JOIN thresholds t ON s.source = t.source
    WHERE s.q >= t.q30
    GROUP BY s.source
    """,
)
def filter_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality thresholding — 'keep the top 70% of each source' —
    the curation step that equalizes quality across heterogeneous domains.
    Two-pass broadcast pattern: pass 1 aggregates one threshold per source
    (tiny), pass 2 broadcast-joins thresholds back and filters map-side. The
    naive alternative (percent_rank window per source) sorts every source's
    full corpus; this shape never sorts and never shuffles the text. Exact
    `percentile` (linear interpolation, = DuckDB quantile_cont) keeps the
    oracle exact; at 100 TB you swap in percentile_approx, same two-pass plan."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    q = (
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        * F.log(F.lit(1.0) + F.size(toks))
    )
    scored = docs.select("doc_id", "source", q.alias("q"))
    thresholds = scored.groupBy("source").agg(
        F.expr("percentile(q, 0.3)").alias("q30")
    )
    return (
        scored.join(F.broadcast(thresholds), "source")
        .filter(F.col("q") >= F.col("q30"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.round(F.min("q"), 6).alias("min_kept_q"),
        )
    )


@register(
    "shuffle_shards",
    oracle="""
    WITH hashed AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':ep0') AS h
        FROM documents
    )
    SELECT doc_id,
           substring(h, 1, 1) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY substring(h, 1, 1)
                                   ORDER BY h, doc_id) AS BIGINT) AS pos
    FROM hashed
    """,
)
def shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle + sharding: order is
    md5(doc_id || epoch-salt) — reproducible across runs, engines, and
    cluster sizes (unlike rand() or zipWithIndex), and re-salting the epoch
    string is a fresh permutation with zero state. Shard = first hex nibble
    (16 shards) so shard assignment is a pure map; position is a ROW_NUMBER
    per shard — a 1/16-corpus sort per partition, never a global sort. At
    100 TB: widen the prefix (2 hex chars = 256 shards) until each shard's
    sort fits an executor, then write shards as separate files — this is
    exactly how training-data loaders get epoch shuffles without a driver."""
    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":ep0")))
    hashed = docs.select("doc_id", h.alias("h"))
    w = Window.partitionBy(F.substring("h", 1, 1)).orderBy("h", "doc_id")
    return hashed.select(
        "doc_id",
        F.substring("h", 1, 1).alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "etl_scd2",
    oracle="""
    WITH changes AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    versions AS (
        SELECT user_id, ts AS eff_from, event_id, event_type
        FROM changes
        WHERE prev_type IS NULL OR event_type != prev_type
    )
    SELECT user_id, event_type,
           eff_from,
           lead(eff_from) OVER (PARTITION BY user_id
                                ORDER BY eff_from, event_id) AS eff_to,
           CAST(lead(eff_from) OVER (PARTITION BY user_id
                                     ORDER BY eff_from, event_id) IS NULL
                AS BOOLEAN) AS is_current
    FROM versions
    """,
)
def etl_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change stream: compress the
    event log to state-change rows (lag != current), then effective-date each
    version with lead(); the open-ended row is current. Both windows share
    one partitioning (user_id) so the whole build is a single shuffle; at
    100 TB the dimension key count, not event count, bounds window state.
    This is the warehouse half the reference's catalog updater
    (catalog/update.py) does row-at-a-time in Python — here it's two window
    functions over one exchange."""
    ev = table(spark, sf_dir, "events")
    byu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(byu))
    versions = changes.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    ).select("user_id", F.col("ts").alias("eff_from"), "event_id", "event_type")
    byv = Window.partitionBy("user_id").orderBy("eff_from", "event_id")
    return versions.select(
        "user_id",
        "event_type",
        "eff_from",
        F.lead("eff_from").over(byv).alias("eff_to"),
        F.lead("eff_from").over(byv).isNull().alias("is_current"),
    )


@register(
    "bpe_pair_counts",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    idx AS (
        SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM t
    )
    SELECT l[i] AS left_tok,
           l[CAST(i AS INTEGER) + 1] AS right_tok,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM idx
    GROUP BY 1, 2
    ORDER BY n DESC, left_tok, right_tok
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair frequency — the inner loop of BPE tokenizer training
    ('most frequent symbol pair merges next'). A full BPE trainer
    iterates this top-1-merge-then-recount; one round is the
    representative distributed step.

    r15 (guide §2.3/§4.2, measured): the in-row arrays_zip + explode
    still pushed the corpus-sized OCCURRENCE stream through the
    pair→count aggregate; the shared lm_counts Arrow kernel (the
    lm_bigram_score model-build pass) now counts each batch's pairs in
    Python and emits only vocabulary-sized integer partials, so the JVM
    aggregates per-batch partial counts instead of every occurrence.
    Counts are exact int64 sums (associative — the batch split cannot
    change them); tokenization stays in Spark's own F.split. Kernel
    pinned against the explode form in tests/test_r15_lm_counts_kernel.py."""
    from sdg_data_catalog_spark.operators.lm_counts import token_count_partials

    docs = table(spark, sf_dir, "documents")
    parts = token_count_partials(
        docs.select(F.split("text", " ").alias("t")), mode="bigrams"
    )
    return (
        parts.groupBy(
            F.col("w1").alias("left_tok"), F.col("w2").alias("right_tok")
        )
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "left_tok", "right_tok")
    )


@register(
    "dq_constraints",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT) AS violations
    UNION ALL
    SELECT 'customer_pk_unique',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
                 ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST((SELECT COUNT(*) FROM orders o LEFT JOIN customer c
                 ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_qty_positive',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0
                 OR l_quantity IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'orders_date_not_null',
           CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) AS BIGINT)
    ORDER BY check_name
    """,
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite — what a catalog runs per ingest batch
    before publishing a snapshot (reference analog: the ad-hoc sanity
    queries around utils/db_connection.py; the engine makes them one
    declarative job). Six checks, one aggregate pass per table (PK/domain
    checks fold into a single agg and unpivot via stack) plus the two
    anti-join FK probes, each scale-shaped:

      - PK uniqueness = COUNT(*) − COUNT(DISTINCT pk) per table, folded
        into ONE aggregate per table (no self-join);
      - FK integrity = left-anti join counts (lineitem→orders on a
        broadcast-or-shuffle join AQE picks; orders→customer likewise) —
        the anti join is the only scalable referential check, never a NOT
        IN subquery (null-hostile AND unplannable at scale);
      - domain checks (positive quantities, non-null dates) ride the same
        single scans as the PK folds.

    Output: (check_name, violations) — all zeros on the driver's synthetic
    data; non-zero rows are what a publish gate would block on."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    # ONE aggregate per table, then unpivot with stack — each table's check
    # family rides a single scan (selecting two columns of the same agg as
    # separate union branches would re-execute the scan+agg subtree).
    o_checks = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).cast("bigint").alias("pk_dup"),
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).cast("bigint").alias("null_date"),
    ).selectExpr(
        "stack(2, 'orders_pk_unique', pk_dup, 'orders_date_not_null', null_date)"
        " as (check_name, violations)"
    )
    c_checks = customer.agg(
        (F.count(F.lit(1)) - F.count_distinct("c_custkey")).cast("bigint").alias("pk_dup")
    ).select(F.lit("customer_pk_unique").alias("check_name"), F.col("pk_dup").alias("violations"))
    li_checks = li.agg(
        F.count(
            F.when(F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0), 1)
        ).cast("bigint").alias("bad_qty")
    ).select(F.lit("lineitem_qty_positive").alias("check_name"), F.col("bad_qty").alias("violations"))
    li_orphans = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .select(F.lit("lineitem_fk_orders").alias("check_name"), "violations")
    )
    o_orphans = (
        orders.select("o_custkey")
        .join(customer.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("violations"))
        .select(F.lit("orders_fk_customer").alias("check_name"), "violations")
    )
    out = o_checks
    for piece in (c_checks, li_checks, li_orphans, o_orphans):
        out = out.unionByName(piece)
    return out.orderBy("check_name")




def _bpe_oracle(n_rounds: int = 20, encode: bool = False) -> str:
    """Generate the FULL BPE-trainer oracle: the 20-round merge loop is
    inherently sequential (each round's pair counts depend on the prior
    merge), so it is UNROLLED into chained MATERIALIZED CTEs — the same
    promotion trick as rank_mmr / graph_kcore / sample_coreset_kcenter.
    Per round: w{k} holds the symbol table as ' '-joined symbol strings
    (symbols never contain spaces — words come from a space split),
    pc{k} counts adjacent pairs via UNNEST(range), m{k} is the argmax
    with the trainer's exact tie-break (cnt DESC, a ASC, b ASC — binary
    string order in both engines) and the trainer's cnt >= 2 stop rule.
    The merge APPLY uses the double-space trick: doubling separators
    makes adjacent occurrences stop sharing boundary spaces, so a single
    left-to-right string replace reproduces the trainer's non-overlapping
    greedy scan exactly (verified against the pure-Python twin).

    With ``encode=True`` the chain carries the original word through all
    rounds plus one final apply, then joins the encoded per-word token
    counts back onto every document — the bpe_encode_tokens oracle."""
    parts = ["""w0 AS MATERIALIZED (
  SELECT word, array_to_string(string_split(word, ''), ' ') || '</w>' AS syms, n
  FROM (
    SELECT word, COUNT(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> '' GROUP BY word)
)"""]

    def apply_cte(k: int) -> str:
        return f"""w{k + 1} AS MATERIALIZED (
  SELECT word, CASE WHEN NOT EXISTS (SELECT 1 FROM m{k}) THEN syms
    ELSE trim(replace(replace(
      ' ' || replace(syms, ' ', '  ') || ' ',
      ' ' || (SELECT a FROM m{k}) || '  ' || (SELECT b FROM m{k}) || ' ',
      ' ' || (SELECT a FROM m{k}) || (SELECT b FROM m{k}) || ' '), '  ', ' '))
    END AS syms, n
  FROM w{k}
)"""

    for k in range(n_rounds):
        parts.append(f"""pc{k} AS MATERIALIZED (
  SELECT s[i] AS a, s[i+1] AS b, SUM(n) AS cnt
  FROM (SELECT string_split(syms, ' ') AS s, n FROM w{k}),
       UNNEST(range(1, len(s))) AS t(i)
  GROUP BY s[i], s[i+1]
)""")
        parts.append(f"""m{k} AS MATERIALIZED (
  SELECT a, b FROM pc{k} WHERE cnt >= 2 ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
)""")
        if k < n_rounds - 1 or encode:
            parts.append(apply_cte(k))
    if encode:
        final = f"""enc AS MATERIALIZED (
  SELECT word, len(string_split(syms, ' ')) AS toks FROM w{n_rounds}
),
docw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
wcnt AS (
  SELECT d.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(e.toks) AS BIGINT) AS n_tokens
  FROM docw d JOIN enc e USING (word)
  WHERE d.word <> ''
  GROUP BY d.doc_id
)
SELECT doc.doc_id,
       COALESCE(w.n_words, 0) AS n_words,
       COALESCE(w.n_tokens, 0) AS n_tokens
FROM documents doc LEFT JOIN wcnt w USING (doc_id)"""
        # LEFT JOIN from documents (ADVICE r6): an empty/whitespace-only/
        # null-text document produces no docw rows and would vanish from an
        # inner-join aggregate, while encode_corpus emits its (doc_id, 0, 0)
        # row — a hash mismatch waiting for the first such document.
        return "WITH " + ",\n".join(parts) + ",\n" + final
    union = "\nUNION ALL\n".join(
        f"SELECT {k} AS rank, a AS left_sym, b AS right_sym, a || b AS merged"
        f" FROM m{k}"
        for k in range(n_rounds)
    )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT CAST(rank AS INTEGER) AS rank, left_sym, right_sym, merged"
        + " FROM (\n" + union + "\n) ORDER BY rank"
    )


@register("bpe_train_merges", oracle=_bpe_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer training (operators/bpe.py::bpe_train): 20 merge
    rounds over the documents word histogram — the iterative closure of
    bpe_pair_counts. Each round is one map-side-combined pair-count
    aggregate over the DISTINCT-WORD table (not the corpus) + a single
    argmax row to the driver + a vectorized merge apply; the symbol table
    is localCheckpointed per round. Deterministic tie-break (count DESC,
    pair ASC) ⇒ stable output; the differential pytest twin retrains in
    pure Python and must produce the identical merge list
    (tests/test_bpe.py). Promoted from rows-only in round 6: the whole
    20-round trainer is reproduced by an unrolled MATERIALIZED-CTE oracle
    (_bpe_oracle — the rank_mmr/graph_kcore promotion trick, plus a
    double-space replace that makes SQL's left-to-right replace equal the
    trainer's non-overlapping greedy merge scan)."""
    from sdg_data_catalog_spark.operators.bpe import bpe_train

    docs = table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=20)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank INT, left_sym STRING, right_sym STRING, merged STRING",
    )


@register("bpe_encode_tokens", oracle=_bpe_oracle(encode=True))
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budget under the LEARNED BPE tokenizer: train 20 merges on
    the corpus word histogram (operators/bpe.py::bpe_train), then encode
    every document distributed (encode_corpus, Arrow batches with a
    per-batch word memo). Invariants (tested): n_tokens ≤ total chars,
    n_tokens ≥ n_words (a word is ≥1 token), and more merges never
    increase a document's token count. Promoted from rows-only in
    round 6: the oracle extends the unrolled trainer chain
    (_bpe_oracle(encode=True)) with one final merge apply and a
    word→token-count join back onto every document."""
    from sdg_data_catalog_spark.operators.bpe import bpe_train, encode_corpus

    docs = table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=20)
    return encode_corpus(docs, merges).orderBy("doc_id")


@register(
    "catalog_stats",
    oracle="""
    SELECT 'l_quantity' AS col_name,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_v,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ndv,
           CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_nulls
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           CAST(MIN(l_extendedprice) AS DOUBLE),
           CAST(MAX(l_extendedprice) AS DOUBLE),
           CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount',
           CAST(MIN(l_discount) AS DOUBLE),
           CAST(MAX(l_discount) AS DOUBLE),
           CAST(COUNT(DISTINCT l_discount) AS BIGINT),
           CAST(COUNT(*) - COUNT(l_discount) AS BIGINT)
    FROM lineitem
    ORDER BY col_name
    """,
)
def catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style one-pass column statistics (min/max/ndv/null-count per
    column) — what a catalog stores to drive CBO join ordering and what a
    data-quality monitor diffs per ingest batch. All three columns' stats
    compute in a SINGLE scan + single aggregate (the oracle's UNION ALL form
    scans three times — the distributed rewrite is precisely this
    multi-column fold), then unpivot to one row per column. NDV here is exact
    (count_distinct); the sketch variant is sketch_hll_distinct."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.count_distinct(c).cast("bigint").alias(f"{c}__ndv"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__min, {c}__max, {c}__ndv, {c}__nulls" for c in cols
    )
    return (
        one.select(
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS "
                "(col_name, min_v, max_v, ndv, n_nulls)"
            )
        )
        .orderBy("col_name")
    )


@register(
    "stream_enrich",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(e.value) AS DOUBLE), 2) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: fact events joined to a broadcast dimension
    (user → market segment) then aggregated — the canonical streaming-ETL
    shape (enrich at ingest, aggregate downstream). This registered twin is
    the batch plan (broadcast hash join: the dim never shuffles, events never
    leave their partitions until the final agg); tests/test_streaming.py runs
    the SAME dataflow as a readStream ⋈ static-DataFrame join — which Spark
    executes by re-reading the dim per micro-batch, no state store — and
    asserts value parity with this twin."""
    ev = table(spark, sf_dir, "events")
    dim = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        ev.join(F.broadcast(dim), "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
