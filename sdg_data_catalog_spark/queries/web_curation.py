"""Web-corpus curation batch: WARC archive ingest, URL canonicalization
dedup, temperature-scaled mixture sampling, quantile sketches, and k-core
graph decomposition.

These are the operators a CommonCrawl-shaped 100 TB pipeline runs before
any text model sees a byte: parse the crawl archives, collapse URL
variants, rebalance the source mixture, profile the length distribution,
and extract dense interaction cores. Everything deterministic carries a
full DuckDB oracle; `graph_kcore` is iterative (rows-only, pure-Python
peeling twin in tests/test_web_curation.py).

Reference analog: the reference's scrapping/ stage downloads and
validates individual PDFs (scrapping/papers_download.py); the engine-side
generalization is archive-level ingest + corpus-level curation.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.sources.formats import io_dir


# --- WARC ingest ------------------------------------------------------

_WARC_HEADER = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Record-ID: <urn:uuid:doc-{doc_id}>\r\n"
    "WARC-Target-URI: {url}\r\n"
    "WARC-Date: 2024-01-01T00:00:00Z\r\n"
    "Content-Type: text/plain\r\n"
    "Content-Length: {length}\r\n"
    "\r\n"
)


def _warc_record(doc_id: int, source: str, text: str) -> bytes:
    url = f"https://{source}.example.org/doc/{doc_id}"
    payload = text.encode("utf-8")
    head = _WARC_HEADER.format(doc_id=doc_id, url=url, length=len(payload))
    return head.encode("ascii") + payload + b"\r\n\r\n"


def parse_warc_members(data: bytes) -> list[tuple[str, int, str]]:
    """Parse one (gzipped) WARC shard → [(url, n_bytes, sha256hex)].
    Shared by the Spark mapInPandas parser and the pytest twin."""
    raw = gzip.decompress(data)
    out = []
    pos = 0
    while pos < len(raw):
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = {}
        for line in raw[pos:hdr_end].decode("ascii", "replace").split("\r\n")[1:]:
            key, _, val = line.partition(": ")
            headers[key] = val
        length = int(headers["Content-Length"])
        body = raw[hdr_end + 4 : hdr_end + 4 + length]
        out.append(
            (
                headers["WARC-Target-URI"],
                length,
                hashlib.sha256(body).hexdigest(),
            )
        )
        pos = hdr_end + 4 + length + 4  # skip payload + record separator
    return out


@register(
    "scan_warc",
    oracle="""
    SELECT 'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR)
             AS url,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha
    FROM documents
    WHERE doc_id % 20 = 0
    """,
)
def scan_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-archive ingest: stage sampled documents as REAL gzipped
    WARC/1.0 response records (executor-side foreachPartition sink, one
    shard per partition — the CommonCrawl file layout), then ingest the
    shard directory through Spark's `binaryFile` source and parse the
    records in Arrow batches (mapInPandas — headers + Content-Length
    framing, the actual WARC grammar). The oracle recomputes
    url/size/sha from the source table, so a green row proves the bytes
    survived encode→gzip→disk→scan→parse. At 100 TB: shards are the
    parallelism unit (binaryFile gives one task per shard up to
    maxPartitionBytes) and the parser streams record-at-a-time — no
    whole-archive buffering beyond one shard per task."""
    path = io_dir(sf_dir, "warc_shards")
    os.makedirs(path, exist_ok=True)
    sample = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .select("doc_id", "source", "text")
        .repartition(4)
    )

    def write_shard(rows) -> None:
        buf = bytearray()
        for r in rows:
            buf += _warc_record(r.doc_id, r.source, r.text)
        if not buf:
            return
        final = os.path.join(path, f"shard-{uuid.uuid4().hex}.warc.gz")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(gzip.compress(bytes(buf)))
        os.replace(tmp, final)

    # idempotent across runs: clear previous shards, then stage
    for f in os.listdir(path):
        if f.endswith(".warc.gz"):
            os.remove(os.path.join(path, f))
    sample.foreachPartition(write_shard)

    import pandas as pd

    def parse(batches):
        for pdf in batches:
            recs = []
            for blob in pdf["content"]:
                recs.extend(parse_warc_members(bytes(blob)))
            yield pd.DataFrame(recs, columns=["url", "n_bytes", "sha"])

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("n_bytes", LongType()),
            StructField("sha", StringType()),
        ]
    )
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("content")
        .mapInPandas(parse, schema)
    )


# --- URL canonicalization dedup ---------------------------------------

# Spark-side variant synthesis: four messy spellings of the same page.
# The canonicalizer below must collapse each group of four.


def _messy_url(doc_id):
    g = (F.col("doc_id") / 4).cast("long").cast("string")
    return (
        F.when(
            doc_id % 4 == 0,
            F.concat(
                F.lit("https://WWW.Example.COM/a/"),
                g,
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .when(
            doc_id % 4 == 1,
            F.concat(F.lit("https://www.example.com:443/a/"), g, F.lit("#section-2")),
        )
        .when(doc_id % 4 == 2, F.concat(F.lit("https://www.example.com/a/"), g, F.lit("/")))
        .otherwise(F.concat(F.lit("http://www.example.com/a/"), g))
    )


def canonicalize_url(col):
    """The actual operator: scheme upgrade, case-fold, default-port strip,
    fragment strip, tracking-param strip, trailing-slash strip — pure
    codegen'd regexp chain, no UDF."""
    u = F.lower(col)
    u = F.regexp_replace(u, r"^http://", "https://")
    u = F.regexp_replace(u, r":443/", "/")
    u = F.regexp_replace(u, r"#[\s\S]*", "")
    u = F.regexp_replace(u, r"[?&]utm_[^&#]*", "")
    u = F.regexp_replace(u, r"\?\z", "")
    return F.regexp_replace(u, r"/\z", "")


_CANON_SQL = """
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(lower(url), '^http://', 'https://'),
              ':443/', '/'),
            '#[\\s\\S]*', ''),
          '[?&]utm_[^&#]*', '', 'g'),
        '\\?\\z', ''),
      '/\\z', '')
"""


@register(
    "dedup_url_canonical",
    oracle=f"""
    WITH messy AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'https://WWW.Example.COM/a/' || CAST(doc_id // 4 AS VARCHAR)
                           || '?utm_source=feed&utm_campaign=x'
               WHEN 1 THEN 'https://www.example.com:443/a/' || CAST(doc_id // 4 AS VARCHAR)
                           || '#section-2'
               WHEN 2 THEN 'https://www.example.com/a/' || CAST(doc_id // 4 AS VARCHAR) || '/'
               ELSE 'http://www.example.com/a/' || CAST(doc_id // 4 AS VARCHAR)
             END AS url
      FROM documents
    )
    SELECT {_CANON_SQL} AS canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM messy
    GROUP BY 1
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup after canonicalization — the first dedup pass of
    any crawl pipeline (exact-hash dedup misses the same page spelled
    four ways: tracking params, default ports, fragments, case, trailing
    slash). Canonicalization is a codegen'd regexp chain; the dedup is
    one shuffle on the canonical key with count + survivor (min doc_id,
    the deterministic-survivor rule dedup_exact established). At 100 TB
    this runs before content hashing so payload-level dedup sees each
    canonical page once."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    messy = docs.withColumn("url", _messy_url(F.col("doc_id")))
    return (
        messy.withColumn("canonical_url", canonicalize_url(F.col("url")))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# --- temperature-scaled mixture sampling ------------------------------


@register(
    "sample_temperature",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS DOUBLE) AS c FROM documents GROUP BY source
    ),
    rates AS (
      SELECT source,
             LEAST(1.0,
                   (POW(c, 0.5) / SUM(POW(c, 0.5)) OVER ())
                   * 0.25 * SUM(c) OVER () / c) AS keep_rate
      FROM counts
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
          / 4294967296.0 < r.keep_rate
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source-mixture sampling (α = 0.5, the
    multilingual-corpus rebalancing rule): target mass per source is
    c^α / Σc^α — upweighting small sources relative to their natural
    share — materialized at an overall 25% budget by a per-source keep
    rate min(1, w·T/c). Membership is the md5-unit-interval function of
    doc_id that `sample_hash` established: reproducible across engines,
    runs, and cluster sizes, and adding data never flips old rows.
    Plan shape: one tiny per-source aggregate (broadcast back), then a
    pure map-side filter — no row-proportional shuffle at any scale."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("c"))
    # broadcast the 1-row totals instead of an unpartitioned window;
    # persisted so the totals reuse the aggregate (one docs scan)
    from pyspark import StorageLevel

    counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
    tots = counts.agg(
        F.sum(F.pow("c", 0.5)).alias("sum_sqrt"), F.sum("c").alias("sum_c")
    )
    rates = counts.crossJoin(F.broadcast(tots)).select(
        "source",
        F.least(
            F.lit(1.0),
            (F.pow("c", 0.5) / F.col("sum_sqrt")) * 0.25 * F.col("sum_c") / F.col("c"),
        ).alias("keep_rate"),
    )
    unit = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(4294967296.0)
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(unit < F.col("keep_rate"))
        .select("doc_id", "source")
    )


# --- quantile sketch ---------------------------------------------------


@register(
    "sketch_quantiles",
    oracle="""
    SELECT source,
           ROUND(quantile_cont(n_chars, 0.5), 4) AS p50,
           ROUND(quantile_cont(n_chars, 0.9), 4) AS p90,
           TRUE AS p50_in_bound,
           TRUE AS p90_in_bound
    FROM documents
    GROUP BY source
    """,
)
def sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-distribution profiling with a mergeable quantile sketch:
    `approx_percentile` (Greenwald-Khanna variant, JVM-side, mergeable
    across partitions — the 100 TB path where exact percentiles would
    need a full sort) verified in-query against the exact interpolated
    percentile, using the exact-value + in-bound-boolean oracle pattern
    `sketch_hll_distinct` established: the hashed surface is the exact
    quantile (engine-portable) plus a boolean asserting the sketch's RANK
    guarantee — approx-p50 must land inside the exact [p45, p55] value
    range (GK bounds rank error, not value error: in a gappy tail the
    nearest actual value can sit far from the interpolated quantile while
    still being rank-correct; a 5%-of-value bound falsely failed src19 at
    sf0.01)."""
    docs = table(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast("double")
    agg = docs.groupBy("source").agg(
        F.percentile(nc, 0.5).alias("e50"),
        F.percentile(nc, 0.9).alias("e90"),
        F.percentile(nc, 0.45).alias("e45"),
        F.percentile(nc, 0.55).alias("e55"),
        F.percentile(nc, 0.85).alias("e85"),
        F.percentile(nc, 0.95).alias("e95"),
        F.percentile_approx(nc, 0.5, 10000).alias("a50"),
        F.percentile_approx(nc, 0.9, 10000).alias("a90"),
    )
    return agg.select(
        "source",
        F.round("e50", 4).alias("p50"),
        F.round("e90", 4).alias("p90"),
        F.col("a50").between(F.col("e45"), F.col("e55")).alias("p50_in_bound"),
        F.col("a90").between(F.col("e85"), F.col("e95")).alias("p90_in_bound"),
    )


# --- k-core ------------------------------------------------------------


def _kcore_oracle(k: int = 3, rounds: int = 20) -> str:
    """Unrolled peeling oracle: the k-core is the UNIQUE fixpoint of
    "delete nodes with degree < k", independent of deletion order — so an
    R-round unrolled peel (chained MATERIALIZED CTEs, all-integer
    arithmetic) equals the Spark fixpoint loop whenever R covers the
    convergence depth (verified at every test SF; extra rounds past the
    fixpoint are no-ops by idempotence)."""
    parts = [f"""
WITH simple AS (
  SELECT DISTINCT l_suppkey AS src, o_custkey + 1000000 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
e0 AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM simple WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst FROM simple WHERE src <> dst)
)"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
keep{i} AS MATERIALIZED (
  SELECT src FROM e{i-1} GROUP BY src HAVING COUNT(*) >= {k}
),
e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i-1} e
  JOIN keep{i} a ON a.src = e.src
  JOIN keep{i} b ON b.src = e.dst
)""")
    parts.append(f"""
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{rounds} GROUP BY src""")
    return "".join(parts)


@register("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3) of the supplier↔customer shipment graph
    (same edge derivation as graph_pagerank): iterative peeling of
    nodes with undirected degree < k until fixpoint
    (operators/iterative.py::kcore). The dense-core extraction used to
    find tightly-coupled entity clusters in interaction graphs; at
    100 TB each round is one degree agg + two anti-joins over a
    monotonically SHRINKING edge set. Promoted from rows-only in round 5:
    the k-core fixpoint is unique (order-independent) and all-integer, so
    an unrolled 20-round SQL peel reproduces it exactly (_kcore_oracle).
    Differential-tested against a pure-Python peeling twin
    (tests/test_web_curation.py)."""
    from sdg_data_catalog_spark.operators.iterative import kcore

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("l_suppkey").alias("src"),
            (F.col("o_custkey") + F.lit(1_000_000)).alias("dst"),
        )
        .distinct()
    )
    # max_rounds pinned to the oracle's unroll depth + require_fixpoint:
    # if the graph ever needed more peel rounds than the oracle encodes,
    # this errors loudly instead of hash-mismatching (or silently agreeing
    # on a shared non-fixpoint).
    return kcore(edges, k=3, max_rounds=20, require_fixpoint=True).orderBy("node")


# --- keyword extraction ------------------------------------------------


@register(
    "text_keywords_tfidf",
    oracle="""
    WITH tf AS (
        SELECT doc_id, w AS word, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               ROUND(CAST(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)
                          AS DOUBLE), 6) AS score,
               ROW_NUMBER() OVER (
                 PARTITION BY tf.doc_id
                 ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                          tf.word
               ) AS rank
        FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, score, CAST(rank AS INTEGER) AS rank
    FROM scored WHERE rank <= 3 AND score > 0
    """,
)
def text_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: top-3 tf-idf terms per document with a
    deterministic tie-break (score desc, word asc) — the per-document
    tagging/labeling step of corpus exploration (the reference's TM_2
    topic surface names documents by dominant terms; this is the direct
    per-doc analog). Plan shape matches text_tfidf (one token-explode
    shuffle, vocab-sized df broadcast back); the per-doc top-k window
    partitions on doc_id, so ranking adds one co-partitioned window over
    the already-shuffled tf frame, never a global sort."""
    from pyspark.sql import Window

    from sdg_data_catalog_spark.functions import text as T

    docs = table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()
    score = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_raw"), F.asc("word"))
    return (
        tf.join(F.broadcast(df), "word")
        .withColumn("score_raw", score)
        .withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= 3) & (F.col("score_raw") > 0))
        .select(
            "doc_id",
            "word",
            F.round("score_raw", 6).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- grouped correlation matrix ---------------------------------------


@register(
    "agg_corr_matrix",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(stddev_samp(l_extendedprice), 4) AS sd_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped correlation/covariance matrix over fact measures — the
    feature-statistics pass a dataset profiler runs before model
    training (detects redundant features and leakage candidates). All
    five moments are single-pass partial-aggregable (sum/sum-of-
    products accumulators), so the whole matrix costs ONE map-side-
    combined shuffle on the group key — no per-pair passes, no driver
    math. At 100 TB: cost is identical to one groupBy-sum regardless of
    how many measure pairs are requested."""
    li = table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    price = F.col("l_extendedprice").cast("double")
    disc = F.col("l_discount").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(qty, price), 6).alias("corr_qty_price"),
        F.round(F.corr(qty, disc), 6).alias("corr_qty_disc"),
        F.round(F.covar_samp(qty, price), 4).alias("cov_qty_price"),
        F.round(F.stddev_samp(qty), 6).alias("sd_qty"),
        F.round(F.stddev_samp(price), 4).alias("sd_price"),
    )


# --- dataset card ------------------------------------------------------


@register(
    "agg_dataset_card",
    oracle="""
    WITH per_lang AS (
      SELECT lang,
             COUNT(*) AS n_docs,
             COUNT(DISTINCT source) AS n_sources,
             SUM(n_chars) AS total_chars,
             SUM(len(string_split(text, ' '))) AS total_tokens,
             quantile_cont(n_chars, 0.5) AS p50_chars
      FROM documents GROUP BY lang
    )
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_sources AS BIGINT) AS n_sources,
           ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6) AS doc_share,
           CAST(total_chars AS BIGINT) AS total_chars,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           ROUND(p50_chars, 4) AS p50_chars
    FROM per_lang
    """,
)
def agg_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card generator: the per-language composition table a data
    release publishes (doc counts, source diversity, size shares, token
    totals, length medians). One shuffle on lang computes everything —
    token counting is a codegen'd size(split()) expression, the share
    normalization is a window over the |langs|-row aggregate only. The
    100 TB version of 'describe this corpus' that drives mixture and
    filtering decisions; pairs with `sample_temperature` (which consumes
    exactly these shares)."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("total_tokens"),
        F.percentile(F.col("n_chars").cast("double"), 0.5).alias("p50_raw"),
    )
    # broadcast the 1-row total instead of an unpartitioned window;
    # persisted so the total reuses the aggregate (one docs scan)
    from pyspark import StorageLevel

    per_lang = per_lang.persist(StorageLevel.MEMORY_AND_DISK)
    tot = per_lang.agg(F.sum("n_docs").alias("tot_docs"))
    return per_lang.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_sources",
        F.round(F.col("n_docs").cast("double") / F.col("tot_docs"), 6).alias(
            "doc_share"
        ),
        "total_chars",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.round("p50_raw", 4).alias("p50_chars"),
    )
