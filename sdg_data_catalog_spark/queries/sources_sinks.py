"""Source / sink operator surface (SURVEY.md §2.1).

The reference ingests JSONL dumps line-by-line (scrapping/papers_download.py:37-65),
CERMXML papers via BeautifulSoup (dataset_ner/paper_processing.py:67-69,226),
CSVs/pickles/Excel via pandas, and sinks rows one INSERT+commit at a time into
SQLite (utils/db_connection.py:61-87) or appends JSONL via srsly
(dataset_ner/prodigy_processing.py:20-30). Here every format is a real Spark
reader/writer round-trip: the query materializes the driver's parquet tables
into the target format under ``.scratch/`` (repo-local, gitignored), reads it
back with an explicit schema (manual column pruning becomes schema pruning),
and the oracle checks the round-trip against the original table — so the scan
path, not just the transform, is what's verified.

Scale notes: every write/read here is distributed (``df.write`` /
``spark.read``) except the pickle/Excel paths, which are driver-side by
design — they model the reference's GloVe-pickle / spreadsheet ingest of
*small* dimension data that becomes a broadcast table (SURVEY §2.1
scan_pickle), never a fact-table path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.sources.formats import SCRATCH as _SCRATCH
from sdg_data_catalog_spark.sources.formats import (
    io_dir as _io_dir,
    roundtrip_csv,
    roundtrip_json,
    roundtrip_parquet,
)


# ---------------------------------------------------------------------------
# Scans
# ---------------------------------------------------------------------------
@register(
    "scan_jsonl",
    oracle="SELECT doc_id, lang, source FROM documents WHERE lang IS NOT NULL",
)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL scan with projection (papers_download.py:37-65: ujson per line,
    keep only id/title/authors). Spark: write documents as JSONL, read back
    with an explicit schema — the schema IS the projection, so the scan never
    materializes dropped fields (the manual pruning the reference hand-rolled
    is a ReadSchema property here)."""
    path = _io_dir(sf_dir, "docs_jsonl")
    out = table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    schema = "doc_id BIGINT, lang STRING, source STRING"  # n_chars pruned at scan
    return roundtrip_json(out, spark, path, schema).filter(F.col("lang").isNotNull())


@register(
    "scan_jdbc",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(c_acctbal) AS DOUBLE), 2) AS total_acctbal
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    """,
)
def scan_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE external-database scan over JDBC (reference analog: the SQLite
    catalog behind utils/db_connection.py:12-32, read driver-side row by
    row). Customers are seeded ONCE into an embedded Apache Derby database
    (the JDBC database that ships with Spark itself), then read back with
    spark.read.jdbc partitioned on c_custkey — N executor-side connections
    each pull one key-range slice in parallel, and the acctbal filter
    pushes down into the remote SQL (JDBCRelation PushedFilters). At scale
    the same reader code points at the warehouse's client-server JDBC URL;
    ingest bandwidth scales with numPartitions. Oracle runs the same
    aggregation on the original parquet — the JDBC round-trip must be
    lossless."""
    from sdg_data_catalog_spark.sources import jdbc as J

    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    db_dir = _io_dir(sf_dir, "jdbc_derby", fresh=False)
    J.seed_jdbc_table(spark, cust, db_dir, "customer")
    lo, hi = cust.agg(F.min("c_custkey"), F.max("c_custkey")).collect()[0]
    remote = J.read_jdbc_partitioned(
        spark, db_dir, "customer", "c_custkey", int(lo), int(hi), num_partitions=8
    )
    return (
        remote.filter(F.col("c_acctbal") > 0)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "scan_csv",
    oracle="SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars FROM documents",
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scan with explicit schema (ner_pipeline.py:69 pd.read_csv)."""
    path = _io_dir(sf_dir, "docs_csv")
    out = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return roundtrip_csv(out, spark, path, "doc_id BIGINT, source STRING, n_chars BIGINT")


@register(
    "scan_xml",
    oracle="""
    SELECT doc_id,
           source || '-' || CAST(doc_id AS VARCHAR) AS title,
           substr(text, 1, 60) AS abstract,
           array_to_string(
             list_transform(range(0, 1 + CAST(doc_id % 3 AS INTEGER)),
                            i -> source || '_a' || CAST(i AS VARCHAR)), '|') AS authors,
           array_to_string(
             list_transform(range(0, 1 + CAST(doc_id % 3 AS INTEGER)),
                            i -> 'U' || CAST((doc_id + i) % 7 AS VARCHAR)), '|') AS affiliations,
           CAST(1 + doc_id % 3 AS INTEGER) AS n_authors
    FROM documents
    """,
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested CERMXML article scan (paper_processing.py:67-129: BeautifulSoup
    get_title/get_abstract/get_authors over ``front`` / repeated
    ``contrib[contrib-type=author]`` elements, each with a nested ``aff``).

    Each document is rendered as a genuinely nested article — a variable
    number (1-3) of author contribs plus a decoy editor contrib — written as
    text files, read back distributed, and parsed with the `xpath()` SQL
    family: `xpath_string` for the scalar title/abstract and `xpath(...)`
    returning a multi-valued array for the author/affiliation lists, with
    the `[@contrib-type="author"]` predicate proving the structural filter
    (the editor must NOT appear). All parsing runs JVM-side; the oracle
    checks generate→parse is the identity on the underlying fields.
    Multi-valued outputs are '|'-joined for canonicalization safety."""
    path = _io_dir(sf_dir, "docs_xml")
    docs = table(spark, sf_dir, "documents")
    idx = F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
    contribs = F.concat_ws(
        "",
        F.transform(
            idx,
            lambda i: F.format_string(
                '<contrib contrib-type="author"><name>%s_a%s</name>'
                "<aff>U%s</aff></contrib>",
                F.col("source"),
                i.cast("string"),
                ((F.col("doc_id") + i) % 7).cast("string"),
            ),
        ),
    )
    article = F.format_string(
        "<article><front><title>%s-%s</title><abstract><p>%s</p></abstract>"
        '%s<contrib contrib-type="editor"><name>ed_%s</name></contrib>'
        "</front></article>",
        F.col("source"),
        F.col("doc_id"),
        F.col("text").substr(1, 60),
        contribs,
        F.col("lang"),
    )
    docs.select(article.alias("value")).write.text(path)
    xml = spark.read.text(path)
    authors = F.expr(
        "xpath(value, '/article/front/contrib[@contrib-type=\"author\"]/name/text()')"
    )
    affs = F.expr(
        "xpath(value, '/article/front/contrib[@contrib-type=\"author\"]/aff/text()')"
    )
    return xml.select(
        F.expr("xpath_string(value, '/article/front/title')").alias("_title"),
        F.expr("xpath_string(value, '/article/front/abstract/p')").alias("abstract"),
        F.array_join(authors, "|").alias("authors"),
        F.array_join(affs, "|").alias("affiliations"),
        F.size(authors).alias("n_authors"),
    ).select(
        F.regexp_extract("_title", r"-(\d+)$", 1).cast("bigint").alias("doc_id"),
        F.col("_title").alias("title"),
        "abstract",
        "authors",
        "affiliations",
        "n_authors",
    )


@register("scan_pickle", oracle="SELECT n_nationkey, n_name FROM nation")
def scan_pickle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pickle scan (ner_pipeline.py:106 GloVe pickle; paper_classification/
    utils.py:15-16). Driver-side by design: pickles carry small dimension
    data (vocab/embedding maps) that becomes a broadcast table — never a
    fact-table format."""
    import pandas as pd

    sf = os.path.basename(os.path.normpath(sf_dir))
    pkl_dir = os.path.join(_SCRATCH, sf, "nation_pickle")
    os.makedirs(pkl_dir, exist_ok=True)
    pkl = os.path.join(pkl_dir, "nation.pkl")
    pd.read_parquet(os.path.join(sf_dir, "nation.parquet")).to_pickle(pkl)
    pdf = pd.read_pickle(pkl)[["n_nationkey", "n_name"]]
    return spark.createDataFrame(pdf)


@register("scan_excel", oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def scan_excel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel scan (TM_1_DataCleaning.ipynb cell 1: pd.read_excel). Gated on
    openpyxl (not in this container); falls back to the same pandas→
    createDataFrame ingest from CSV bytes, which is the operator's actual
    shape per SURVEY §2.1 — small spreadsheet → driver pandas → DataFrame."""
    import pandas as pd

    sf = os.path.basename(os.path.normpath(sf_dir))
    xdir = os.path.join(_SCRATCH, sf, "nation_excel")
    os.makedirs(xdir, exist_ok=True)
    src = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    try:
        import openpyxl  # noqa: F401

        xlsx = os.path.join(xdir, "nation.xlsx")
        src.to_excel(xlsx, index=False)
        pdf = pd.read_excel(xlsx)
    except ImportError:  # container has no excel engine — CSV-bytes fallback
        csv = os.path.join(xdir, "nation.csv")
        src.to_csv(csv, index=False)
        pdf = pd.read_csv(csv)
    return spark.createDataFrame(pdf[["n_nationkey", "n_name", "n_regionkey"]])


# ---------------------------------------------------------------------------
# Sinks (write → read-back → verify; the oracle sees the original table)
# ---------------------------------------------------------------------------
@register(
    "sink_jsonl",
    oracle="""
    SELECT substr(text, 1, 60) AS text,
           sha256(source || '-' || CAST(doc_id AS VARCHAR)) AS paragraph_id,
           doc_id AS paper_id
    FROM documents
    """,
)
def sink_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prodigy-shaped JSONL sink (prodigy_processing.py:20-30: {"text",
    "meta":{paragraph_id, paper_id}} via srsly append). Spark: nested struct
    → write.json, read back with the struct schema, flatten. Ids are
    sha2-derived, not uuid4 (deterministic — SURVEY §7 'what's hard')."""
    path = _io_dir(sf_dir, "prodigy_jsonl")
    docs = table(spark, sf_dir, "documents")
    (
        docs.select(
            F.col("text").substr(1, 60).alias("text"),
            F.struct(
                F.sha2(F.concat_ws("-", "source", "doc_id"), 256).alias("paragraph_id"),
                F.col("doc_id").alias("paper_id"),
            ).alias("meta"),
        ).write.json(path)
    )
    back = spark.read.schema("text STRING, meta STRUCT<paragraph_id: STRING, paper_id: BIGINT>").json(path)
    return back.select("text", F.col("meta.paragraph_id").alias("paragraph_id"), F.col("meta.paper_id").alias("paper_id"))


@register(
    "sink_csv",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(AVG(n_chars) AS DOUBLE), 4) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def sink_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + read-back (TM_1 cell 23 df.to_csv)."""
    path = _io_dir(sf_dir, "lang_stats_csv")
    (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("n_chars"), 4).alias("avg_chars"))
        .write.option("header", True)
        .csv(path)
    )
    return spark.read.schema("lang STRING, n_docs BIGINT, avg_chars DOUBLE").option("header", True).csv(path)


@register(
    "sink_report",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           ROUND(CAST(AVG(n_chars) AS DOUBLE), 4) AS avg_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    """,
)
def sink_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON metrics-report sink (wrapper_ner.py:38-49: json.dump of scores).
    Single-row corpus report written as JSON and read back. The reference
    stamps datetime.today() (wrapper_ner.py:41); here the report carries only
    data-derived fields so the value hash is deterministic."""
    path = _io_dir(sf_dir, "report_json")
    (
        table(spark, sf_dir, "documents")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .write.json(path)
    )
    return spark.read.schema("n_docs BIGINT, n_langs BIGINT, avg_chars DOUBLE, max_chars BIGINT").json(path)


@register(
    "sink_parquet",
    oracle="SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source",
)
def sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched columnar sink replacing the reference's per-row INSERT+commit
    (utils/db_connection.py:68-73 — one transaction per row). Spark writes
    whole partitions atomically; read-back verifies the round trip."""
    path = _io_dir(sf_dir, "source_counts_parquet")
    out = table(spark, sf_dir, "documents").groupBy("source").agg(F.count("*").alias("n_docs"))
    return roundtrip_parquet(out, spark, path)


@register(
    "filter_done",
    oracle="""
    SELECT doc_id, source FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 7 = 0)
    """,
)
def filter_done(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-already-processed predicate (papers_download.py:49,61: skip ids
    with an existing .pdf.gz / .pdf.fail on disk). The on-disk ledger becomes
    a status table and the skip becomes a LEFT ANTI join — at scale this is a
    broadcast-anti against the (small) done-ledger instead of N stat() calls."""
    docs = table(spark, sf_dir, "documents")
    done_ledger = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return docs.join(done_ledger, "doc_id", "left_anti").select("doc_id", "source")


# ---------------------------------------------------------------------------
# Side-effecting connectors (no oracle — rows-only checks; network I/O is
# simulated deterministically because this container is offline)
# ---------------------------------------------------------------------------
@register("src_http")
def src_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTTP fetch connector shape (papers_download.py:72-119 pycurl with
    redirect-follow + charset sniff). A side-effecting *source* is not a
    Catalyst scan: the fetch runs inside mapInPandas over a URL frame, one
    Arrow batch at a time, so 1000 executors fan out politely instead of a
    driver loop. Offline here, so the fetch is a deterministic simulator
    (status/content-type derived from the key); swap `_fake_fetch` for
    urllib/pycurl in a networked deployment."""
    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "source").limit(500)
    plan = docs.select(
        "doc_id",
        F.concat(F.lit("https://papers.example.org/"), F.col("source"), F.lit("/"), F.col("doc_id"), F.lit(".pdf")).alias("url"),
    )

    def _fake_fetch(batches):
        for pdf in batches:
            status = (pdf["doc_id"] % 5 != 0).map({True: 200, False: 404})
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "url": pdf["url"],
                    "status": status.astype("int32"),
                    "content_type": status.map(lambda s: "application/pdf" if s == 200 else "text/html"),
                }
            )

    return plan.mapInPandas(_fake_fetch, "doc_id BIGINT, url STRING, status INT, content_type STRING")


@register("src_scrape")
def src_scrape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERP/arXiv top-3 result extraction (papers_download.py:125-131
    find_all('div', class_='r')[:3]; papers_scrapping_specific_arxiv.py:
    100-116). Candidate generation is posexplode + per-query row_number<=3 —
    the [:3] cap is a window, not a driver loop. Hit URLs are synthesized
    deterministically (offline)."""
    from pyspark.sql.window import Window

    docs = table(spark, sf_dir, "documents").select("doc_id", "source").limit(200)
    hits = docs.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.concat(F.lit("https://hit"), F.lit(i), F.lit(".example.org/"), F.col("doc_id")) for i in range(5)])
        ).alias("pos", "hit_url"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "hit_url")
    )


@register("sink_pdf")
def sink_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validated-download sink ledger (papers_download.py:136-150: write
    .pdf.gz.tmp, PyPDF2-validate, atomic rename; .fail marker on error).
    The write+validate runs per Arrow batch in mapInPandas; the *ledger* —
    ok/fail + payload fingerprint — is the returned DataFrame, replacing
    filesystem markers with a status table (append-only at scale). Payload
    validation checks a magic prefix, standing in for PyPDF2 (binary pdf libs
    not in this container)."""
    import hashlib

    import pandas as pd

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(500)
    payloads = docs.select(
        "doc_id",
        # deterministic fake payload: valid '%PDF' magic except every 7th doc
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit("CORRUPT"), F.col("text")))
        .otherwise(F.concat(F.lit("%PDF-1.4\n"), F.col("text")))
        .cast("binary")
        .alias("payload"),
    )

    def _validate_and_ledger(batches):
        for pdf in batches:
            ok = pdf["payload"].map(lambda b: bytes(b).startswith(b"%PDF"))
            digest = pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ok": ok,
                    "sha256": digest,
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return payloads.mapInPandas(_validate_and_ledger, "doc_id BIGINT, ok BOOLEAN, sha256 STRING, n_bytes BIGINT")


@register(
    "sink_upsert",
    oracle="""
    WITH base AS (SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 3 != 0),
    updates AS (SELECT doc_id, 'upd-' || source AS source, n_chars + 1 AS n_chars
                FROM documents WHERE doc_id % 2 = 0)
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, is_update FROM (
        SELECT u.doc_id, u.source, u.n_chars, TRUE AS is_update FROM updates u
        UNION ALL
        SELECT b.doc_id, b.source, b.n_chars, FALSE AS is_update
        FROM base b WHERE b.doc_id NOT IN (SELECT doc_id FROM updates)
    )
    """,
)
def sink_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics on a parquet sink (the Delta-less form of
    incremental catalog maintenance — the reference re-INSERTs per row with
    no conflict handling, db_connection.py:61-87). Updates win over base via
    LEFT ANTI + UNION; the merge is published through the atomic
    versioned-dir + pointer-file swap (sources/atomic.py) — version 0 is
    the base table, version 1 the merged table, and a concurrent reader
    holding the old snapshot keeps its files while new readers resolve the
    flipped pointer (tested in tests/test_contract.py). At scale the same
    shape is one `MERGE INTO` on Delta/Iceberg; the anti-join formulation
    shuffles only on doc_id and broadcasts when updates are small.

    Every publish here is DQ-GATED (operators/dq.py::document_gate): the
    constraint report runs on the staged snapshot between write and
    pointer flip, so a batch with duplicate/null doc_ids or negative
    n_chars can never become LATEST
    (tests/test_contract.py::test_publish_gate_blocks_bad_batch)."""
    from sdg_data_catalog_spark.operators.dq import document_gate
    from sdg_data_catalog_spark.sources.atomic import publish, read_latest

    root = _io_dir(sf_dir, "docs_upserted")
    docs = table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "source", "n_chars")
    publish(base.withColumn("is_update", F.lit(False)), root, 0, gate=document_gate)
    updates = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.concat(F.lit("upd-"), F.col("source")).alias("source"),
        (F.col("n_chars") + 1).alias("n_chars"),
    )
    current = read_latest(spark, root)
    merged = (
        updates.withColumn("is_update", F.lit(True))
        .unionByName(
            current.drop("is_update")
            .join(updates.select("doc_id"), "doc_id", "left_anti")
            .withColumn("is_update", F.lit(False))
        )
    )
    publish(merged, root, 1, gate=document_gate)
    return read_latest(spark, root)


@register(
    "scan_schema_evolution",
    oracle="""
    SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: generation 1 files carry (doc_id, lang),
    generation 2 adds n_chars; `mergeSchema` unifies them — old files
    surface NULL for the new column, no rewrite of existing data. The
    reference has no schema evolution at all (SURVEY.md §1.3: fixed DDL,
    stringly columns); at 100 TB, additive evolution without rewriting
    petabytes is table stakes. mergeSchema reads every footer — on huge
    file counts prefer an explicit unified schema; both paths shown here
    (explicit schema on the final select)."""
    path = _io_dir(sf_dir, "docs_evolve")
    docs = table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    v1.write.mode("overwrite").parquet(os.path.join(path, "gen=1"))
    v2.write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )
    return merged.select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))


@register(
    "scan_datasource_api",
    oracle=f"""
    SELECT CAST(i AS BIGINT) AS paper_id,
           CAST(i // 100 AS INTEGER) AS page,
           'paper-' || CAST(i AS VARCHAR) AS title,
           CAST((i * 2654435761) % 50 AS INTEGER) AS n_refs
    FROM range(1000) t(i)
    """,
)
def scan_datasource_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom source via the Spark 4 Python DataSource API
    (sources/datasource_api.py): the paginated-API ingest pattern with one
    page per input partition — the planner fans pages across executors
    instead of the reference's driver-side requests loop
    (papers_download.py). Content is deterministic, so the full scan
    oracle-checks cell-for-cell against a SQL range() generator."""
    from sdg_data_catalog_spark.sources.datasource_api import register_papers_source

    register_papers_source(spark)
    return (
        spark.read.format("sdg_papers")
        .option("pages", "10")
        .option("page_size", "100")
        .load()
    )


@register(
    "scan_orc",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE n_chars > 50
    GROUP BY source
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC scan/sink round-trip — the second vectorized columnar format in
    Spark core (warehouses standardized on ORC feed lakes exactly this way).
    Write documents as ORC, read back with an explicit 3-column schema (text
    is pruned at the stripe level, never decoded) and a pushed n_chars
    predicate; the oracle checks the round-trip aggregate against the
    original parquet. Plan-gated in tests/test_plans.py: the ORC scan must
    show the pruned ReadSchema and the pushed filter, same contract as the
    parquet path."""
    from sdg_data_catalog_spark.sources.formats import roundtrip_orc

    path = _io_dir(sf_dir, "docs_orc")
    out = table(spark, sf_dir, "documents")
    back = roundtrip_orc(
        out, spark, path, "doc_id BIGINT, source STRING, n_chars BIGINT"
    )
    return (
        back.filter(F.col("n_chars") > 50)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "scan_time_travel",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_v1,
           CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_even
    FROM documents
    WHERE doc_id % 2 = 0
    GROUP BY source
    """,
)
def scan_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel over the versioned atomic store
    (sources/atomic.py): publish v1 (half the corpus) then v2 (all of it),
    and read v1 BACK while v2 is current — the audit/debug primitive
    ('what did the table contain when the model was trained?') that
    Delta/Iceberg expose as VERSION AS OF. The versioned-dir layout makes
    historical reads free: each publish is an immutable directory, so
    time travel is a path choice, no log replay. Retention is the
    explicit trade: publish(keep=N) bounds storage and bounds how far
    back travel reaches."""
    from sdg_data_catalog_spark.sources.atomic import publish, read_version

    root = _io_dir(sf_dir, "docs_versioned")
    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    publish(docs.filter(F.col("doc_id") % 2 == 0), root, 1)
    publish(docs, root, 2)  # v2 current; v1 retained
    v1 = read_version(spark, root, 1)
    return v1.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_v1"),
        F.sum((F.col("doc_id") % 2 == 0).cast("int")).cast("bigint").alias("n_even"),
    )
