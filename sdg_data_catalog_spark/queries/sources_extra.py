"""Round-4 source/catalog additions: raw binary-file ingestion (the E1
paper-ingestion entry shape) and snapshot diffing between published
table versions.

`scan_binaryfile` is the missing first hop of SURVEY.md §3 E1's Spark
shape — `read.format('binaryFile') → parse → ...` (the reference's
`glob.glob` + `Pool.map` over .cermxml files,
`dataset_ner/paper_processing.py:224-228`): files are written
executor-side via foreachPartition (E3's sink pattern) and re-ingested
through Spark's binaryFile source, so content really round-trips disk.

`catalog_diff_versions` rides the atomic versioned publish
(`sources/atomic.py`) that `sink_upsert`/`scan_time_travel` use: the
added/removed/changed audit between two snapshots is THE question a
versioned 100 TB catalog answers daily, and it reduces to one full
outer join on the primary key — no content shuffle beyond the key+hash
columns projected into the join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register
from sdg_data_catalog_spark.sources.atomic import publish, read_version
from sdg_data_catalog_spark.sources.formats import io_dir


@register(
    "scan_binaryfile",
    oracle="""
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.bin' AS fname,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS sha
    FROM documents
    WHERE doc_id % 50 = 0
    """,
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw binary-file ingestion: stage one .bin file per sampled document
    (written executor-side inside foreachPartition — the distributed file
    sink of SURVEY §3 E3; on a cluster the target would be a shared
    filesystem), then ingest the directory through Spark's `binaryFile`
    source and fingerprint each payload with sha2 over the actual bytes
    read back from disk. The oracle recomputes name/size/sha from the
    source table, so a green row proves the bytes survived the
    write→scan round-trip — the trust property a lake's raw-ingest tier
    is built on. binaryFile scans parallelize per-file (one partition
    per file up to maxPartitionBytes) and prune the `content` column
    when only metadata is selected."""
    path = io_dir(sf_dir, "binfiles")
    os.makedirs(path, exist_ok=True)
    sample = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .select("doc_id", "text")
    )

    def write_part(rows) -> None:
        for r in rows:
            # atomic per-file publish: temp + rename, E3's sink discipline
            final = os.path.join(path, f"doc_{r.doc_id}.bin")
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(r.text.encode("utf-8"))
            os.replace(tmp, final)

    sample.foreachPartition(write_part)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
            F.col("length").alias("n_bytes"),
            F.sha2(F.col("content"), 256).alias("sha"),
        )
    )


@register(
    "stream_datasource_api",
    oracle="""
    SELECT CAST(i AS BIGINT) AS paper_id,
           CAST(i // 100 AS INTEGER) AS page,
           'paper-' || CAST(i AS VARCHAR) AS title,
           CAST((i * 2654435761) % 50 AS INTEGER) AS n_refs
    FROM range(500) t(i)
    """,
)
def stream_datasource_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paginated-API source consumed as a REAL stream through the
    Spark 4 Python `SimpleDataSourceStreamReader`
    (sources/datasource_api.py::PapersStreamReader): one page per
    micro-batch, page-number offsets checkpointed by the engine, and
    deterministic `readBetweenOffsets` replay for failed batches — the
    incremental-ingest twin of `scan_datasource_api` (a crawler that
    keeps discovering new pages instead of rescanning). The 5-page
    backlog is drained with `processAllAvailable` into a memory sink;
    because page content is deterministic, the drained stream
    oracle-checks cell-for-cell against the same generator SQL as the
    batch scan — streaming ingest must be value-identical to batch."""
    from sdg_data_catalog_spark.sources.datasource_api import (
        register_papers_stream_source,
    )
    from sdg_data_catalog_spark.sources.formats import table_safe_sf_name

    register_papers_stream_source(spark)
    name = f"t_stream_papers_{table_safe_sf_name(sf_dir)}"
    q = (
        spark.readStream.format("sdg_papers_stream")
        .option("pages", "5")
        .option("page_size", "100")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "catalog_diff_versions",
    oracle="""
    WITH v0 AS (
      SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0
    ),
    v1 AS (
      SELECT doc_id,
             n_chars + CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END AS n_chars
      FROM documents WHERE doc_id % 3 <> 0
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM (
      SELECT CASE
               WHEN v0.doc_id IS NULL THEN 'added'
               WHEN v1.doc_id IS NULL THEN 'removed'
               WHEN v0.n_chars <> v1.n_chars THEN 'changed'
               ELSE 'unchanged'
             END AS status
      FROM v0 FULL OUTER JOIN v1 ON v0.doc_id = v1.doc_id
    )
    GROUP BY status
    """,
)
def catalog_diff_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two published table versions: counts of
    added / removed / changed / unchanged rows keyed on the primary key.
    Two deterministic snapshots are staged through the SAME atomic
    versioned publish `sink_upsert`/`scan_time_travel` use (pointer-file
    flip, so a concurrent reader never sees a half-diffed table), then
    both versions are read back and full-outer-joined on the key. Only
    (key, compared columns) flow into the join — at 100 TB you project a
    row hash per side instead of the payload, and the join shuffles
    key+hash, not content. The oracle recomputes the expected diff
    straight from the source table, so a green row proves version
    isolation AND the diff logic."""
    root = io_dir(sf_dir, "diff_versions")
    docs = table(spark, sf_dir, "documents")
    v0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars")
    v1 = docs.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        (
            F.col("n_chars")
            + F.when(F.col("doc_id") % 10 == 0, 1).otherwise(0)
        ).alias("n_chars"),
    )
    publish(v0, root, 0)
    publish(v1, root, 1)
    old = read_version(spark, root, 0).select(
        F.col("doc_id").alias("k0"), F.col("n_chars").alias("c0")
    )
    new = read_version(spark, root, 1).select(
        F.col("doc_id").alias("k1"), F.col("n_chars").alias("c1")
    )
    status = (
        F.when(F.col("k0").isNull(), "added")
        .when(F.col("k1").isNull(), "removed")
        .when(F.col("c0") != F.col("c1"), "changed")
        .otherwise("unchanged")
    )
    return (
        old.join(new, F.col("k0") == F.col("k1"), "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    "scan_fixedwidth",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(38 AS INTEGER) AS rec_len
    FROM nation
    """,
)
def scan_fixedwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (mainframe/COBOL copybook-shaped) text scan: records are
    rendered as padded fixed-offset lines (key@1..6, name@7..32,
    regionkey@33..38), written as plain text executor-side, then re-ingested
    with `spark.read.text` + substring/trim/cast parsing — the layout is the
    schema, exactly how a real fixed-width feed is consumed. All parsing is
    codegen'd column arithmetic (substring positions are 1-based in both
    engines); the oracle recomputes the fields from the source table, so a
    green row proves the pad→write→scan→parse round-trip is lossless. The
    constant record length is surfaced so a drifting layout (a mispadded
    producer) flips the hash. Text-line scans split by newline and
    parallelize per file block — no different from CSV at 100 TB."""
    path = io_dir(sf_dir, "fixedwidth")
    src = table(spark, sf_dir, "nation")
    lines = src.select(
        F.concat(
            F.rpad(F.col("n_nationkey").cast("string"), 6, " "),
            F.rpad(F.col("n_name"), 26, " "),
            F.rpad(F.col("n_regionkey").cast("string"), 6, " "),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    return raw.select(
        F.trim(F.substring("value", 1, 6)).cast("int").alias("n_nationkey"),
        F.trim(F.substring("value", 7, 26)).alias("n_name"),
        F.trim(F.substring("value", 33, 6)).cast("int").alias("n_regionkey"),
        F.length("value").cast("int").alias("rec_len"),
    )


@register(
    "stream_table_changes",
    oracle="""
    WITH v0 AS (
      SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0
    ),
    v1 AS (
      SELECT doc_id,
             n_chars + CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END AS n_chars
      FROM documents WHERE doc_id % 3 <> 0
    ),
    v2 AS (
      SELECT doc_id,
             n_chars + CASE WHEN doc_id % 8 = 0 THEN 2 ELSE 0 END AS n_chars
      FROM documents WHERE doc_id % 4 = 0
    ),
    d1 AS (
      SELECT 1 AS version,
             CASE WHEN v0.doc_id IS NULL THEN 'added'
                  WHEN v1.doc_id IS NULL THEN 'removed'
                  ELSE 'changed' END AS change_type,
             COALESCE(v1.doc_id, v0.doc_id) AS doc_id,
             CASE WHEN v1.doc_id IS NULL THEN v0.n_chars
                  ELSE v1.n_chars END AS n_chars
      FROM v0 FULL OUTER JOIN v1 ON v0.doc_id = v1.doc_id
      WHERE v0.doc_id IS NULL OR v1.doc_id IS NULL OR v0.n_chars <> v1.n_chars
    ),
    d2 AS (
      SELECT 2 AS version,
             CASE WHEN v1.doc_id IS NULL THEN 'added'
                  WHEN v2.doc_id IS NULL THEN 'removed'
                  ELSE 'changed' END AS change_type,
             COALESCE(v2.doc_id, v1.doc_id) AS doc_id,
             CASE WHEN v2.doc_id IS NULL THEN v1.n_chars
                  ELSE v2.n_chars END AS n_chars
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
      WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.n_chars <> v2.n_chars
    )
    SELECT CAST(version AS INTEGER) AS version, change_type,
           doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
    """,
)
def stream_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed stream over the repo's own versioned table format
    (sources/datasource_api.py::make_table_changes_stream_source — the
    Delta-CDF shape): three snapshots are published through the DQ-capable
    atomic store, then consumed as a stream where EACH VERSION IS ONE
    MICRO-BATCH of (added/removed/changed) row changes, version-number
    offsets are checkpointed by the engine, and readBetweenOffsets replays
    committed version ranges deterministically from the retained snapshot
    dirs. Downstream, this is what incremental consumers (rollup
    maintenance, index refresh, cache invalidation) subscribe to instead
    of re-diffing snapshots. The oracle recomputes both change batches
    relationally from the source table — the drained feed must equal the
    full-outer-join diffs cell-for-cell, proving stream ≡ batch on the
    change semantics."""
    from sdg_data_catalog_spark.sources.datasource_api import (
        register_table_changes_stream_source,
    )
    from sdg_data_catalog_spark.sources.formats import table_safe_sf_name

    root = io_dir(sf_dir, "cdf_versions")
    docs = table(spark, sf_dir, "documents")
    v0 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "n_chars")
    v1 = docs.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id",
        (F.col("n_chars") + F.when(F.col("doc_id") % 10 == 0, 1).otherwise(0)).alias(
            "n_chars"
        ),
    )
    v2 = docs.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id",
        (F.col("n_chars") + F.when(F.col("doc_id") % 8 == 0, 2).otherwise(0)).alias(
            "n_chars"
        ),
    )
    publish(v0, root, 0, keep=10)
    publish(v1, root, 1, keep=10)
    publish(v2, root, 2, keep=10)

    register_table_changes_stream_source(spark)
    name = f"t_stream_changes_{table_safe_sf_name(sf_dir)}"
    q = (
        spark.readStream.format("sdg_table_changes")
        .option("root", root)
        .option("max_version", "2")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "sink_datasource_api",
    oracle="""
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM documents WHERE doc_id % 7 = 0
    """,
)
def sink_datasource_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write through the Spark 4 Python DataSource WRITER
    (sources/datasource_api.py::make_jsonl_sink_source): executor tasks
    stream JSONL shards to temp files, the driver-side job commit
    promotes them and writes the `_SUCCESS` manifest, aborts clean up —
    the task-commit/job-commit protocol the reference's per-row
    INSERT+commit lacks entirely (db_connection.py:68-73). The query
    writes a documents slice through the sink, then reads the COMMITTED
    shards back with the ordinary JSON scan; the oracle recomputes the
    slice from the source table, so a green row proves both the bytes
    and the commit promotion. The abort path (failed job ⇒ no visible
    output, no _SUCCESS) is pinned by
    tests/test_sources_extra.py::test_jsonl_sink_abort_leaves_no_output."""
    from sdg_data_catalog_spark.sources.datasource_api import (
        register_jsonl_sink_source,
    )

    register_jsonl_sink_source(spark)
    path = io_dir(sf_dir, "jsonl_sink")
    out = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", "lang", "n_chars"
    )
    out.write.format("sdg_jsonl_sink").option("path", path).mode("append").save()
    assert os.path.isfile(os.path.join(path, "_SUCCESS"))
    return spark.read.schema("doc_id BIGINT, lang STRING, n_chars BIGINT").json(
        os.path.join(path, "part-*.jsonl")
    )


@register(
    "stream_sink_datasource",
    oracle="""
    SELECT CAST(i AS BIGINT) AS paper_id,
           CAST(i // 100 AS INTEGER) AS page,
           'paper-' || CAST(i AS VARCHAR) AS title,
           CAST((i * 2654435761) % 50 AS INTEGER) AS n_refs
    FROM range(300) t(i)
    """,
)
def stream_sink_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end custom-source → custom-sink streaming: the paginated
    papers stream (page-per-micro-batch) written through the Python
    `DataSourceStreamWriter` JSONL sink — per-batch two-phase commit
    with batchId-derived shard names, so a replayed micro-batch
    overwrites itself (exactly-once OUTPUT on top of at-least-once
    delivery). After the 3-page backlog drains, the committed shards are
    read back with the ordinary JSON scan and hash-checked against the
    same generator SQL the batch scan uses: source → stream → sink →
    scan must be value-identical to the batch pipeline."""
    from sdg_data_catalog_spark.sources.datasource_api import (
        register_jsonl_stream_sink_source,
        register_papers_stream_source,
    )

    register_papers_stream_source(spark)
    register_jsonl_stream_sink_source(spark)
    path = io_dir(sf_dir, "jsonl_stream_sink")
    chk = io_dir(sf_dir, "jsonl_stream_sink_chk")
    q = (
        spark.readStream.format("sdg_papers_stream")
        .option("pages", "3")
        .option("page_size", "100")
        .load()
        .writeStream.format("sdg_jsonl_stream_sink")
        .option("path", path)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.schema(
        "paper_id BIGINT, page INT, title STRING, n_refs INT"
    ).json(os.path.join(path, "batch-*.jsonl"))


@register(
    "scan_multiline_json",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id % 9 = 0
    GROUP BY source
    """,
)
def scan_multiline_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-line JSON scan: one pretty-printed JSON ARRAY per file (the
    API-response/export dump shape) read with `multiLine=true` — the
    format that JSONL's line-per-record scan can NOT split: a multiline
    document must be parsed whole, so Spark parallelizes per FILE, not
    per block. That is exactly why the oracle-visible aggregate is
    derived after the scan: the round-trip proves correctness while the
    docstring records the scale caveat — at 100 TB you shard the export
    into many array files (as this writer does, one per task) or convert
    to JSONL at the edge; a single giant array file is a one-task scan."""
    import json as _json

    path = io_dir(sf_dir, "multiline_json")
    os.makedirs(path, exist_ok=True)
    rows = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 9 == 0)
        .select("doc_id", "source", "n_chars")
    )

    def write_array(it):
        import uuid as _uuid

        batch = [r.asDict() for r in it]
        if batch:
            fname = os.path.join(path, f"part-{_uuid.uuid4().hex}.json")
            with open(fname, "w") as fh:
                _json.dump(batch, fh, indent=1)

    rows.foreachPartition(write_array)
    parsed = (
        spark.read.schema("doc_id BIGINT, source STRING, n_chars BIGINT")
        .option("multiLine", "true")
        .json(path)
    )
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
