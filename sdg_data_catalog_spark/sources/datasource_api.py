"""A real Spark 4 Python DataSource: the paginated-API ingest pattern.

The reference ingests paper metadata by walking a paginated HTTP API
driver-side (papers_download.py: requests in a loop, one page at a time).
The Spark-native formulation is a custom `DataSource` where EACH PAGE IS
AN INPUT PARTITION: the planner fans the page range out across executors,
every task fetches and yields its own page, and downstream operators see
an ordinary DataFrame — predicate pushdown, projection, and joins all
compose. Against a real API the `read()` body would call
`requests.get(...page=p)`; in this offline container it generates the
page deterministically (same ids/titles every run), which keeps the whole
pipeline oracle-checkable while the PLUMBING — registration, schema,
partition planning, per-task iteration — is the genuine Spark 4 API
(`pyspark.sql.datasource`), not a simulation layered on mapInPandas.

Scale shape: partition count == page count, so a 10M-page crawl plans
10M tasks batched by the scheduler; no driver-side loop, no single-task
fetch bottleneck, retries localized to the failing page's task.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Knuth multiplicative hash constant — gives each paper a deterministic
# pseudo-random reference count both Python and the SQL oracle can compute.
_MIX = 2654435761


class PapersDataSource(DataSource):
    """format("sdg_papers"), options: pages (default 10), page_size (100)."""

    @classmethod
    def name(cls) -> str:
        return "sdg_papers"

    def schema(self) -> str:
        return "paper_id BIGINT, page INT, title STRING, n_refs INT"

    def reader(self, schema) -> "PapersReader":
        return PapersReader(self.options)


class PapersReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.pages = int(options.get("pages", "10"))
        self.page_size = int(options.get("page_size", "100"))

    def partitions(self) -> list[InputPartition]:
        # One API page == one input partition == one task.
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition: InputPartition):
        page = partition.value
        for j in range(self.page_size):
            pid = page * self.page_size + j
            yield (pid, page, f"paper-{pid}", (pid * _MIX) % 50)


def make_papers_stream_source():
    """The same paginated API as a STREAMING source (Spark 4
    `SimpleDataSourceStreamReader`): the offset is the next page number,
    each micro-batch ingests exactly one page, and `readBetweenOffsets`
    replays any committed page range deterministically — the
    exactly-once replay contract a failed micro-batch needs. When the
    cursor reaches the configured backlog (`pages`), `read` stops
    advancing the offset, which is how `processAllAvailable()`
    recognizes a drained backlog.

    Both classes are defined AT CALL TIME, on purpose: the engine runs
    the stream reader in a dedicated Python runner process
    (python_streaming_source_runner) that — unlike the batch planner and
    the executor workers — does NOT see addPyFile'd packages, so a
    module-level class pickled by reference dies there with
    ModuleNotFoundError in any session started outside the repo.
    Locally-defined classes are cloudpickled BY VALUE (they close over
    nothing but builtins), which makes the source deployable exactly
    like a lambda. Returns (source_cls, reader_cls)."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class PapersStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options) -> None:
            self.pages = int(options.get("pages", "10"))
            self.page_size = int(options.get("page_size", "100"))

        def initialOffset(self) -> dict:
            return {"page": 0}

        def _rows(self, page: int) -> list:
            return [
                (
                    page * self.page_size + j,
                    page,
                    f"paper-{page * self.page_size + j}",
                    ((page * self.page_size + j) * 2654435761) % 50,
                )
                for j in range(self.page_size)
            ]

        def read(self, start: dict):
            page = int(start["page"])
            if page >= self.pages:
                return iter([]), start
            # a list_iterator, not a generator: the engine's prefetch
            # cache both next()s and copy.copy()s the returned iterator
            # for replay, and generators aren't copyable
            return iter(self._rows(page)), {"page": page + 1}

        def readBetweenOffsets(self, start: dict, end: dict):
            for page in range(int(start["page"]), int(end["page"])):
                yield from self._rows(page)

    class PapersStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "sdg_papers_stream"

        def schema(self) -> str:
            return "paper_id BIGINT, page INT, title STRING, n_refs INT"

        def simpleStreamReader(self, schema) -> "PapersStreamReader":
            return PapersStreamReader(self.options)

    return PapersStreamSource, PapersStreamReader


def register_papers_stream_source(spark) -> None:
    """Idempotent per-session registration of the by-value streaming
    source (no pyfiles shipping needed — see make_papers_stream_source)."""
    source_cls, _ = make_papers_stream_source()
    try:
        spark.dataSource.register(source_cls)
    except Exception:
        pass  # already registered in this session


def register_papers_source(spark) -> None:
    """Idempotent per-session registration. Ships the package zip first:
    the reader class is pickled by reference, so a foreign session's
    workers must be able to `import sdg_data_catalog_spark`."""
    from sdg_data_catalog_spark.catalog import _ensure_pyfiles

    _ensure_pyfiles(spark)
    try:
        spark.dataSource.register(PapersDataSource)
    except Exception:
        pass  # already registered in this session


def make_table_changes_stream_source():
    """Change-data-feed STREAMING source over the atomic versioned store
    (sources/atomic.py) — the Delta-CDF analog built on this repo's own
    table format: each published version is one micro-batch of changes,
    the offset is the next version number, and `readBetweenOffsets`
    recomputes any committed version range deterministically from the
    retained snapshot dirs (exactly-once replay). The reader runs in the
    engine's dedicated Python runner process with NO Spark session, so
    the per-version delta is computed there directly from the snapshot
    parquet via pandas/pyarrow — honest for a CDF reader, which by
    definition reads the table's own log/files, and cheap because a
    version delta is keyed-row work, not corpus work.

    Classes are defined at call time (cloudpickled BY VALUE) for the same
    runner-isolation reason as make_papers_stream_source. Options:
    `root` (atomic store root), `max_version` (backlog end; `read` stops
    advancing there so processAllAvailable() sees a drained stream).
    Emits (version, change_type[added|removed|changed], doc_id, n_chars)
    with the NEW value for added/changed and the OLD value for removed.
    Returns (source_cls, reader_cls)."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class TableChangesStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options) -> None:
            self.root = options["root"]
            self.max_version = int(options.get("max_version", "0"))

        def initialOffset(self) -> dict:
            return {"v": 1}  # first change batch is v0 -> v1

        def _version_df(self, v: int):
            import os

            import pandas as pd

            return pd.read_parquet(
                os.path.join(self.root, "versions", f"v{v:09d}")
            )[["doc_id", "n_chars"]]

        def _changes(self, v: int) -> list:
            old = self._version_df(v - 1).set_index("doc_id")["n_chars"]
            new = self._version_df(v).set_index("doc_id")["n_chars"]
            rows = []
            for k in new.index.difference(old.index):
                rows.append((v, "added", int(k), int(new[k])))
            for k in old.index.difference(new.index):
                rows.append((v, "removed", int(k), int(old[k])))
            both = new.index.intersection(old.index)
            for k in both[new[both] != old[both]]:
                rows.append((v, "changed", int(k), int(new[k])))
            rows.sort(key=lambda r: (r[1], r[2]))
            return rows

        def read(self, start: dict):
            v = start["v"]
            if v > self.max_version:
                return iter([]), start  # backlog drained: offset parks
            return iter(self._changes(v)), {"v": v + 1}

        def readBetweenOffsets(self, start: dict, end: dict):
            rows: list = []
            for v in range(start["v"], end["v"]):
                rows.extend(self._changes(v))
            return iter(rows)

    class TableChangesStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "sdg_table_changes"

        def schema(self) -> str:
            return "version INT, change_type STRING, doc_id BIGINT, n_chars BIGINT"

        def simpleStreamReader(self, schema) -> "TableChangesStreamReader":
            return TableChangesStreamReader(self.options)

    return TableChangesStreamSource, TableChangesStreamReader


def register_table_changes_stream_source(spark) -> None:
    source_cls, _ = make_table_changes_stream_source()
    try:
        spark.dataSource.register(source_cls)
    except Exception:
        pass  # already registered in this session


def make_jsonl_sink_source():
    """Spark 4 Python DataSource WRITER with a real two-phase commit:
    every task streams its rows to a `.tmp` shard and returns the shard
    path in its WriterCommitMessage; only the DRIVER-side `commit()`
    promotes the shards (tmp → final rename, then a `_SUCCESS` manifest
    listing every committed shard), and `abort()` removes the orphans —
    so a failed/aborted job leaves NO visible output and a retried task's
    duplicate tmp (task IDs make shard names unique per attempt) is never
    promoted. This is the task-commit / job-commit split every
    distributed sink needs (the reference's per-row INSERT+commit,
    db_connection.py:68-73, has no such protocol — a crash leaves a
    half-written table). Classes defined at call time → cloudpickled by
    value (runner isolation, same as the stream sources)."""
    import json as _json
    import os as _os
    import uuid as _uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class ShardCommit(WriterCommitMessage):
        tmp_path: str
        n_rows: int

    class JsonlSinkWriter(DataSourceWriter):
        def __init__(self, options) -> None:
            self.path = options["path"]

        def write(self, iterator) -> "ShardCommit":
            _os.makedirs(self.path, exist_ok=True)
            tmp = _os.path.join(self.path, f".shard-{_uuid.uuid4().hex}.tmp")
            n = 0
            with open(tmp, "w") as fh:
                for row in iterator:
                    fh.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            return ShardCommit(tmp_path=tmp, n_rows=n)

        def commit(self, messages) -> None:
            final = []
            for i, m in enumerate(messages):
                dst = _os.path.join(self.path, f"part-{i:05d}.jsonl")
                _os.replace(m.tmp_path, dst)
                final.append({"file": _os.path.basename(dst), "rows": m.n_rows})
            with open(_os.path.join(self.path, "_SUCCESS"), "w") as fh:
                _json.dump({"shards": final}, fh)

        def abort(self, messages) -> None:
            for m in messages:
                try:
                    _os.remove(m.tmp_path)
                except OSError:
                    pass

    class JsonlSinkSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "sdg_jsonl_sink"

        def writer(self, schema, overwrite: bool) -> "JsonlSinkWriter":
            return JsonlSinkWriter(self.options)

    return JsonlSinkSource, JsonlSinkWriter


def register_jsonl_sink_source(spark) -> None:
    source_cls, _ = make_jsonl_sink_source()
    try:
        spark.dataSource.register(source_cls)
    except Exception:
        pass


def make_jsonl_stream_sink_source():
    """Streaming twin of the JSONL sink: a Spark 4
    `DataSourceStreamWriter` whose commit unit is the MICRO-BATCH —
    task shards stage as `.tmp`, `commit(messages, batchId)` promotes
    them to `batch-<id>-part-<i>.jsonl` plus a per-batch manifest, and
    `abort` drops the orphans. Because the final names are derived from
    batchId, a REPLAYED batch (failure before the checkpoint advanced)
    overwrites its own files instead of duplicating them — idempotent
    replay is what turns the engine's at-least-once delivery into
    exactly-once OUTPUT, the same discipline as the foreachBatch
    idempotent upsert but expressed at the sink-API level."""
    import json as _json
    import os as _os
    import uuid as _uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        WriterCommitMessage,
    )

    @dataclass
    class ShardCommit(WriterCommitMessage):
        tmp_path: str
        n_rows: int

    class JsonlStreamWriter(DataSourceStreamWriter):
        def __init__(self, options) -> None:
            self.path = options["path"]

        def write(self, iterator) -> "ShardCommit":
            _os.makedirs(self.path, exist_ok=True)
            tmp = _os.path.join(self.path, f".shard-{_uuid.uuid4().hex}.tmp")
            n = 0
            with open(tmp, "w") as fh:
                for row in iterator:
                    fh.write(_json.dumps(row.asDict()) + "\n")
                    n += 1
            return ShardCommit(tmp_path=tmp, n_rows=n)

        def commit(self, messages, batchId: int) -> None:
            # Replay safety: a retried micro-batch may produce FEWER task
            # shards than the failed attempt; clear every prior
            # batch-<id>-part-*.jsonl before promotion so the replay fully
            # replaces the earlier attempt's output (the reader globs
            # batch-*.jsonl — stale higher-index shards would duplicate rows).
            import glob as _glob

            for stale in _glob.glob(
                _os.path.join(self.path, f"batch-{batchId:05d}-part-*.jsonl")
            ):
                try:
                    _os.remove(stale)
                except OSError:
                    pass
            final = []
            for i, m in enumerate(m for m in messages if m is not None):
                dst = _os.path.join(
                    self.path, f"batch-{batchId:05d}-part-{i:05d}.jsonl"
                )
                _os.replace(m.tmp_path, dst)
                final.append({"file": _os.path.basename(dst), "rows": m.n_rows})
            with open(
                _os.path.join(self.path, f"_batch-{batchId:05d}.json"), "w"
            ) as fh:
                _json.dump({"batch": batchId, "shards": final}, fh)

        def abort(self, messages, batchId: int) -> None:
            for m in (m for m in messages if m is not None):
                try:
                    _os.remove(m.tmp_path)
                except OSError:
                    pass

    class JsonlStreamSinkSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "sdg_jsonl_stream_sink"

        def streamWriter(self, schema, overwrite: bool) -> "JsonlStreamWriter":
            return JsonlStreamWriter(self.options)

    return JsonlStreamSinkSource, JsonlStreamWriter


def register_jsonl_stream_sink_source(spark) -> None:
    source_cls, _ = make_jsonl_stream_sink_source()
    try:
        spark.dataSource.register(source_cls)
    except Exception:
        pass
