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
