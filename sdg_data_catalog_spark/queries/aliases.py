"""SURVEY.md §2 exact-ID aliases.

Several operators registered under engine-specific names (the primary name
describes the Spark plan more precisely); this module binds the survey's
operator ID to the same callable + oracle so the driver contract carries
every §2 key verbatim. Mapping rationale per entry:

  scan_sqlite          → scan_pushdown_projection  (§2.1: SQLite catalog scan
                         becomes a parquet scan on owned tables; the pushdown
                         query IS that scan with projection/predicate reaching
                         the reader)
  sink_sqlite          → sink_parquet     (§2.1: per-row INSERT+commit →
                         batched columnar append)
  filter_range         → filter_range_slice   (§2.2 begin/maxlines window)
  join_broadcast_vocab → join_broadcast_dim   (§2.3 dict-lookup join =
                         broadcast hash join against the small vocab dim)
  join_anti_stopwords  → text_stopword_removal (§2.3 token set-minus as
                         exploded LEFT ANTI JOIN)
  join_theta_semi      → join_semi        (§2.3 existence probe = LEFT SEMI)
  topk_partial         → topk_global      (§2.5 np.argpartition top-k =
                         orderBy+limit → TakeOrderedAndProject)
  setop_minus          → setop_except     (§2.7 set difference)
  dedup                → dedup_exact      (§2.7; the full ladder is
                         dedup_exact/_keys/minhash/simhash/jaccard)
  scalar_uuid          → scalar_hash_id   (§2.8: uuid4 replaced by
                         deterministic sha2 ids per SURVEY §7)
  arr_pad              → vectorize_pad    (§2.8 pad-to-256)
  arr_ngram            → text_ngram_bigrams (§2.8 gensim Phrases → NGram +
                         count-threshold)
  json_parse           → json_extract_props (§2.8 ujson.loads / from_json on
                         events.props)
  stream_watermark     → stream_watermark_late (§2.9)
  udf_trie_match       → gazetteer_spans  (§2.10 FastMatch.match pandas_udf;
                         rows-only — span offsets have no SQL oracle)
"""

from __future__ import annotations

from sdg_data_catalog_spark.queries.registry import alias

_ALIASES = {
    "scan_sqlite": "scan_pushdown_projection",
    "sink_sqlite": "sink_parquet",
    "filter_range": "filter_range_slice",
    "join_broadcast_vocab": "join_broadcast_dim",
    "join_anti_stopwords": "text_stopword_removal",
    "join_theta_semi": "join_semi",
    "topk_partial": "topk_global",
    "setop_minus": "setop_except",
    "dedup": "dedup_exact",
    "scalar_uuid": "scalar_hash_id",
    "arr_pad": "vectorize_pad",
    "arr_ngram": "text_ngram_bigrams",
    "json_parse": "json_extract_props",
    "stream_watermark": "stream_watermark_late",
    "udf_trie_match": "gazetteer_spans",
}

for _name, _target in _ALIASES.items():
    alias(_name, _target)
