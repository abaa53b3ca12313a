"""Round-13 batch 1: column-level cross-engine reconciliation and the
winnowing rung of the dedup ladder.

- ``dq_column_checksums`` — the drill-down ``dq_table_checksum`` hands an
  operator when a table fingerprint mismatches: per (table, column), the
  null count and an order-invariant checksum of the column alone (the
  same null-safe coalesce-to-chr(1) + 32-bit-md5-prefix mod 1e9+7 idiom,
  surfaced as BIGINT). A replication diff that moves one column's values
  flips exactly that column's row, so the blast radius of a divergence
  is localized without re-scanning with ad-hoc queries. One scan per
  table computes every column's pair of aggregates (a single agg node —
  no per-column scans), then a stack() unpivot to rows; at any scale the
  shuffle is one row per table.

- ``dedup_winnowing_pairs`` — MOSS winnowing fingerprints (Schleimer,
  Wilkerson & Aiken, SIGMOD 2003): window-minimum k-gram hashes with a
  POSITIONAL guarantee (any shared run of >= k+w-1 tokens shares a
  fingerprint), candidate pairs via a df-capped fingerprint-bucket join —
  the deterministic-recall sibling of the MinHash band join.

Reference analog: none direct — SURVEY §2.11 north-star surface
(cross-engine reconciliation, extending the round-12/13 fingerprint op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_P = 1_000_000_007

# Every table the parent fingerprint (dq_table_checksum) covers, same
# column sets — the drill-down must be able to localize a divergence in
# ANY table the fingerprint can flag, lineitem (the largest, most
# divergence-prone) included.
_COLSETS = (
    ("orders", ("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus")),
    ("customer", ("c_custkey", "c_mktsegment", "c_nationkey")),
    ("lineitem", ("l_linenumber", "l_orderkey", "l_partkey", "l_returnflag")),
)


def _col_oracle(tbl: str, col: str) -> str:
    return f"""
    SELECT CAST('{tbl}' AS VARCHAR) AS tbl, CAST('{col}' AS VARCHAR) AS col_name,
           CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(SUM(CAST(CAST(('0x' || substr(md5(
             coalesce(CAST({col} AS VARCHAR), chr(1))), 1, 8))
             AS BIGINT) % {_P} AS DECIMAL(38,0))) % {_P} AS BIGINT) AS checksum
    FROM {tbl}"""


@register(
    "dq_column_checksums",
    oracle=" UNION ALL ".join(
        _col_oracle(t, c) for t, cols in _COLSETS for c in cols
    )
    + " ORDER BY tbl, col_name",
)
def dq_column_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null counts and order-invariant checksums for the
    audited tables — see module docstring. The hash input is the single
    column coalesced to chr(1) (null-safe, byte-identical across
    engines); the per-row 32-bit md5 prefix is reduced mod 1e9+7, summed
    exactly in a DECIMAL(38,0) carrier, and reduced again to a BIGINT.
    One agg computes all 2·n_cols aggregates in a single table scan;
    stack() unpivots the 1-row result to (col_name, n_nulls, checksum)
    rows driver-light."""

    from sdg_data_catalog_spark.queries.round12_batch2 import _row_hash

    def colsums(df: DataFrame, tbl: str, cols) -> DataFrame:
        aggs = []
        for c in cols:
            # single-column case of the table fingerprint's _row_hash
            # (concat_ws of one arg is the arg): ONE implementation of
            # the cross-engine canonicalization idiom, not two that can
            # drift
            h = _row_hash(c)
            aggs.append(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"n__{c}")
            )
            aggs.append((F.sum(h) % _P).cast("bigint").alias(f"h__{c}"))
        ag = df.agg(*aggs)
        stack_args = ", ".join(f"'{c}', n__{c}, h__{c}" for c in cols)
        return ag.selectExpr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, checksum)"
        ).select(F.lit(tbl).alias("tbl"), "col_name", "n_nulls", "checksum")

    parts = [
        colsums(table(spark, sf_dir, tbl), tbl, cols) for tbl, cols in _COLSETS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl", "col_name")


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the
# MOSS algorithm): the dedup-ladder rung between exact fingerprints and
# MinHash. Each document contributes the MINIMUM k-gram hash of every
# w-hash sliding window (then distinct) — the guarantee is positional:
# any shared token run of length >= k + w - 1 yields at least one shared
# fingerprint, so candidate recall over long overlapping spans is exact,
# not probabilistic like MinHash bands. Candidate generation is a
# fingerprint-bucket join (never all-pairs), with a document-frequency
# cap dropping boilerplate fingerprints the way the LSH path caps hot
# bands.
# ---------------------------------------------------------------------------

_WIN_K = 4   # tokens per gram
_WIN_W = 5   # hashes per winnowing window
_WIN_CAP = 50          # fingerprint document-frequency cap (boilerplate)
_WIN_MIN_SHARED = 2    # candidate threshold


@register(
    "dedup_winnowing_pairs",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               substr(text, strpos(text, ' ') + 1) AS text FROM documents
    ),
    tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM corpus),
    hs AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {_WIN_K} THEN
                 list_transform(range(1, len(t) - {_WIN_K} + 2),
                   i -> CAST(('0x' || substr(md5(
                     array_to_string(t[i:i+{_WIN_K}-1], ' ')), 1, 8)) AS BIGINT))
               ELSE [] END AS h
        FROM tk
    ),
    fps AS (
        SELECT doc_id,
               CASE WHEN len(h) >= {_WIN_W} THEN
                 list_distinct(list_transform(range(1, len(h) - {_WIN_W} + 2),
                   j -> list_min(h[j:j+{_WIN_W}-1])))
               WHEN len(h) >= 1 THEN [list_min(h)]
               ELSE [] END AS fps
        FROM hs
    ),
    fp AS (SELECT DISTINCT doc_id, unnest(fps) AS fp FROM fps),
    rare AS (SELECT fp FROM (SELECT fp, COUNT(DISTINCT doc_id) AS df
                             FROM fp GROUP BY fp)
             WHERE df <= {_WIN_CAP}),
    fpr AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare r ON f.fp = r.fp)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING COUNT(*) >= {_WIN_MIN_SHARED}
    ORDER BY doc_a, doc_b
    """,
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup candidate pairs over the planted near-dup
    corpus (orig + first-token-dropped copy, the ladder's shared
    fixture): per doc the distinct window-minimum 32-bit k-gram hashes
    (k=4 tokens, w=5 windows — any shared run of >= 8 tokens MUST share
    a fingerprint: the winnowing guarantee, which MinHash can only offer
    probabilistically), then pairs sharing >= 2 rare fingerprints via a
    fingerprint-bucket join. Plan shape for 100 TB: the k-gram hash array
    is staged as a COLUMN so each md5 is computed once (inlining it in
    the window lambda would re-evaluate the whole array per window —
    O(n²) md5s per doc); fingerprints ~ 2n/(w+1) per doc explode into a
    (doc, fp) relation; the df cap kills boilerplate hot buckets exactly
    like the LSH band cap; the pair join is bucket-local and never
    materializes non-candidate pairs. All integers — hash-certifiable.

    The md5-prefix gram hash exists to match the DuckDB oracle
    byte-for-byte; it is ~5x the cost of a native hash at scale. The
    production twin `dedup_winnowing_fast` (round14_batch1.py) runs the
    SAME plan via `_winnow_pairs` with JVM-native xxhash64 grams."""
    return _winnow_pairs(
        spark,
        sf_dir,
        lambda gram: (
            f"cast(conv(substr(md5({gram}), 1, 8), 16, 10) as bigint)"
        ),
    )


def _winnow_pairs(spark: SparkSession, sf_dir: str, gram_hash) -> DataFrame:
    """The one winnowing implementation, parameterized ONLY by the
    gram-hash SQL (``gram_hash`` maps a gram string expr to a BIGINT hash
    expr) so the certified-oracle path and the production-hash twin
    cannot drift in plan shape, guards, cap, or threshold."""
    docs = table(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionByName(
        docs.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
        )
    )
    t = "split(lower(text), ' ')"
    gram = f"array_join(slice({t}, i, {_WIN_K}), ' ')"
    h_expr = (
        f"CASE WHEN size({t}) >= {_WIN_K} THEN"
        f" transform(sequence(1, size({t}) - {_WIN_K} + 1),"
        f" i -> {gram_hash(gram)})"
        f" ELSE array() END"
    )
    fps_expr = (
        f"CASE WHEN size(h) >= {_WIN_W} THEN"
        f" array_distinct(transform(sequence(1, size(h) - {_WIN_W} + 1),"
        f" j -> array_min(slice(h, j, {_WIN_W}))))"
        f" WHEN size(h) >= 1 THEN array(array_min(h))"
        f" ELSE array() END"
    )
    # (doc_id, fp) is referenced FOUR times downstream (df census + cap
    # join + both pair-join sides): materialize it once or the corpus
    # scan AND the per-gram md5 array re-expand 4x (the plan scan gate
    # caught exactly this — 8 documents scans before the checkpoint).
    # r14 A/B'd and REJECTED, both at the 100× replica vs 48.3 s here:
    # (a) df cap as count(*)-over-fp window on the raw explode (no
    # distinct, no census join): 65.3 s — WindowExec's sort + per-group
    # buffering of the occurrence-sized relation costs more than the
    # hash-agg census + join; (b) no-distinct + count(*) census + eager
    # checkpoint of the capped relation: 54.8 s — the extra serial
    # materialization barrier outweighs the removed distinct exchange
    # (ReuseExchange already absorbs the twice-instantiated census).
    # The .distinct() also pre-shuffles by (doc_id, fp) which AQE reuses.
    fp = (
        corpus.select("doc_id", F.expr(h_expr).alias("h"))
        .select("doc_id", F.explode(F.expr(fps_expr)).alias("fp"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rare = (
        fp.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") <= _WIN_CAP)
        .select("fp")
    )
    fpr = fp.join(rare, "fp")
    a = fpr.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fpr.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
        .orderBy("doc_a", "doc_b")
    )
