"""Round-10 operator batch 10: lag-1 Granger-style predictivity, a
partition-layout advisor, PQ distortion audit, and filter-overlap
analysis.

- ``ts_granger_lite`` — does yesterday's series X help predict today's
  series Y beyond Y's own lag? Lag-1 Granger-style F-test in both
  directions between the daily click and purchase counts: exact integer
  sufficient statistics over consecutive-day pairs, closed-form 3- vs
  2-parameter OLS via ONE shared SQL expression string (the identical
  text is F.expr'd on Spark and inlined in the DuckDB oracle, so the
  double arithmetic cannot drift), F surfaced as a FLOOR(10⁶·F) image
  and the 5% verdict decided by integer comparison against the imaged
  critical value.
- ``plan_partition_advisor`` — the layout-planning readout: per source,
  exact row/char masses, the recommended partition count at a 128 MB
  target (integer ceiling DIV), and a skew flag when a source carries
  more than 2× the mean share (integer cross-multiplication — the
  salt-this-key signal).
- ``emb_pq_distortion`` — reconstruction-error audit of the pinned
  flat-PQ codebooks (subspace slices of the first 16 unit vectors, the
  sim_ann_pq_topk contract): per label, the mean quantization
  distortion Σ_s min_j ‖x_s − c_j‖². Per-vector distortion folds the 16
  subspace minima in a fixed sequential order and surfaces as a
  FLOOR(10⁹·d) image; per-label sums are exact int64 — the number that
  says whether PQ is safe for this embedding space.
- ``curation_filter_overlap`` — are the quality gate and the dedup gate
  removing the SAME documents? 2×2 contingency of (quality-fail,
  exact-dup-fingerprint) flags over the plain corpus, with the phi
  coefficient (exact integer MCC algebra) and the Jaccard of the two
  rejection sets as integer images — the filter-redundancy audit a
  curation pipeline runs before re-ordering its stages.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_TARGET_BYTES = 128 * 1024 * 1024
# FLOOR(1e6 * F_crit(1, inf) at 5%) — the imaged critical value 3.841459
_F_CRIT_X1E6 = 3_841_458

# The shared Granger formula: one SQL expression string evaluated on the
# sufficient-statistics row by BOTH engines (identical double arithmetic).
# Columns: n, sy, syl, sxl, syy, syly, sxly, syll, sxll, sylxl (exact ints).
_GRANGER_F_EXPR = """
CAST(FLOOR(1000000 * (
  (
    (CAST(syy AS DOUBLE)
      - (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * syly - CAST(syl AS DOUBLE) * sy)
          / (CAST(n AS DOUBLE) * syll - CAST(syl AS DOUBLE) * syl)) * syl) / n * sy
      - ((CAST(n AS DOUBLE) * syly - CAST(syl AS DOUBLE) * sy)
          / (CAST(n AS DOUBLE) * syll - CAST(syl AS DOUBLE) * syl)) * syly)
    -
    (CAST(syy AS DOUBLE)
      - ((CAST(sy AS DOUBLE) * (CAST(syll AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syly AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxly)
          + CAST(sxl AS DOUBLE) * (CAST(syly AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxly))
         / (CAST(n AS DOUBLE) * (CAST(syll AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxl)
          + CAST(sxl AS DOUBLE) * (CAST(syl AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxl))) * sy
      - ((CAST(n AS DOUBLE) * (CAST(syly AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxly)
          - CAST(sy AS DOUBLE) * (CAST(syl AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxl)
          + CAST(sxl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxly - CAST(syly AS DOUBLE) * sxl))
         / (CAST(n AS DOUBLE) * (CAST(syll AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxl)
          + CAST(sxl AS DOUBLE) * (CAST(syl AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxl))) * syly
      - ((CAST(n AS DOUBLE) * (CAST(syll AS DOUBLE) * sxly - CAST(syly AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxly - CAST(syly AS DOUBLE) * sxl)
          + CAST(sy AS DOUBLE) * (CAST(syl AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxl))
         / (CAST(n AS DOUBLE) * (CAST(syll AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxl)
          + CAST(sxl AS DOUBLE) * (CAST(syl AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxl))) * sxly)
  )
  * (CAST(n AS DOUBLE) - 3)
  /
  (CAST(syy AS DOUBLE)
      - ((CAST(sy AS DOUBLE) * (CAST(syll AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syly AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxly)
          + CAST(sxl AS DOUBLE) * (CAST(syly AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxly))
         / (CAST(n AS DOUBLE) * (CAST(syll AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxl)
          + CAST(sxl AS DOUBLE) * (CAST(syl AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxl))) * sy
      - ((CAST(n AS DOUBLE) * (CAST(syly AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxly)
          - CAST(sy AS DOUBLE) * (CAST(syl AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxl)
          + CAST(sxl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxly - CAST(syly AS DOUBLE) * sxl))
         / (CAST(n AS DOUBLE) * (CAST(syll AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxl)
          + CAST(sxl AS DOUBLE) * (CAST(syl AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxl))) * syly
      - ((CAST(n AS DOUBLE) * (CAST(syll AS DOUBLE) * sxly - CAST(syly AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxly - CAST(syly AS DOUBLE) * sxl)
          + CAST(sy AS DOUBLE) * (CAST(syl AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxl))
         / (CAST(n AS DOUBLE) * (CAST(syll AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sylxl)
          - CAST(syl AS DOUBLE) * (CAST(syl AS DOUBLE) * sxll - CAST(sylxl AS DOUBLE) * sxl)
          + CAST(sxl AS DOUBLE) * (CAST(syl AS DOUBLE) * sylxl - CAST(syll AS DOUBLE) * sxl))) * sxly)
)) AS BIGINT)
"""


def _granger_sums_sql(x_type: str, y_type: str, direction: str) -> str:
    return f"""
    SELECT '{direction}' AS direction,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(yl) AS BIGINT) AS syl,
           CAST(SUM(xl) AS BIGINT) AS sxl,
           CAST(SUM(y * y) AS BIGINT) AS syy,
           CAST(SUM(y * yl) AS BIGINT) AS syly,
           CAST(SUM(y * xl) AS BIGINT) AS sxly,
           CAST(SUM(yl * yl) AS BIGINT) AS syll,
           CAST(SUM(xl * xl) AS BIGINT) AS sxll,
           CAST(SUM(yl * xl) AS BIGINT) AS sylxl
    FROM (
      SELECT c.day,
             c.{y_type} AS y,
             p.{y_type} AS yl,
             p.{x_type} AS xl
      FROM daily c JOIN daily p ON p.day = c.day - 1
    )
    """


@register(
    "ts_granger_lite",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS purchase
        FROM events GROUP BY 1
    ),
    sums AS (
        {_granger_sums_sql('click', 'purchase', 'click->purchase')}
        UNION ALL
        {_granger_sums_sql('purchase', 'click', 'purchase->click')}
    )
    SELECT direction, n, {_GRANGER_F_EXPR} AS f_x1e6,
           {_GRANGER_F_EXPR} > {_F_CRIT_X1E6} AS predictive
    FROM sums ORDER BY direction
    """,
)
def ts_granger_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger-style predictivity between the daily click and
    purchase series, both directions: restricted (own lag only) vs
    unrestricted (own lag + other series' lag) OLS, F = (RSS_r −
    RSS_u)(n−3)/RSS_u. The corpus-sized work is ONE grouped day census;
    the consecutive-day join and the ten sufficient statistics run on
    the bounded daily table, and the entire closed-form solve is ONE
    shared SQL expression string (F.expr here, inlined in the oracle) so
    the double arithmetic is literally the same text on both engines.
    The verdict compares the FLOOR(10⁶·F) image against the imaged
    critical value — an integer comparison that cannot ulp-flip."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.expr(
                "CAST(unix_micros(CAST(ts AS TIMESTAMP))"
                " DIV 86400000000 AS BIGINT)"
            ).alias("day")
        )
        .agg(
            F.sum((F.col("event_type") == "click").cast("bigint"))
            .cast("bigint")
            .alias("click"),
            F.sum((F.col("event_type") == "purchase").cast("bigint"))
            .cast("bigint")
            .alias("purchase"),
        )
        .localCheckpoint(eager=True)
    )
    prev = daily.select(
        (F.col("day") + 1).alias("day"),
        F.col("click").alias("click_l"),
        F.col("purchase").alias("purchase_l"),
    )
    paired = daily.join(prev, "day")
    out = []
    for x, y, direction in (
        ("click", "purchase", "click->purchase"),
        ("purchase", "click", "purchase->click"),
    ):
        sums = paired.select(
            F.col(y).alias("y"),
            F.col(f"{y}_l").alias("yl"),
            F.col(f"{x}_l").alias("xl"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum("yl").cast("bigint").alias("syl"),
            F.sum("xl").cast("bigint").alias("sxl"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
            F.sum(F.col("y") * F.col("yl")).cast("bigint").alias("syly"),
            F.sum(F.col("y") * F.col("xl")).cast("bigint").alias("sxly"),
            F.sum(F.col("yl") * F.col("yl")).cast("bigint").alias("syll"),
            F.sum(F.col("xl") * F.col("xl")).cast("bigint").alias("sxll"),
            F.sum(F.col("yl") * F.col("xl")).cast("bigint").alias("sylxl"),
        )
        out.append(
            sums.select(
                F.lit(direction).alias("direction"),
                "n",
                F.expr(_GRANGER_F_EXPR).alias("f_x1e6"),
                (F.expr(_GRANGER_F_EXPR) > _F_CRIT_X1E6).alias("predictive"),
            )
        )
    return out[0].unionAll(out[1]).orderBy("direction")


@register(
    "plan_partition_advisor",
    oracle=f"""
    WITH per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(total_chars) AS BIGINT) AS all_chars,
               CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM per_source
    )
    SELECT source, n_docs, total_chars,
           CAST((total_chars + {_TARGET_BYTES - 1}) // {_TARGET_BYTES}
                AS BIGINT) AS rec_partitions,
           total_chars * n_sources > 2 * all_chars AS skew_flag
    FROM per_source, tot
    ORDER BY source
    """,
)
def plan_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout advisor per source: exact row/char masses, the
    recommended partition count at a 128 MB target as an integer
    ceiling DIV, and the skew flag source_share > 2× mean share decided
    by integer cross-multiplication (chars·n_sources vs 2·total) — the
    pre-shuffle readout that says which keys need salting and how many
    output files a per-source write should target. One grouped pass;
    everything else runs on the 20-row source table."""
    docs = table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    ).localCheckpoint(eager=True)
    tot = per_source.agg(
        F.sum("total_chars").cast("bigint").alias("all_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.expr(
                f"CAST((total_chars + {_TARGET_BYTES - 1})"
                f" DIV {_TARGET_BYTES} AS BIGINT)"
            ).alias("rec_partitions"),
            (
                F.col("total_chars") * F.col("n_sources")
                > 2 * F.col("all_chars")
            ).alias("skew_flag"),
        )
        .orderBy("source")
    )


def _pq_distortion_oracle() -> str:
    from sdg_data_catalog_spark.queries.ann_pq import _NORM_SQL

    return f"""
    WITH {_NORM_SQL},
    cw AS (SELECT vec_id AS j, emb FROM e WHERE vec_id < 16),
    subsp AS (SELECT unnest(range(0, 16)) AS s),
    sub AS (
      SELECT e.vec_id, sp.s, c.j,
             list_sum(list_transform(range(1, 5),
               d -> (e.emb[sp.s*4 + d] - c.emb[sp.s*4 + d])
                  * (e.emb[sp.s*4 + d] - c.emb[sp.s*4 + d]))) AS d2
      FROM e CROSS JOIN subsp sp CROSS JOIN cw c
    ),
    best AS (
      SELECT vec_id, s, MIN(d2) AS bd2 FROM sub GROUP BY vec_id, s
    ),
    per_vec AS (
      SELECT vec_id,
             CAST(FLOOR(1e9 * list_sum(list(bd2 ORDER BY s))) AS BIGINT)
               AS dist_x1e9
      FROM best GROUP BY vec_id
    )
    SELECT emb.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(per_vec.dist_x1e9) AS BIGINT) AS sum_dist_x1e9,
           CAST(SUM(per_vec.dist_x1e9) // COUNT(*) AS BIGINT)
             AS mean_dist_x1e9
    FROM per_vec JOIN embeddings emb ON emb.vec_id = per_vec.vec_id
    GROUP BY emb.label ORDER BY emb.label
    """


@register("emb_pq_distortion", oracle=_pq_distortion_oracle())
def emb_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-distortion audit of the pinned flat-PQ codebooks:
    per label, the mean reconstruction error Σ_s min_j ‖x_s − c_j‖² of
    the normalized corpus under the sim_ann_pq_topk contract (subspace
    slices of the first 16 unit vectors, 0 Lloyd iterations). Per-vector
    distortion folds the 16 subspace minima in ascending-s sequential
    order inside the Arrow pass (≡ the oracle's list_sum(list ORDER BY
    s)) and leaves the worker as a FLOOR(10⁹·d) image; label sums are
    exact int64. High distortion per label = that region of the space
    needs trained codebooks before PQ-backed ANN can be trusted."""
    import numpy as np
    import pandas as pd

    from sdg_data_catalog_spark.queries.ann_pq import _normalized

    unit = _normalized(spark, sf_dir)
    cw_rows = sorted(
        _normalized(spark, sf_dir, where=F.col("vec_id") < 16).collect(),
        key=lambda r: int(r.vec_id),
    )
    m, k, dsub = 16, 16, 4
    if len(cw_rows) != k:
        raise ValueError("PQ codebook init needs vec_ids 0..15 present")
    books = np.zeros((m, k, dsub), dtype=np.float64)
    for r in cw_rows:
        vec = np.asarray(r.embedding, dtype=np.float64)
        for s in range(m):
            books[s][int(r.vec_id)] = vec[s * dsub : (s + 1) * dsub]

    def dist(batches):
        for pdf in batches:
            out = []
            for vid, emb in zip(pdf["vec_id"], pdf["embedding"]):
                x = np.asarray(emb, dtype=np.float64)
                total = 0.0
                for s in range(m):  # fixed ascending-s sequential fold
                    seg = x[s * dsub : (s + 1) * dsub]
                    diffs = books[s] - seg
                    d2 = (diffs * diffs).sum(axis=1)
                    total += float(d2.min())
                out.append((vid, int(np.floor(1e9 * total))))
            yield pd.DataFrame(out, columns=["vec_id", "dist_x1e9"])

    per_vec = unit.select("vec_id", "embedding").mapInPandas(
        dist, "vec_id BIGINT, dist_x1e9 BIGINT"
    )
    labels = table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        per_vec.join(labels, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("dist_x1e9").cast("bigint").alias("sum_dist_x1e9"),
        )
        .select(
            "label",
            "n_vecs",
            "sum_dist_x1e9",
            F.expr("CAST(sum_dist_x1e9 DIV n_vecs AS BIGINT)").alias(
                "mean_dist_x1e9"
            ),
        )
        .orderBy("label")
    )


@register(
    "curation_filter_overlap",
    oracle="""
    WITH flags AS (
        SELECT doc_id,
               (len(string_split(text, ' ')) < 20
                OR len(list_distinct(string_split(text, ' '))) * 5
                   < len(string_split(text, ' '))) AS q_fail,
               md5(array_to_string(
                   list_sort(list_distinct(string_split(lower(text), ' '))),
                   ' ')) AS fp
        FROM documents
    ),
    fp_census AS (
        SELECT fp, COUNT(*) AS n FROM flags GROUP BY fp
    ),
    flagged AS (
        SELECT f.doc_id, f.q_fail, (c.n > 1) AS dup
        FROM flags f JOIN fp_census c ON c.fp = f.fp
    ),
    cm AS (
        SELECT
          CAST(SUM(CASE WHEN q_fail AND dup THEN 1 ELSE 0 END) AS HUGEINT) AS both_fail,
          CAST(SUM(CASE WHEN q_fail AND NOT dup THEN 1 ELSE 0 END) AS HUGEINT) AS q_only,
          CAST(SUM(CASE WHEN NOT q_fail AND dup THEN 1 ELSE 0 END) AS HUGEINT) AS dup_only,
          CAST(SUM(CASE WHEN NOT q_fail AND NOT dup THEN 1 ELSE 0 END) AS HUGEINT) AS neither
        FROM flagged
    )
    SELECT CAST(both_fail AS BIGINT) AS both_fail,
           CAST(q_only AS BIGINT) AS q_only,
           CAST(dup_only AS BIGINT) AS dup_only,
           CAST(neither AS BIGINT) AS neither,
           ROUND(CAST(both_fail * neither - q_only * dup_only AS DOUBLE)
                 / sqrt(CAST((both_fail + q_only) * (both_fail + dup_only)
                        * (neither + q_only) * (neither + dup_only)
                        AS DOUBLE)), 6) AS phi,
           CAST(CASE WHEN both_fail + q_only + dup_only = 0 THEN 0
                     ELSE 1000000 * both_fail
                          // (both_fail + q_only + dup_only) END AS BIGINT)
             AS overlap_jaccard_x1e6
    FROM cm
    """,
)
def curation_filter_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-redundancy audit: 2×2 contingency of the quality gate
    (the pipeline_curation rule: <20 tokens or <20% unique, written as
    the integer cross-multiplication 5·uniq < total so no ratio can
    ulp-flip) against the exact-duplicate gate (sorted-vocab fingerprint
    shared by >1 doc), plus phi (exact integer MCC algebra, one double
    division) and the Jaccard of the two rejection sets as an integer
    DIV image. One corpus pass builds both flags; the fingerprint census
    is the only shuffle. If phi is high the second filter is paying a
    full corpus pass to remove documents the first already caught."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    q_fail = (F.size(toks) < 20) | (
        F.size(F.array_distinct(toks)) * 5 < F.size(toks)
    )
    fp = F.md5(
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split(F.lower("text"), " ")))
        )
    )
    flags = docs.select(
        "doc_id", q_fail.alias("q_fail"), fp.alias("fp")
    ).localCheckpoint(eager=True)
    census = flags.groupBy("fp").agg(F.count(F.lit(1)).alias("n"))
    flagged = flags.join(census, "fp").select(
        "q_fail", (F.col("n") > 1).alias("dup")
    )
    cm = flagged.agg(
        F.sum((F.col("q_fail") & F.col("dup")).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("both_fail"),
        F.sum((F.col("q_fail") & ~F.col("dup")).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("q_only"),
        F.sum((~F.col("q_fail") & F.col("dup")).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("dup_only"),
        F.sum((~F.col("q_fail") & ~F.col("dup")).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("neither"),
    )
    phi = F.round(
        (
            F.col("both_fail") * F.col("neither")
            - F.col("q_only") * F.col("dup_only")
        ).cast("double")
        / F.sqrt(
            (
                (F.col("both_fail") + F.col("q_only"))
                * (F.col("both_fail") + F.col("dup_only"))
                * (F.col("neither") + F.col("q_only"))
                * (F.col("neither") + F.col("dup_only"))
            ).cast("double")
        ),
        6,
    )
    return cm.select(
        F.col("both_fail").cast("bigint").alias("both_fail"),
        F.col("q_only").cast("bigint").alias("q_only"),
        F.col("dup_only").cast("bigint").alias("dup_only"),
        F.col("neither").cast("bigint").alias("neither"),
        phi.alias("phi"),
        F.expr(
            "CAST(CASE WHEN both_fail + q_only + dup_only = 0 THEN 0"
            " ELSE 1000000 * both_fail"
            " DIV (both_fail + q_only + dup_only) END AS BIGINT)"
        ).alias("overlap_jaccard_x1e6"),
    )
