"""Round-10 operator batch 9: ANN recall certification, Adamic-Adar
link prediction, moving-average crossovers, and image tile contrast.

- ``sim_ann_recall_eval`` — recall@5 of the production LSH-bucketed ANN
  path against the brute-force exact ranking, per query vector (the
  fixed 10-query panel sim_knn_bruteforce uses). Both rankings come
  from the ladder's own scoring conventions, so bucket assignment,
  candidate generation, and the fold-exact cosine all sit inside the
  hash check. At 100 TB the truth side runs on a query sample — the
  exact shape here.
- ``graph_adamic_adar`` — link prediction over the part co-purchase
  graph: for non-adjacent pairs with common neighbors, AA(a,b) =
  Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z), surfaced as FLOOR(10⁹/ln deg)
  integer images summed exactly. Wedges enumerate through the common
  neighbor z with a degree cap (hubs contribute ≤1/ln(cap) each and
  quadratic wedge volume — the standard AA hub cut, applied identically
  on both engines), so per-z fan-out is bounded at any scale.
- ``win_sma_crossover`` — 5-day vs 20-day simple-moving-average
  crossover days on the daily order-revenue series: both SMAs as
  RANGE-free integer window sums over the bounded daily census, signal
  = sign flip between consecutive days, each crossover dated and
  directed. The trading-signal window shape on exact integer micros.
- ``mm_tile_contrast`` — image quality census through the REAL PNG
  path: decode payloads (self-contained codec), 8×8 tile grid over the
  integer grayscale (r+g+b) DIV 3, per-tile max−min contrast, per-image
  mean/max. The closed-form pixel formula lets the oracle replay every
  tile bit-for-bit — codec round-trip, tiling, and reduction are all
  inside the checked path.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_AA_DEG_CAP = 64
_TILE = 8
_IMG_SIDE = 24


def _ann_recall_oracle() -> str:
    from sdg_data_catalog_spark.queries.dedup_similarity import _COS_SQL
    from sdg_data_catalog_spark.operators import similarity as S

    bucket = (
        "("
        + " + ".join(
            f"CASE WHEN {_plane_dot_sql(j)} > 0 THEN {1 << j} ELSE 0 END"
            for j in range(S.N_PLANES)
        )
        + ")::BIGINT"
    )
    return f"""
    WITH wb AS (
        SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket
          FROM wb WHERE vec_id < 10),
    brute AS (
        SELECT q_id, neighbor_id FROM (
            SELECT q.q_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id
                       ORDER BY {_COS_SQL.replace('c_emb', 'c.embedding')} DESC,
                                c.vec_id ASC) AS rank
            FROM q CROSS JOIN wb c WHERE c.vec_id <> q.q_id
        ) WHERE rank <= 5
    ),
    approx AS (
        SELECT q_id, neighbor_id FROM (
            SELECT q.q_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id
                       ORDER BY {_COS_SQL.replace('c_emb', 'c.embedding')} DESC,
                                c.vec_id ASC) AS rank
            FROM q JOIN wb c ON c.bucket = q.bucket AND c.vec_id <> q.q_id
        ) WHERE rank <= 5
    )
    SELECT b.q_id,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(1000000 * SUM(CASE WHEN a.neighbor_id IS NOT NULL
                                   THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT)
             AS recall_x1e6
    FROM brute b
    LEFT JOIN approx a
      ON a.q_id = b.q_id AND a.neighbor_id = b.neighbor_id
    GROUP BY b.q_id ORDER BY b.q_id
    """


def _plane_dot_sql(j: int) -> str:
    c = 17 * (j + 1)
    return (
        f"list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE)"
        f" * ((((i + {c}) * 2654435761) % 1000003 % 97 - 48) / 48.0)))"
    )


@register("sim_ann_recall_eval", oracle=_ann_recall_oracle())
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH-bucketed ANN candidates against brute-force
    exact cosine for the fixed 10-query panel — the certification run
    an ANN deployment repeats whenever data or hash planes change.
    Truth side: 10 queries × corpus (bounded by the query panel, the
    honest way to afford exactness at scale); approx side: the same
    panel joined through the production bucket assignment
    (operators/similarity.py). Both rankings use the ladder's fold-
    exact cosine and (cos DESC, id ASC) tie-break; recall is an exact
    integer DIV image per query."""
    from sdg_data_catalog_spark.operators import similarity as S

    emb = table(spark, sf_dir, "embeddings")
    wb = emb.select(
        "vec_id",
        "embedding",
        S.lsh_bucket(F.col("embedding")).alias("bucket"),
    ).localCheckpoint(eager=True)
    q = wb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cos = S.cosine(F.col("q_emb"), F.col("embedding"))
    rank_w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    brute = (
        q.crossJoin(wb.select("vec_id", "embedding"))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= 5)
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
    )
    approx = (
        q.join(
            wb.select("vec_id", "embedding", "bucket"),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select("q_id", "vec_id", cos.alias("cos"))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= 5)
        .select(F.col("q_id").alias("a_qid"), F.col("vec_id").alias("hit_id"))
    )
    return (
        brute.join(
            approx,
            (F.col("q_id") == F.col("a_qid"))
            & (F.col("neighbor_id") == F.col("hit_id")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_true"),
            F.sum(F.col("hit_id").isNotNull().cast("bigint"))
            .cast("bigint")
            .alias("n_hits"),
        )
        .select(
            "q_id",
            "n_true",
            "n_hits",
            F.expr("CAST(1000000 * n_hits DIV n_true AS BIGINT)").alias(
                "recall_x1e6"
            ),
        )
        .orderBy("q_id")
    )


@register(
    "graph_adamic_adar",
    oracle=f"""
    WITH base AS (
        SELECT DISTINCT l_orderkey AS ord, l_partkey AS part FROM lineitem
    ),
    e AS (
        SELECT DISTINCT a.part AS pa, b.part AS pb
        FROM base a JOIN base b ON a.ord = b.ord AND a.part < b.part
    ),
    nbr AS (
        SELECT pa AS node, pb AS nb FROM e
        UNION ALL SELECT pb, pa FROM e
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM nbr GROUP BY node
    ),
    kept AS (
        SELECT nbr.node, nbr.nb,
               CAST(FLOOR(1e9 / ln(CAST(deg.d AS DOUBLE))) AS BIGINT) AS w
        FROM nbr JOIN deg ON deg.node = nbr.node
        WHERE deg.d BETWEEN 2 AND {_AA_DEG_CAP}
    ),
    wedges AS (
        SELECT a.nb AS pa, b.nb AS pb, CAST(SUM(a.w) AS BIGINT) AS aa_x1e9,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM kept a JOIN kept b
          ON a.node = b.node AND a.nb < b.nb
        GROUP BY a.nb, b.nb
    ),
    pred AS (
        SELECT w.pa, w.pb, w.n_common, w.aa_x1e9
        FROM wedges w
        LEFT JOIN e ON e.pa = w.pa AND e.pb = w.pb
        WHERE e.pa IS NULL
    )
    SELECT pa, pb, n_common, aa_x1e9
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY aa_x1e9 DESC, pa, pb) AS rk
        FROM pred
    ) WHERE rk <= 20
    ORDER BY aa_x1e9 DESC, pa, pb
    """,
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 Adamic-Adar link predictions over the part co-purchase
    graph: wedges enumerate through the common neighbor z (per-z weight
    FLOOR(10⁹/ln deg z) — exact integer sums), with the standard AA hub
    cut: z with deg > 64 are dropped IDENTICALLY on both
    engines (each would contribute ≤ 1/ln(cap) per wedge while
    generating deg² wedge volume — the quadratic hot-key this cap
    defuses at scale). Existing edges are anti-joined out; the top-20
    rank runs on the bounded prediction table via TakeOrdered. The edge
    list is checkpointed once and feeds neighbors/degrees/anti-join
    without re-expanding the lineitem scan."""
    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("ord"), F.col("l_partkey").alias("part")
    ).distinct()
    a, b = base.alias("a"), base.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.ord") == F.col("b.ord"))
            & (F.col("a.part") < F.col("b.part")),
        )
        .select(F.col("a.part").alias("pa"), F.col("b.part").alias("pb"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nbr = e.select(F.col("pa").alias("node"), F.col("pb").alias("nb")).unionAll(
        e.select(F.col("pb").alias("node"), F.col("pa").alias("nb"))
    )
    deg = nbr.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    kept = (
        nbr.join(deg, "node")
        .filter((F.col("d") >= 2) & (F.col("d") <= _AA_DEG_CAP))
        .select(
            "node",
            "nb",
            F.floor(1e9 / F.log(F.col("d").cast("double")))
            .cast("bigint")
            .alias("w"),
        )
    )
    ka, kb = kept.alias("ka"), kept.alias("kb")
    wedges = (
        ka.join(
            kb,
            (F.col("ka.node") == F.col("kb.node"))
            & (F.col("ka.nb") < F.col("kb.nb")),
        )
        .groupBy(F.col("ka.nb").alias("pa"), F.col("kb.nb").alias("pb"))
        .agg(
            F.sum("ka.w").cast("bigint").alias("aa_x1e9"),
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
        )
    )
    pred = wedges.join(e, ["pa", "pb"], "left_anti")
    return (
        pred.orderBy(F.col("aa_x1e9").desc(), "pa", "pb")
        .limit(20)
        .select("pa", "pb", "n_common", "aa_x1e9")
    )


@register(
    "win_sma_crossover",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    sma AS (
        SELECT day, rev,
               CAST(SUM(rev) OVER (ORDER BY day
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS s5,
               CAST(COUNT(*) OVER (ORDER BY day
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n5,
               CAST(SUM(rev) OVER (ORDER BY day
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS s20,
               CAST(COUNT(*) OVER (ORDER BY day
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n20
        FROM daily
    ),
    sig AS (
        SELECT day,
               CASE WHEN s5 * n20 > s20 * n5 THEN 1
                    WHEN s5 * n20 < s20 * n5 THEN -1 ELSE 0 END AS side,
               LAG(CASE WHEN s5 * n20 > s20 * n5 THEN 1
                        WHEN s5 * n20 < s20 * n5 THEN -1 ELSE 0 END)
                 OVER (ORDER BY day) AS prev_side
        FROM sma
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CASE WHEN side > prev_side THEN 'golden' ELSE 'death' END
             AS crossover
    FROM sig
    WHERE prev_side IS NOT NULL AND side <> 0 AND prev_side <> 0
          AND side <> prev_side
    ORDER BY day
    """,
)
def win_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden/death-cross days of the daily order-revenue series: 5-day
    vs 20-day SMA compared WITHOUT division (s5·n20 vs s20·n5 on exact
    integer cent sums — an SMA comparison that cannot ulp-flip), signal
    flips dated by one LAG over the daily census. The corpus-sized work
    is one grouped day census; every window runs on the bounded daily
    table (one ordered pass — at production scale this series is
    thousands of rows regardless of corpus size, so the single-partition
    window over it is metadata-sized by construction)."""
    orders = table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("rev")
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    w5 = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(-4, 0)
    )
    w20 = (
        Window.partitionBy(F.spark_partition_id())
        .orderBy("day")
        .rowsBetween(-19, 0)
    )
    sma = daily.select(
        "day",
        F.sum("rev").over(w5).cast("bigint").alias("s5"),
        F.count(F.lit(1)).over(w5).cast("bigint").alias("n5"),
        F.sum("rev").over(w20).cast("bigint").alias("s20"),
        F.count(F.lit(1)).over(w20).cast("bigint").alias("n20"),
    )
    side = (
        F.when(F.col("s5") * F.col("n20") > F.col("s20") * F.col("n5"), 1)
        .when(F.col("s5") * F.col("n20") < F.col("s20") * F.col("n5"), -1)
        .otherwise(0)
    )
    lag_w = Window.partitionBy(F.spark_partition_id()).orderBy("day")
    sig = sma.select(
        "day",
        side.alias("side"),
        F.lag(side).over(lag_w).alias("prev_side"),
    )
    return (
        sig.filter(
            F.col("prev_side").isNotNull()
            & (F.col("side") != 0)
            & (F.col("prev_side") != 0)
            & (F.col("side") != F.col("prev_side"))
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.when(F.col("side") > F.col("prev_side"), "golden")
            .otherwise("death")
            .alias("crossover"),
        )
        .orderBy("day")
    )


@register(
    "mm_tile_contrast",
    oracle=f"""
    WITH px AS (
        SELECT doc_id, x, y,
               ((x * 255 // {_IMG_SIDE - 1} + doc_id * 37) % 256
                + (y * 255 // {_IMG_SIDE - 1} + doc_id * 11) % 256
                + ((x + y) * 255 // {2 * _IMG_SIDE - 2} + doc_id * 53) % 256)
               // 3 AS gray,
               (y // {_TILE}) * {_IMG_SIDE // _TILE} + (x // {_TILE}) AS tile
        FROM (SELECT doc_id,
                     unnest(generate_series(0, {_IMG_SIDE - 1})) AS x
              FROM documents),
             (SELECT unnest(generate_series(0, {_IMG_SIDE - 1})) AS y)
    ),
    tiles AS (
        SELECT doc_id, tile,
               MAX(gray) - MIN(gray) AS contrast
        FROM px GROUP BY doc_id, tile
    )
    SELECT doc_id AS media_id,
           CAST(COUNT(*) AS INTEGER) AS n_tiles,
           CAST(SUM(contrast) // COUNT(*) AS INTEGER) AS mean_contrast,
           CAST(MAX(contrast) AS INTEGER) AS max_contrast
    FROM tiles GROUP BY doc_id ORDER BY media_id
    """,
)
def mm_tile_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image tile-contrast census through the REAL PNG path: build
    payloads (as_png_media), decode them back (self-contained codec),
    grid the integer grayscale (r+g+b) DIV 3 into 8×8 tiles, reduce each
    tile to max−min, and report per image the tile count, integer mean
    contrast (sum DIV n), and max — the blur/flat-region detector of an
    image-quality pipeline. Every number is an exact small integer, so
    the closed-form pixel oracle replays the codec round-trip, tiling,
    and reduction bit-for-bit inside the hash check. Only 4 ints per
    image leave the workers."""
    import pandas as pd

    from sdg_data_catalog_spark.operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").select("doc_id")
    media = MM.as_png_media(docs, side=_IMG_SIDE)

    def tiles(batches):
        import numpy as np

        from sdg_data_catalog_spark.operators.imagecodec import png_decode

        for pdf in batches:
            rows = {
                k: []
                for k in ("media_id", "n_tiles", "mean_contrast", "max_contrast")
            }
            nt = _IMG_SIDE // _TILE
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = png_decode(bytes(payload)).astype(np.int64)
                gray = (img[:, :, 0] + img[:, :, 1] + img[:, :, 2]) // 3
                # r14 (guide §4.2): one reshape + two vectorized reductions
                # replace the 64-iteration Python tile loop — identical
                # exact integers (same tiles, same max−min)
                t = gray.reshape(nt, _TILE, nt, _TILE).transpose(0, 2, 1, 3)
                t = t.reshape(nt * nt, _TILE * _TILE)
                contrasts = t.max(axis=1) - t.min(axis=1)
                rows["media_id"].append(mid)
                rows["n_tiles"].append(int(contrasts.size))
                rows["mean_contrast"].append(
                    int(contrasts.sum()) // int(contrasts.size)
                )
                rows["max_contrast"].append(int(contrasts.max()))
            yield pd.DataFrame(rows)

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_tiles", IntegerType()),
            StructField("mean_contrast", IntegerType()),
            StructField("max_contrast", IntegerType()),
        ]
    )
    return media.select("media_id", "payload").mapInPandas(tiles, schema).orderBy(
        "media_id"
    )
