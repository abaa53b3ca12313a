"""Time-series, mining, privacy, and geo operators (engine-added,
SURVEY.md §2.11 north star).

`ts_resample_locf` / `ts_ewma` give the events table a real time-series
surface (regular grids + exponential smoothing — the hypertable
continuous-view companions to etl_rollup_maintained);
`agg_dp_count` adds the differential-privacy release mechanism a
governed catalog publishes aggregate stats through; `fpm_frequent_pairs`
runs MLlib FP-Growth with an exact SQL oracle over the pair/singleton
slice; `join_geo_radius` is the broadcast-dim theta join for
radius-of-interest tagging; `dedup_containment` closes the dedup ladder
with the asymmetric (subset/superset) measure resemblance-Jaccard
misses. Everything here is hash-checked against DuckDB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.operators import dedup as D
from sdg_data_catalog_spark.queries.registry import register

EWMA_ALPHA = 0.2


@register(
    "ts_resample_locf",
    oracle="""
    WITH obs AS (
        SELECT user_id, date_trunc('hour', ts) AS hr,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                 / (100.0 * COUNT(*)) AS v
        FROM events WHERE user_id % 5 = 0
        GROUP BY user_id, date_trunc('hour', ts)
    ),
    bounds AS (
        SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi FROM obs GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        FROM bounds
    ),
    joined AS (
        SELECT g.user_id, g.hr, o.v
        FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hr = g.hr
    )
    SELECT user_id, hr,
           last_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY hr) AS value,
           v IS NULL AS filled
    FROM joined
    """,
)
def ts_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with last-observation-carried-forward:
    hourly averages per user, densified to every hour between that user's
    first and last observation, gaps filled by the latest earlier value
    (the sensor/metric-pipeline normalization step before any windowed
    model sees the series). The grid explodes from per-user (min, max)
    bounds — sequence() + explode, no driver loop — and the fill is one
    `last(value, ignoreNulls)` running window per user: a single shuffle
    on user_id covers the hourly agg, the grid join, and the fill. The
    `filled` flag keeps imputed points distinguishable downstream."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    # hourly mean via integer-cent sums: FP summation order differs between
    # engines (and between Spark partial-agg schedules), so the mean is
    # derived from an EXACT bigint sum — bit-stable everywhere
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("double")
            / (100.0 * F.count(F.lit(1)))
        ).alias("v")
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    joined = grid.join(obs, ["user_id", "hr"], "left")
    w = Window.partitionBy("user_id").orderBy("hr")
    return joined.select(
        "user_id",
        "hr",
        F.last("v", ignorenulls=True).over(w).alias("value"),
        F.col("v").isNull().alias("filled"),
    )


@register(
    "ts_ewma",
    oracle=f"""
    WITH s AS (
        SELECT user_id,
               COUNT(*) AS n,
               list_reduce(list(value ORDER BY ts, event_id),
                           (acc, x) -> {1 - EWMA_ALPHA} * acc + {EWMA_ALPHA} * x)
                 AS ew
        FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           FLOOR(ew * 1e6) / 1e6 AS ewma
    FROM s
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (α=0.2) of the event
    value stream — the classic smoothed-state feature. EWMA is an
    inherently sequential fold, so it runs as `aggregate()` over the
    time-ordered value array per user: one shuffle to group, the fold is
    codegen'd array arithmetic (no Python, no window-per-row O(n²)).
    Memory is bounded by per-user event cardinality — the same per-key
    state bound every stateful-stream operator carries; for unbounded
    keys the associative segment-decay reformulation (weights
    (1-α)^(n-i) folded map-side) trades exactness of order for
    mergeability. Both engines fold with first-element init in identical
    IEEE order → bit-equal results; floor-truncated at 1e-6 (half-up
    rounding diverges on representation ties)."""
    ev = table(spark, sf_dir, "events")
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s["value"],
    )
    ew = F.aggregate(
        arr,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(
            (1 - EWMA_ALPHA) * acc + EWMA_ALPHA * x
        ),
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.floor(ew * 1e6) / 1e6).alias("ewma"),
    )


@register(
    "agg_dp_count",
    oracle="""
    WITH c AS (
        SELECT event_type, COUNT(*) AS n,
               ((CAST(('0x' || substr(md5(event_type), 1, 8)) AS BIGINT)
                 % 1000000) + 0.5) / 1000000.0 AS u
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           FLOOR((n - CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END
                      * ln(1.0 - 2.0 * abs(u - 0.5))) * 1000) / 1000
             AS noisy_count,
           CAST(1.0 AS DOUBLE) AS epsilon
    FROM c
    """,
)
def agg_dp_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (ε=1 Laplace mechanism) — how
    a governed catalog publishes per-group statistics without exposing
    individual membership (the governance sibling of etl_k_anonymize:
    k-anonymity protects the rows, DP protects the aggregates). Noise is
    Laplace(1/ε) via inverse-CDF over a md5-derived uniform — the
    deterministic-noise trick (seeded per release key) that makes a DP
    release reproducible for audit AND hash-checkable across engines;
    a production release would swap the hash input for a secret per-epoch
    seed. Pure map-side arithmetic after one partial-aggregated count.
    Demo caveat (documented): real DP must not publish the true count —
    only `noisy_count` leaves this operator."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    u = (
        (
            F.conv(F.substring(F.md5("event_type"), 1, 8), 16, 10).cast("long")
            % 1000000
        )
        + 0.5
    ) / 1000000.0
    sign = F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
    noise = -sign * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    return c.select(
        "event_type",
        (F.floor((F.col("n") + noise) * 1000) / 1000).alias("noisy_count"),
        F.lit(1.0).alias("epsilon"),
    )


@register(
    "fpm_frequent_pairs",
    oracle="""
    WITH b AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM b),
    singles AS (
        SELECT CAST(l_suppkey AS VARCHAR) AS itemset, COUNT(*) AS freq
        FROM b GROUP BY l_suppkey
    ),
    pairs AS (
        SELECT CAST(a.l_suppkey AS VARCHAR) || '+' || CAST(c.l_suppkey AS VARCHAR)
                 AS itemset,
               COUNT(*) AS freq
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey
         AND CAST(a.l_suppkey AS VARCHAR) < CAST(c.l_suppkey AS VARCHAR)
        GROUP BY 1
    )
    SELECT itemset, CAST(freq AS BIGINT) AS freq
    FROM (SELECT * FROM singles UNION ALL SELECT * FROM pairs), nb
    WHERE freq >= CEIL(0.002 * n)
    """,
)
def fpm_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent itemsets (size ≤ 2, minSupport=0.002) over supplier
    baskets per order — the co-occurrence miner behind 'frequently
    bought together'. Itemsets surface as '+'.joined string-sorted
    items; the support threshold is ceil(minSupport·n) baskets.

    r15 (guide §1.2 "don't compute things you throw away", measured):
    the former MLlib FP-Growth fit mined the FULL itemset lattice
    (size-3+ conditional trees) only for the declared result to keep the
    size-≤2 slice — the closed form below computes exactly that slice
    with fpm_assoc_rules' machinery: one basket collect_set per order,
    the bounded frequent-item literal pre-filter (Apriori monotonicity —
    an infrequent item cannot appear in any frequent itemset, and basket
    COUNT is taken before pruning so ceil(minSupport·n) is exactly
    unchanged), in-row pair combinatorics over each basket's
    string-sorted survivors (bounded by basket size², no self-join
    shuffle), and map-side-combined counts. 6.69 → 3.30 s min-of-5 at
    sf0.1 (same window); results are exact integer counts, hash-green at
    sf0.001/0.01/0.1, and additionally differential-tested against a
    live MLlib FP-Growth fit in tests/test_r15_fpm_closed_form.py so the
    model-driven formulation stays pinned as the reference."""
    li = table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set(F.col("l_suppkey").cast("string")).alias("all_items")
    )
    # basket table feeds n, the item census, and the pair expansion —
    # persist around them (the fpm_assoc_rules shape; its r14 A/B also
    # showed the broadcast-join pre-filter LOSES here without MLlib's
    # two-pass fit to amortize the extra DISTINCT exchange, so the
    # bounded literal intersect stays)
    baskets = baskets.persist()
    try:
        n_val = baskets.count()
        thresh_val = math.ceil(0.002 * n_val)
        singles = (
            baskets.select(F.explode("all_items").alias("item"))
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("freq"))
            .localCheckpoint(eager=True)  # vocabulary-sized census
        )
        freq_singles = singles.filter(F.col("freq") >= thresh_val)
        # Bounded driver read (≤ avg_basket/minSupport items at any scale)
        flist = sorted(r.item for r in freq_singles.collect())
        fl_arr = (
            F.array(*[F.lit(x) for x in flist])
            if flist
            else F.array(F.lit("\0"))
        )
        items = F.sort_array(F.array_intersect("all_items", fl_arr))
        pair_structs = (
            "flatten(transform(items, (x, i) ->"
            " transform(slice(items, i + 2, size(items)),"
            " y -> concat(x, '+', y))))"
        )
        pairs = (
            baskets.select(items.alias("items"))
            .select(F.explode(F.expr(pair_structs)).alias("itemset"))
            .groupBy("itemset")
            .agg(F.count(F.lit(1)).alias("freq"))
            .filter(F.col("freq") >= thresh_val)
            .localCheckpoint(eager=True)  # result-sized: frequent pairs only
        )
    finally:
        baskets.unpersist()
    return freq_singles.select(
        F.col("item").alias("itemset"), F.col("freq").cast("bigint").alias("freq")
    ).unionByName(
        pairs.select("itemset", F.col("freq").cast("bigint").alias("freq"))
    )


@register(
    "join_geo_radius",
    oracle="""
    WITH cities AS (
        SELECT n_nationkey,
               CAST((n_nationkey * 37) % 120 AS DOUBLE) - 60 + 0.5 AS clat,
               CAST((n_nationkey * 73) % 360 AS DOUBLE) - 180 + 0.5 AS clon
        FROM nation
    ),
    pts AS (
        SELECT c_custkey,
               CAST((c_custkey * 13) % 120 AS DOUBLE) - 60 + 0.25 AS plat,
               CAST((c_custkey * 29) % 360 AS DOUBLE) - 180 + 0.25 AS plon
        FROM customer
    ),
    d AS (
        SELECT n_nationkey, c_custkey,
               2.0 * 6371.0 * asin(sqrt(
                   pow(sin(radians(plat - clat) / 2.0), 2)
                   + cos(radians(clat)) * cos(radians(plat))
                     * pow(sin(radians(plon - clon) / 2.0), 2))) AS km
        FROM cities CROSS JOIN pts
    )
    SELECT n_nationkey,
           CAST(COUNT(CASE WHEN km <= 2000 THEN 1 END) AS BIGINT) AS n_within,
           FLOOR(MIN(km) * 10) / 10 AS nearest_km
    FROM d GROUP BY n_nationkey
    """,
)
def join_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo radius join: tag each city-of-interest (synthetic centers
    derived from nation keys) with the customers whose synthetic
    coordinates fall within 2,000 km, by haversine distance. The dim side
    is tiny (|nation| rows), so the 100 TB plan is the broadcast theta
    join — per-point work is |dim| codegen'd trig comparisons, fully
    map-side, no shuffle of the big side (the same regime as
    join_gazetteer's broadcast bound; a large×large geo join would
    switch to lat/lon grid-cell equi-blocking exactly like the simhash
    pigeonhole). Output is the per-city census + nearest distance —
    bounded by |dim|. Distances floor-truncated at 100 m; both engines
    evaluate the identical haversine expression tree."""
    na = table(spark, sf_dir, "nation")
    cu = table(spark, sf_dir, "customer")
    cities = na.select(
        "n_nationkey",
        ((F.col("n_nationkey") * 37) % 120).cast("double").alias("clat0"),
        ((F.col("n_nationkey") * 73) % 360).cast("double").alias("clon0"),
    ).select(
        "n_nationkey",
        (F.col("clat0") - 60 + 0.5).alias("clat"),
        (F.col("clon0") - 180 + 0.5).alias("clon"),
    )
    pts = cu.select(
        "c_custkey",
        (((F.col("c_custkey") * 13) % 120).cast("double") - 60 + 0.25).alias("plat"),
        (((F.col("c_custkey") * 29) % 360).cast("double") - 180 + 0.25).alias("plon"),
    )
    km = (
        2.0
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("plat") - F.col("clat")) / 2.0), 2)
                + F.cos(F.radians("clat"))
                * F.cos(F.radians("plat"))
                * F.pow(F.sin(F.radians(F.col("plon") - F.col("clon")) / 2.0), 2)
            )
        )
    )
    return (
        pts.join(F.broadcast(cities))
        .select("n_nationkey", km.alias("km"))
        .groupBy("n_nationkey")
        .agg(
            F.count(F.when(F.col("km") <= 2000, 1)).cast("bigint").alias("n_within"),
            (F.floor(F.min("km") * 10) / 10).alias("nearest_km"),
        )
    )


@register(
    "dedup_containment",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(string_split(text, ' ')[1:12], ' ') AS text
        FROM documents WHERE doc_id % 4 = 0
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
        FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(c AS DOUBLE) / sa.n_sh, 6) AS containment_a_in_b,
           ROUND(CAST(c AS DOUBLE) / sb.n_sh, 6) AS containment_b_in_a
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(c AS DOUBLE) / sa.n_sh >= 0.9
       OR CAST(c AS DOUBLE) / sb.n_sh >= 0.9
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment C(A,B) = |S(A)∩S(B)| / |S(A)| — the
    subset/superset detector (Broder's containment, the measure behind
    quote/excerpt/boilerplate-inclusion dedup) that resemblance-Jaccard
    structurally misses: a 12-token excerpt inside a 128-token document
    has tiny Jaccard but containment ≈ 1. The synthetic corpus plants
    12-token prefixes of every 4th document; candidates flow through the
    same inverted shingle index as dedup_jaccard_pairs (equi-join on the
    shingle — never all pairs; the max_df hot-shingle cap applies
    unchanged at scale), sizes join back algebraically, and both
    directions are emitted so either containment orientation can gate."""
    docs = table(spark, sf_dir, "documents")
    prefix = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 12)).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(prefix)
    # NOTE r15: the blocked numpy set-intersection form (the shared
    # jaccard_pairs_blocked kernel, VERDICT item 4) was A/B'd and
    # REJECTED for THIS op: min-of-N at sf0.1 read 2.13 s inverted-index
    # vs 4.63 s blocked at B=16, and the per-block-pair string np.unique
    # cost is linear in B+1 so even the best block count loses (B=4
    # 2.59 s, B=8 3.43 s, B=32 5.01 s — measured 2026-08-18, same
    # window). The planted-prefix corpus is only 1.25× documents and its
    # df² candidate volume stays far below the 2× near-dup corpus where
    # the blocked form wins (2.9 vs 11.7 s) — the equi-join + hot-shingle
    # max_df cap remains the honest scale path here.
    # shingles feed sizes + both join sides — cut lineage or the corpus
    # scan re-expands 8x (audited at sf0.001)
    sh = D.shingles(corpus).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    cab = F.col("c") * 1.0 / F.col("na")
    cba = F.col("c") * 1.0 / F.col("nb")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter((cab >= 0.9) | (cba >= 0.9))
        .select(
            "doc_a",
            "doc_b",
            F.round(cab, 6).alias("containment_a_in_b"),
            F.round(cba, 6).alias("containment_b_in_a"),
        )
    )


@register(
    "graph_bfs_hops",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT DISTINCT l_orderkey AS ord, l_partkey AS part FROM lineitem
    ),
    e AS (
        SELECT DISTINCT a.part AS pa, b.part AS pb
        FROM base a JOIN base b ON a.ord = b.ord AND a.part < b.part
    ),
    src AS (SELECT MIN(pa) AS s FROM e),
    r(node, hop) AS (
        SELECT s, 0 FROM src
        UNION
        SELECT CASE WHEN e.pa = r.node THEN e.pb ELSE e.pa END, r.hop + 1
        FROM r JOIN e ON e.pa = r.node OR e.pb = r.node
        WHERE r.hop < 4
    )
    SELECT node, CAST(MIN(hop) AS INTEGER) AS hop FROM r GROUP BY node
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first reachability (≤4 hops) over the part co-purchase
    graph from its smallest vertex — the Pregel frontier-expansion shape
    every distributed graph traversal reduces to: each round joins ONLY
    the current frontier against the edge table, anti-joins the visited
    set, and localCheckpoints to cut lineage (the dedup_components /
    pagerank iteration discipline). Per-round driver work is one emptiness
    check (a count on the already-shuffled frontier — the documented
    scalar-per-round cost every iterative operator here pays); all
    expansion is distributed equi-joins, never adjacency broadcast. The
    oracle replays the exact search as a recursive CTE with UNION-dedup
    and takes MIN(hop) — Spark's level-synchronous BFS and SQL's
    fixpoint recursion provably agree on hop distances."""
    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("ord"), F.col("l_partkey").alias("part")
    ).distinct()
    a = base.alias("a")
    b = base.alias("b")
    e = (
        a.join(b, (F.col("a.ord") == F.col("b.ord")) & (F.col("a.part") < F.col("b.part")))
        .select(F.col("a.part").alias("pa"), F.col("b.part").alias("pb"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # undirected adjacency: both orientations
    adj = e.unionByName(
        e.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"))
    )
    src = e.agg(F.min("pa")).collect()[0][0]
    if src is None:  # no co-purchase edges at all: empty reachability set
        return spark.createDataFrame([], "node BIGINT, hop INT")
    visited = spark.createDataFrame([(int(src), 0)], "node BIGINT, hop INT")
    frontier = visited
    for hop in range(1, 5):
        nxt = (
            frontier.join(adj, F.col("node") == F.col("pa"))
            .select(F.col("pb").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(hop))
            .localCheckpoint()  # materializes; cuts the per-round lineage
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


@register(
    "etl_surrogate_key",
    oracle="""
    SELECT source,
           CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) AS source_sk,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
    """,
)
def etl_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key assignment for a dimension: dense 1..N keys over the
    distinct source values, ordered by the natural key. This is the
    pattern SURVEY §7 warns about done right: `monotonically_increasing_id`
    is partition-dependent and unstable across shuffles/retries, so keys
    come from `row_number()` over an EXPLICIT total order — reproducible
    on any cluster layout, any retry. The window runs over the distinct
    dimension only (metadata-sized after the aggregate), never the fact
    table; facts then join on the natural key to pick up the surrogate —
    the standard warehouse dim-build."""
    docs = table(spark, sf_dir, "documents")
    dim = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs")).coalesce(1)
    # bounded input (distinct dimension, one partition); partition on the
    # constant physical partition id — no WindowExec warning
    w = Window.partitionBy(F.spark_partition_id()).orderBy("source")
    return dim.select(
        "source",
        F.row_number().over(w).cast("bigint").alias("source_sk"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
    )


@register(
    "text_zipf_slope",
    oracle="""
    WITH wc AS (
        SELECT w, COUNT(*) AS c
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    ),
    ranked AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS r FROM wc
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
           ROUND(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
             AS zipf_slope
    FROM ranked
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the corpus unigram distribution: least-squares
    slope of ln(frequency) against ln(rank) — natural text sits near −1;
    strong deviation flags template/generated or keyword-stuffed corpora
    (the corpus-level sibling of the per-document text_ttr /
    text_char_entropy signals). Word counts shuffle once; the ranked
    regression runs over the types table (vocabulary-sized, not
    corpus-sized) with `regr_slope` — a single-pass algebraic aggregate
    in both engines. Deterministic rank ties via (count desc, word asc),
    assigned with the two-phase `running_total` global rank (range
    partition + broadcast offsets) — the vocabulary outgrows one window
    task long before the corpus stops fitting the cluster (round 7; was
    the repo's last unpartitioned ORDER BY window)."""
    from sdg_data_catalog_spark.operators.curation import running_total

    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # %019d holds 10^18 - cnt only while cnt <= 10^18 (a larger count
    # would go negative and Java Formatter would WIDEN, silently breaking
    # lexicographic == numeric); overflow raises instead of corrupting
    key = F.when(
        F.col("c") <= F.lit(10**18),
        F.format_string("%019d:%s", F.lit(10**18) - F.col("c"), F.col("w")),
    ).otherwise(F.raise_error(F.lit("count > 1e18 overflows the %019d rank key")))
    ranked = running_total(
        wc.withColumn("__key", key), "__key", F.lit(1), "r"
    ).select("c", "r")
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.round(
            F.expr("regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(r AS DOUBLE)))"), 4
        ).alias("zipf_slope"),
    )


@register(
    "agg_hourly_seasonality",
    oracle="""
    SELECT CAST(isodow(ts) - 1 AS INTEGER) AS dow,
           CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * COUNT(*)) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: event volume and mean value per
    (day-of-week × hour-of-day) cell — the 7×24 fingerprint behind
    anomaly baselines and traffic-aware sampling (dq_anomaly_days'
    z-screen needs exactly this matrix as its expected-volume prior).
    One partial-aggregated shuffle into at most 168 groups regardless of
    corpus size; means come from exact integer-cent sums (the
    ts_resample_locf determinism discipline). Day-of-week is pinned to
    ISO Monday=0 on BOTH engines — Spark's dayofweek() (Sunday=1) vs
    DuckDB's dow (Sunday=0) is a classic silent-off-by-one, avoided via
    weekday()/isodow."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.weekday("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("double")
            / (100.0 * F.count(F.lit(1)))
        ).alias("avg_value"),
    )


@register(
    "ts_autocorr_lag1",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS c,
               LAG(CAST(ROUND(value * 100) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pc
        FROM events
    ),
    p AS (SELECT user_id, c, pc FROM s WHERE pc IS NOT NULL),
    m AS (
        SELECT user_id,
               COUNT(*) AS n,
               SUM(c) AS sc, SUM(pc) AS spc,
               SUM(c * pc) AS scp,
               SUM(c * c) AS scc, SUM(pc * pc) AS spp
        FROM p GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           FLOOR((n * scp - sc * spc)
                 / sqrt(CAST(n * scc - sc * sc AS DOUBLE)
                        * CAST(n * spp - spc * spc AS DOUBLE)) * 1e6) / 1e6
             AS autocorr_lag1
    FROM m
    WHERE (n * scc - sc * sc) > 0 AND (n * spp - spc * spc) > 0
    """,
)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value stream — the
    persistence/momentum signal that separates trending metrics from
    white noise (and the stationarity pre-check before any forecasting
    model touches the series). Pearson r over (xₜ, xₜ₋₁) pairs from one
    LAG window per user; every moment is an EXACT integer sum over
    cent-scaled values (products ≤1e10 fit bigint comfortably), so the
    only floating-point step is the final normalized division —
    floor-truncated, bit-stable across engines regardless of summation
    order. Degenerate (zero-variance) series are excluded identically
    on both sides."""
    from pyspark.sql.window import Window as W

    ev = table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100).cast("bigint")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select("user_id", c.alias("c"), F.lag(c).over(w).alias("pc")).filter(
        F.col("pc").isNotNull()
    )
    m = s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum("pc").alias("spc"),
        F.sum(F.col("c") * F.col("pc")).alias("scp"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
        F.sum(F.col("pc") * F.col("pc")).alias("spp"),
    )
    var_x = F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")
    var_y = F.col("n") * F.col("spp") - F.col("spc") * F.col("spc")
    r = (F.col("n") * F.col("scp") - F.col("sc") * F.col("spc")) / F.sqrt(
        var_x.cast("double") * var_y.cast("double")
    )
    return m.filter((var_x > 0) & (var_y > 0)).select(
        "user_id",
        F.col("n").cast("bigint").alias("n_pairs"),
        (F.floor(r * 1e6) / 1e6).alias("autocorr_lag1"),
    )


@register(
    "graph_degree_distribution",
    oracle="""
    WITH base AS (
        SELECT DISTINCT l_orderkey AS ord, l_partkey AS part FROM lineitem
    ),
    e AS (
        SELECT DISTINCT a.part AS pa, b.part AS pb
        FROM base a JOIN base b ON a.ord = b.ord AND a.part < b.part
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT pa AS node FROM e UNION ALL SELECT pb AS node FROM e
        ) GROUP BY node
    )
    SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY d
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the part co-purchase graph — the first
    diagnostic on any graph workload: a heavy power-law tail predicts
    exactly the hub-skew that degree-oriented wedge joins
    (graph_triangle_count) and hot-key salting exist to defuse, so this
    census is what decides those strategies' thresholds. Two exact
    count aggregations over the edge list (node degrees, then the
    degree histogram — second agg runs over the already-reduced nodes
    table); output cardinality is |distinct degrees|, metadata-sized at
    any scale."""
    li = table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_orderkey").alias("ord"), F.col("l_partkey").alias("part")
    ).distinct()
    a, b = base.alias("a"), base.alias("b")
    e = (
        a.join(b, (F.col("a.ord") == F.col("b.ord")) & (F.col("a.part") < F.col("b.part")))
        .select(F.col("a.part").alias("pa"), F.col("b.part").alias("pb"))
        .distinct()
        # the node union consumes the edge list twice — materialize once
        # (graph_triangle_count template) instead of re-running the wedge
        # self-join per branch (audited 4 lineitem scans)
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("pa").alias("node")).unionAll(
        e.select(F.col("pb").alias("node"))
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    return deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
