"""Round-8 operator batch 11: graph mixing, association strength, and
vocabulary growth.

- ``graph_assortativity`` — Newman's degree assortativity coefficient of
  the part co-purchase graph (the graph_triangle_count edge
  convention): do high-degree nodes attach to other high-degree nodes?
  Positive r = hub-to-hub (social-network-like); negative r =
  hub-to-leaf (web/biology-like). The ONE number that predicts whether
  degree-oriented algorithms (triangle counting, k-core) will see
  balanced or skewed work.
- ``agg_cramers_v`` — Cramér's V (plus the Bergsma bias-corrected
  variant) for the event-type × day-of-week table: the EFFECT SIZE for
  agg_chisq_independence's verdict. A χ² p-value on 10⁸ rows is always
  significant; V says whether the association is worth acting on.
- ``text_heaps_law`` — Heaps'-law growth V(n) ≈ K·n^β of the DEDUP
  3-SHINGLE space over 16 corpus checkpoints: the curve that budgets
  MinHash/LSH sketch sizes, shingle inverted-index partitioning, and
  HLL precision as ingestion scales (the word vocabulary itself is the
  wrong unit here — it saturates almost immediately on any corpus; the
  shingle space is what dedup infrastructure actually stores).

Determinism: assortativity reduces to exact decimal moments over the
edge list; V is derived from the floored-term χ² total (the
agg_chisq_independence convention); Heaps' OLS runs on FLOOR(ln·10⁶)
integer images of exact counts summed exactly over the 16 checkpoints.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DAY_US = 86_400_000_000


@register(
    "graph_assortativity",
    oracle="""
    WITH pe AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_partkey % 4 = 0
    ),
    edges0 AS (
      SELECT DISTINCT a.p AS u, b.p AS v
      FROM pe a JOIN pe b ON a.o = b.o AND a.p < b.p
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS node FROM edges0
            UNION ALL SELECT v AS node FROM edges0)
      GROUP BY node
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
             CAST(SUM(du.d + dv.d) AS HUGEINT) AS s_a,
             CAST(SUM(du.d * du.d + dv.d * dv.d) AS HUGEINT) AS s_b,
             CAST(SUM(du.d * dv.d) AS HUGEINT) AS s_c
      FROM edges0 e
      JOIN deg du ON du.node = e.u
      JOIN deg dv ON dv.node = e.v
    )
    SELECT n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           ROUND((4.0 * CAST(n_edges AS DOUBLE) * CAST(s_c AS DOUBLE)
                  - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE))
                 / (2.0 * CAST(n_edges AS DOUBLE) * CAST(s_b AS DOUBLE)
                    - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)), 6)
             AS assortativity
    FROM m
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity r of the part co-purchase graph — the
    Pearson correlation of endpoint degrees over the symmetrized edge
    set. With A = Σ_E (dᵤ+dᵥ), B = Σ_E (dᵤ²+dᵥ²), C = Σ_E dᵤdᵥ over the
    M undirected edges, the 2M directed pairs give
    r = (2M·2C − A²) / (2M·B − A²) — exact integer/decimal sufficient
    statistics (B and C reach N·d_max², decimal past int64), ONE double
    expression at the end, ROUND 1e-6.

    Plan shape: edge list materializes once (the graph_triangle_count
    lesson — the unfused form re-expanded the lineitem self-join per
    alias); degrees re-aggregate it; the moment pass joins degrees back
    on two hash equi-joins. Nothing broadcast-sized by assumption, no
    per-node windows — survives a 1000× graph."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 4 == 0)
    pe = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = pe.alias("a"), pe.alias("b")
    edges = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)  # degree + moment passes both consume it
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint(eager=True)  # node count + two join sides consume it
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    m = (
        edges.join(du, "u")
        .join(dv, "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.sum((F.col("du") + F.col("dv")).cast("decimal(38,0)")).alias("s_a"),
            F.sum(
                (
                    F.col("du").cast("decimal(18,0)") * F.col("du")
                    + F.col("dv").cast("decimal(18,0)") * F.col("dv")
                ).cast("decimal(38,0)")
            ).alias("s_b"),
            F.sum(
                (F.col("du").cast("decimal(18,0)") * F.col("dv")).cast(
                    "decimal(38,0)"
                )
            ).alias("s_c"),
        )
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    sa = F.col("s_a").cast("double")
    r = (
        4.0 * F.col("n_edges").cast("double") * F.col("s_c").cast("double")
        - sa * sa
    ) / (
        2.0 * F.col("n_edges").cast("double") * F.col("s_b").cast("double")
        - sa * sa
    )
    return m.crossJoin(F.broadcast(n_nodes)).select(
        "n_edges", "n_nodes", F.round(r, 6).alias("assortativity")
    )


@register(
    "agg_cramers_v",
    oracle=f"""
    WITH v AS (
      SELECT event_type,
             CAST((epoch_us(ts) // {_DAY_US}) % 7 AS INTEGER) AS wd
      FROM events
    ),
    cell AS (SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS n_obs
             FROM v GROUP BY event_type, wd),
    rt AS (SELECT event_type, CAST(SUM(n_obs) AS BIGINT) AS r
           FROM cell GROUP BY event_type),
    ct AS (SELECT wd, CAST(SUM(n_obs) AS BIGINT) AS c FROM cell GROUP BY wd),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
                   CAST(COUNT(DISTINCT wd) AS BIGINT) AS nc
            FROM cell),
    chi AS (
      SELECT CAST(SUM(CAST(FLOOR(
               ROUND((cell.n_obs - CAST(rt.r AS DOUBLE) * ct.c / tot.n)
                     * (cell.n_obs - CAST(rt.r AS DOUBLE) * ct.c / tot.n)
                     / (CAST(rt.r AS DOUBLE) * ct.c / tot.n), 6) * 1e6)
               AS BIGINT)) AS DOUBLE) / 1e6 AS chi2
      FROM cell JOIN rt USING (event_type) JOIN ct USING (wd) CROSS JOIN tot
    )
    SELECT t.n, t.nr, t.nc, c.chi2,
           ROUND(sqrt(c.chi2 / (CAST(t.n AS DOUBLE)
                                * (LEAST(t.nr, t.nc) - 1))), 6) AS v,
           ROUND(sqrt(
             GREATEST(c.chi2 / t.n
                      - CAST((t.nr - 1) * (t.nc - 1) AS DOUBLE) / (t.n - 1),
                      0.0)
             / (LEAST(t.nr - CAST((t.nr - 1) * (t.nr - 1) AS DOUBLE)
                             / (t.n - 1),
                      t.nc - CAST((t.nc - 1) * (t.nc - 1) AS DOUBLE)
                             / (t.n - 1)) - 1.0)), 6) AS v_corrected
    FROM tot t CROSS JOIN chi c
    """,
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for the event-type × day-of-week contingency table —
    the effect size behind agg_chisq_independence's verdict:
    V = √(χ²/(N·(min(r,c)−1))), plus the Bergsma-Wicher bias-corrected
    V (φ̃² = max(0, φ² − (r−1)(c−1)/(N−1)) with shrunk r̃, c̃) that stays
    honest on small tables. χ² is the SAME floored-term exact total as
    the independence test (each cell term ROUND 1e-6, the total an
    integer sum of 1e-6 floors — no float association order), so the
    two operators can never disagree about the statistic they share.
    One corpus pass to |types|·7 cells; everything after is cell-table
    arithmetic."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            f"CAST((unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}) % 7 AS INT)"
        ).alias("wd"),
    )
    cell = (
        ev.groupBy("event_type", "wd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
        .localCheckpoint(eager=True)  # four consumers of a tiny table
    )
    rt = cell.groupBy("event_type").agg(F.sum("n_obs").cast("bigint").alias("r"))
    ct = cell.groupBy("wd").agg(F.sum("n_obs").cast("bigint").alias("c"))
    tot = cell.agg(
        F.sum("n_obs").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("nr"),
        F.countDistinct("wd").cast("bigint").alias("nc"),
    )
    exp = F.col("r").cast("double") * F.col("c") / F.col("n")
    term = F.round((F.col("n_obs") - exp) * (F.col("n_obs") - exp) / exp, 6)
    chi = (
        cell.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "wd")
        .crossJoin(F.broadcast(tot))
        .agg(
            (F.sum(F.floor(term * 1e6).cast("bigint")).cast("double") / 1e6).alias(
                "chi2"
            )
        )
    )
    n_d = F.col("n").cast("double")
    phi2 = F.col("chi2") / F.col("n")
    phi2c = F.greatest(
        phi2
        - ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("double") / (F.col("n") - 1),
        F.lit(0.0),
    )
    r_t = F.col("nr") - ((F.col("nr") - 1) * (F.col("nr") - 1)).cast("double") / (
        F.col("n") - 1
    )
    c_t = F.col("nc") - ((F.col("nc") - 1) * (F.col("nc") - 1)).cast("double") / (
        F.col("n") - 1
    )
    return tot.crossJoin(F.broadcast(chi)).select(
        "n",
        "nr",
        "nc",
        "chi2",
        F.round(
            F.sqrt(F.col("chi2") / (n_d * (F.least("nr", "nc") - 1))), 6
        ).alias("v"),
        F.round(F.sqrt(phi2c / (F.least(r_t, c_t) - 1.0)), 6).alias("v_corrected"),
    )


_N_CKPT = 16


@register(
    "text_heaps_law",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
      FROM toks WHERE len(t) >= 3
    ),
    mx AS (SELECT MAX(doc_id) + 1 AS hi FROM documents),
    dt AS (SELECT doc_id, CAST(GREATEST(len(t) - 2, 0) AS BIGINT) AS n_tok
           FROM toks),
    fw AS (SELECT sh AS w, MIN(doc_id) AS first_doc FROM sh GROUP BY sh),
    ck AS (SELECT i AS ckpt, (SELECT hi FROM mx) * i // {_N_CKPT} AS thr
           FROM range(1, {_N_CKPT} + 1) AS r(i)),
    pts AS (
      SELECT ck.ckpt,
             (SELECT CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM dt
              WHERE dt.doc_id < ck.thr) AS cum_tokens,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM fw
              WHERE fw.first_doc < ck.thr) AS cum_vocab
      FROM ck
    ),
    imgs AS (
      SELECT ckpt, cum_tokens, cum_vocab,
             CAST(FLOOR(ln(CAST(cum_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS x,
             CAST(FLOOR(ln(CAST(cum_vocab AS DOUBLE)) * 1e6) AS BIGINT) AS y
      FROM pts WHERE cum_tokens > 0 AND cum_vocab > 0
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM imgs
    )
    SELECT i.ckpt, i.cum_tokens, i.cum_vocab,
           ROUND((CAST(f.m AS DOUBLE) * CAST(f.sxy AS DOUBLE)
                  - CAST(f.sx AS DOUBLE) * f.sy)
                 / (CAST(f.m AS DOUBLE) * CAST(f.sxx AS DOUBLE)
                    - CAST(f.sx AS DOUBLE) * f.sx), 6) AS beta,
           ROUND(exp((CAST(f.sy AS DOUBLE)
                      - (CAST(f.m AS DOUBLE) * CAST(f.sxy AS DOUBLE)
                         - CAST(f.sx AS DOUBLE) * f.sy)
                        / (CAST(f.m AS DOUBLE) * CAST(f.sxx AS DOUBLE)
                           - CAST(f.sx AS DOUBLE) * f.sx) * f.sx)
                     / f.m / 1e6), 6) AS k
    FROM imgs i CROSS JOIN fit f ORDER BY i.ckpt
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(n) ≈ K·n^β of 3-SHINGLE-space growth over 16
    doc-id-ordered corpus checkpoints — n is cumulative shingle
    OCCURRENCES, V the cumulative DISTINCT shingles (the dedup
    convention: operators/dedup.py space-split trigrams). This is the
    curve that budgets MinHash signature stores, LSH band tables, and
    HLL precision as ingestion scales; β drifting toward 1 means ids,
    hashes, or boilerplate churn are flooding the shingle space and the
    dedup index will grow linearly with the corpus.

    Scale shape: per-doc occurrence counts are pure map arithmetic
    (len(tokens)−2 — no explode needed); the shingle→first-doc table is
    the only shuffle, and it is shingle-space-sized, not corpus-sized.
    Checkpoint cumulative counts come from conditional aggregates
    against the 16-row broadcast threshold table — never a prefix
    window over corpus rows. The log-log OLS runs on FLOOR(ln·10⁶)
    images of exact integer counts: 16 int64 points, exact sums, one
    identical closed-form slope/intercept expression per engine
    (the ts_forecast_ols convention)."""
    from sdg_data_catalog_spark.operators.dedup import shingles

    docs = table(spark, sf_dir, "documents")
    hi = docs.agg((F.max("doc_id") + 1).alias("hi"))
    ck = (
        spark.range(1, _N_CKPT + 1)
        .select(F.col("id").alias("ckpt"))
        .crossJoin(F.broadcast(hi))
        .select("ckpt", F.expr(f"hi * ckpt DIV {_N_CKPT}").alias("thr"))
        .localCheckpoint(eager=True)  # 16 rows; broadcast into both probes
    )
    dt = docs.select(
        "doc_id",
        F.greatest(F.size(F.split("text", " ")) - 2, F.lit(0))
        .cast("bigint")
        .alias("n_tok"),
    )
    fw = (
        shingles(docs.select("doc_id", "text"))
        .groupBy(F.col("sh").alias("w"))
        .agg(F.min("doc_id").alias("first_doc"))
    )
    cum_tok = (
        dt.crossJoin(F.broadcast(ck))
        .groupBy("ckpt")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("doc_id") < F.col("thr"), F.col("n_tok"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("cum_tokens")
        )
    )
    cum_voc = (
        fw.crossJoin(F.broadcast(ck))
        .groupBy("ckpt")
        .agg(
            F.sum(F.when(F.col("first_doc") < F.col("thr"), 1).otherwise(0))
            .cast("bigint")
            .alias("cum_vocab")
        )
    )
    pts = cum_tok.join(cum_voc, "ckpt")
    imgs = (
        pts.filter((F.col("cum_tokens") > 0) & (F.col("cum_vocab") > 0))
        .select(
            "ckpt",
            "cum_tokens",
            "cum_vocab",
            F.floor(F.log(F.col("cum_tokens").cast("double")) * 1e6)
            .cast("bigint")
            .alias("x"),
            F.floor(F.log(F.col("cum_vocab").cast("double")) * 1e6)
            .cast("bigint")
            .alias("y"),
        )
        .localCheckpoint(eager=True)  # ≤16 rows; fit + output both consume it
    )
    fit = imgs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(18,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    beta = (
        F.col("m").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("m").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    k = F.exp(
        (F.col("sy").cast("double") - beta * F.col("sx")) / F.col("m") / 1e6
    )
    return (
        imgs.crossJoin(F.broadcast(fit))
        .select(
            "ckpt",
            "cum_tokens",
            "cum_vocab",
            F.round(beta, 6).alias("beta"),
            F.round(k, 6).alias("k"),
        )
        .orderBy("ckpt")
    )
