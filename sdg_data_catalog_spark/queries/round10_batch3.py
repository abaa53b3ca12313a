"""Round-10 operator batch 3: k-way ranking, count smoothing, late-
interaction retrieval, and pairwise BLEU.

- ``rank_plackett_luce`` — Plackett-Luce strength fitting from 3-way
  ranking observations (the k-way generalization of Bradley-Terry;
  Hunter 2004 MM): rankings aggregate to a bounded ordered-triple
  census, then 3 unrolled MM rounds run on that table. The model behind
  listwise preference data (RLHF rankings, ads auctions, race results).
- ``agg_good_turing`` — Turing-estimate adjusted counts r* =
  (r+1)·f(r+1)/f(r) and the unseen-probability mass P₀ = f₁/N per
  language, from the word frequency-of-frequencies — the smoothing
  arithmetic under Katz/Good-Turing LMs and the companion readout to
  agg_chao1_richness.
- ``sim_maxsim_late_interaction`` — ColBERT-style MaxSim scoring:
  score(q, d) = Σ_{t∈q} max_{w∈d} ⟨e(t), e(w)⟩ with deterministic
  integer token embeddings, computed as (vocab × query-token) dot
  products joined onto the corpus — the late-interaction retrieval
  shape where per-token similarity stays a bounded word-level table and
  documents never meet each other.
- ``eval_bleu_pairs`` — corpus-sample BLEU-2 between adjacent documents
  (candidate d vs reference d+1): clipped n-gram precision for n=1,2 +
  brevity penalty. The n-gram clip is a per-gram MIN of two exact
  counts; only the final geometric mean passes through one FLOOR(·10⁶)
  image of exp/ln on exact integer ratios.

Determinism: rankings/embeddings are md5-derived integers; every MM
denominator and MaxSim dot product is exact integer math; BLEU's
transcendental step follows the established integer-image discipline.
Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_N_MODELS = 6
_PL_ITERS = 3


def _md5_mod_sql(expr: str, mod: int) -> str:
    return (
        f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) % {mod}"
    )


# Each event yields a 3-way ranking among models (g1, g2, g3) (distinct
# triples only). The observed order ranks by an md5 draw plus a strength
# bias (higher model id stronger), so the fitted PL strengths have ground
# truth. Scores are exact integers s = draw%1000 + 601*model, compared
# through the unique key k = s*8 + (5-model) — (s DESC, model ASC) order
# with no possible key collision, so the 3-way sort is in-row CASE math
# (no per-event window), deterministic on both engines.
_PL_RANK_SQL = f"""
    ev AS (
      SELECT event_id,
             event_id % {_N_MODELS} AS g1,
             (event_id // {_N_MODELS}) % {_N_MODELS} AS g2,
             (event_id // {_N_MODELS * _N_MODELS}) % {_N_MODELS} AS g3
      FROM events
      WHERE event_id % {_N_MODELS}
            <> (event_id // {_N_MODELS}) % {_N_MODELS}
        AND event_id % {_N_MODELS}
            <> (event_id // {_N_MODELS * _N_MODELS}) % {_N_MODELS}
        AND (event_id // {_N_MODELS}) % {_N_MODELS}
            <> (event_id // {_N_MODELS * _N_MODELS}) % {_N_MODELS}
    ),
    scored AS (
      SELECT event_id, g1, g2, g3,
             (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':pl:' || CAST(g1 AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 + 601 * g1) * 8 + (5 - g1) AS k1,
             (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':pl:' || CAST(g2 AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 + 601 * g2) * 8 + (5 - g2) AS k2,
             (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':pl:' || CAST(g3 AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 + 601 * g3) * 8 + (5 - g3) AS k3
      FROM ev
    ),
    ranked AS (
      -- in-row 3-way sort on unique integer keys (key%8 = 5-model, so no
      -- two of the three keys can collide): no per-event window, one pass
      SELECT CASE WHEN k1 >= k2 AND k1 >= k3 THEN g1
                  WHEN k2 >= k3 THEN g2 ELSE g3 END AS first,
             CASE WHEN k1 <= k2 AND k1 <= k3 THEN g1
                  WHEN k2 <= k3 THEN g2 ELSE g3 END AS third,
             g1 + g2 + g3
               - (CASE WHEN k1 >= k2 AND k1 >= k3 THEN g1
                       WHEN k2 >= k3 THEN g2 ELSE g3 END)
               - (CASE WHEN k1 <= k2 AND k1 <= k3 THEN g1
                       WHEN k2 <= k3 THEN g2 ELSE g3 END) AS second
      FROM scored
    ),
    triples AS (
      SELECT first, second, third, CAST(COUNT(*) AS BIGINT) AS n
      FROM ranked GROUP BY first, second, third
    )
"""


def _pl_iter_sql(it: int, prev: str, nxt: str) -> str:
    """One Hunter-MM round: γ'_i = W_i / D_i where W_i = #times i was
    chosen at any stage and D_i sums, over every (group, stage) whose
    choice set contains i, the FLOOR(1e9/Σγ(set)) integer image of the
    inverse set mass — exact-integer accumulation on both engines."""
    return f"""
    d{it} AS (
      SELECT model, CAST(SUM(t) AS BIGINT) AS den, CAST(SUM(w) AS BIGINT) AS wins
      FROM (
        -- stage 1: choice set {{first, second, third}}
        SELECT m.model,
               tr.n * FLOOR(1e9 / (ga.g + gb.g + gc.g)) AS t,
               CASE WHEN m.model = tr.first THEN tr.n ELSE 0 END AS w
        FROM triples tr
        JOIN {prev} ga ON ga.model = tr.first
        JOIN {prev} gb ON gb.model = tr.second
        JOIN {prev} gc ON gc.model = tr.third
        JOIN {prev} m ON m.model IN (tr.first, tr.second, tr.third)
        UNION ALL
        -- stage 2: choice set {{second, third}}
        SELECT m.model,
               tr.n * FLOOR(1e9 / (gb.g + gc.g)) AS t,
               CASE WHEN m.model = tr.second THEN tr.n ELSE 0 END AS w
        FROM triples tr
        JOIN {prev} gb ON gb.model = tr.second
        JOIN {prev} gc ON gc.model = tr.third
        JOIN {prev} m ON m.model IN (tr.second, tr.third)
      ) GROUP BY model
    ),
    {nxt} AS (
      SELECT p.model,
             CASE WHEN d{it}.den > 0
                  THEN CAST(d{it}.wins AS DOUBLE) * 1e9 / d{it}.den
                  ELSE p.g END AS g
      FROM {prev} p LEFT JOIN d{it} ON d{it}.model = p.model
    )
"""


@register(
    "rank_plackett_luce",
    oracle=f"""
    WITH {_PL_RANK_SQL},
    g0(model, g) AS (VALUES {", ".join(f"({i}, 1.0)" for i in range(_N_MODELS))}),
    {",".join(_pl_iter_sql(i, f"g{i}", f"g{i + 1}").strip() for i in range(_PL_ITERS))}
    SELECT f.model,
           CAST(FLOOR(1e6 * f.g) AS BIGINT) AS strength_x1e6,
           CAST(1 + (SELECT COUNT(*) FROM g{_PL_ITERS} o
                     WHERE FLOOR(1e6 * o.g) > FLOOR(1e6 * f.g)
                        OR (FLOOR(1e6 * o.g) = FLOOR(1e6 * f.g)
                            AND o.model < f.model)) AS BIGINT) AS rank
    FROM g{_PL_ITERS} f ORDER BY f.model
    """,
)
def rank_plackett_luce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plackett-Luce strengths from 3-way rankings via 3 unrolled
    Hunter-2004 MM rounds. The corpus-sized work is ONE scan that
    derives each event's ranking IN-ROW (md5 draw + strength bias →
    unique integer sort keys; a 3-way CASE sort, not a per-event window —
    a million 3-row window partitions measured 120 s at sf0.1, the
    in-row form ~2 s) and aggregates to the
    ≤ 6·5·4-row ordered-triple census; every MM round then joins that
    bounded table against the 6-row strength relation (broadcast). Each
    denominator term enters as n·FLOOR(1e9/Σγ) — an exact integer — so
    every γ iterate is a deterministic function of exact integers on
    both engines, and ranks compare FLOOR(1e6·γ) images with a model-id
    tie-break. Generalizes rank_bradley_terry to listwise data (RLHF
    ranking batches, race results)."""
    ev = table(spark, sf_dir, "events").select("event_id")
    g1 = (F.col("event_id") % _N_MODELS).alias("g1")
    g2 = (F.expr(f"event_id div {_N_MODELS}") % _N_MODELS).alias("g2")
    g3 = (F.expr(f"event_id div {_N_MODELS * _N_MODELS}") % _N_MODELS).alias("g3")
    ev3 = (
        ev.select("event_id", g1, g2, g3)
        .filter(
            (F.col("g1") != F.col("g2"))
            & (F.col("g1") != F.col("g3"))
            & (F.col("g2") != F.col("g3"))
        )
    )

    def key(m):
        draw = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("event_id").cast("string"),
                            F.lit(":pl:"),
                            m.cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000
        )
        return (draw + 601 * m) * 8 + (5 - m)

    scored = ev3.select(
        "g1",
        "g2",
        "g3",
        key(F.col("g1")).alias("k1"),
        key(F.col("g2")).alias("k2"),
        key(F.col("g3")).alias("k3"),
    )
    first = (
        F.when(
            (F.col("k1") >= F.col("k2")) & (F.col("k1") >= F.col("k3")), F.col("g1")
        )
        .when(F.col("k2") >= F.col("k3"), F.col("g2"))
        .otherwise(F.col("g3"))
    )
    third = (
        F.when(
            (F.col("k1") <= F.col("k2")) & (F.col("k1") <= F.col("k3")), F.col("g1")
        )
        .when(F.col("k2") <= F.col("k3"), F.col("g2"))
        .otherwise(F.col("g3"))
    )
    ranked = scored.select(
        first.alias("first"),
        third.alias("third"),
        (F.col("g1") + F.col("g2") + F.col("g3") - first - third).alias("second"),
    )
    triples = (
        ranked.groupBy("first", "second", "third")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)  # ≤120 rows; reused per MM round
    )
    g = spark.range(_N_MODELS).select(
        F.col("id").alias("model"), F.lit(1.0).alias("g")
    )
    for _ in range(_PL_ITERS):
        ga = g.select(F.col("model").alias("first"), F.col("g").alias("g_a"))
        gb = g.select(F.col("model").alias("second"), F.col("g").alias("g_b"))
        gc = g.select(F.col("model").alias("third"), F.col("g").alias("g_c"))
        j = (
            triples.join(F.broadcast(ga), "first")
            .join(F.broadcast(gb), "second")
            .join(F.broadcast(gc), "third")
        )
        s1 = F.col("n") * F.floor(1e9 / (F.col("g_a") + F.col("g_b") + F.col("g_c")))
        s2 = F.col("n") * F.floor(1e9 / (F.col("g_b") + F.col("g_c")))
        parts = []
        for member, term, win_slot in (
            ("first", s1, "first"),
            ("second", s1, None),
            ("third", s1, None),
            ("second", s2, "second"),
            ("third", s2, None),
        ):
            w = F.col("n") if win_slot == member and win_slot else F.lit(0)
            # stage-1 rows: wins only for 'first'; stage-2: only 'second'
            if member == "first":
                w = F.col("n")
            elif member == "second" and term is s2:
                w = F.col("n")
            else:
                w = F.lit(0)
            parts.append(
                j.select(
                    F.col(member).alias("model"),
                    term.alias("t"),
                    w.cast("bigint").alias("w"),
                )
            )
        stacked = parts[0]
        for p in parts[1:]:
            stacked = stacked.unionAll(p)
        d = stacked.groupBy("model").agg(
            F.sum("t").cast("bigint").alias("den"),
            F.sum("w").cast("bigint").alias("wins"),
        )
        g = (
            g.join(F.broadcast(d), "model", "left")
            .select(
                "model",
                F.when(
                    F.coalesce(F.col("den"), F.lit(0)) > 0,
                    F.col("wins").cast("double") * 1e9 / F.col("den"),
                )
                .otherwise(F.col("g"))
                .alias("g"),
            )
            # 6-row lineage cut: without it each MM round's plan embeds the
            # previous rounds' full DAG and Catalyst analysis goes
            # super-linear (measured ~120 s for 3 rounds even at sf0.001)
            .localCheckpoint()
        )
    final = g.select(
        "model", F.floor(1e6 * F.col("g")).cast("bigint").alias("strength_x1e6")
    )
    o = final.select(
        F.col("model").alias("o_model"), F.col("strength_x1e6").alias("o_s")
    )
    return (
        final.join(
            F.broadcast(o),
            (F.col("o_s") > F.col("strength_x1e6"))
            | (
                (F.col("o_s") == F.col("strength_x1e6"))
                & (F.col("o_model") < F.col("model"))
            ),
            "left",
        )
        .groupBy("model", "strength_x1e6")
        .agg((1 + F.count("o_model")).cast("bigint").alias("rank"))
        .orderBy("model")
    )


@register(
    "agg_good_turing",
    oracle="""
    WITH wc AS (
        SELECT lang, w, COUNT(*) AS c
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY lang, w
    ),
    fof AS (
        SELECT lang, c AS r, CAST(COUNT(*) AS BIGINT) AS f_r
        FROM wc GROUP BY lang, c
    ),
    tot AS (
        SELECT lang, CAST(SUM(r * f_r) AS BIGINT) AS n_tokens FROM fof
        GROUP BY lang
    )
    SELECT a.lang, CAST(a.r AS BIGINT) AS r, a.f_r,
           COALESCE(b.f_r, 0) AS f_r1,
           CAST(FLOOR(1e6 * (a.r + 1) * COALESCE(b.f_r, 0)
                      / CAST(a.f_r AS DOUBLE)) AS BIGINT) AS rstar_x1e6,
           CAST(FLOOR(1e6 * COALESCE((SELECT CAST(f_r AS DOUBLE) FROM fof s
                                      WHERE s.lang = a.lang AND s.r = 1), 0)
                      / t.n_tokens) AS BIGINT) AS p0_x1e6
    FROM fof a
    LEFT JOIN fof b ON b.lang = a.lang AND b.r = a.r + 1
    JOIN tot t ON t.lang = a.lang
    WHERE a.r <= 5
    ORDER BY a.lang, r
    """,
)
def agg_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turing-estimate adjusted counts per language: for each raw count
    r ≤ 5, r* = (r+1)·f(r+1)/f(r) from the word frequency-of-frequencies
    (the arithmetic under Good-Turing/Katz smoothing: low raw counts are
    systematically overestimates, and f-ratios say by how much), plus
    the unseen mass P₀ = f₁/N on every row. All inputs are exact
    integers; r* and P₀ surface as FLOOR(·10⁶) images of single
    divisions. Two partial-agg shuffles, bounded output
    (langs × 5 rows) — companion to agg_chao1_richness (how MUCH is
    unseen) and lm_kneser_ney_score (which spends the mass)."""
    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fof = (
        wc.groupBy("lang", F.col("c").alias("r"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("f_r"))
        .localCheckpoint(eager=False)  # ≤ langs × max_count rows; reused 3×
    )
    tot = fof.groupBy("lang").agg(
        F.sum(F.col("r") * F.col("f_r")).cast("bigint").alias("n_tokens")
    )
    f1 = fof.filter(F.col("r") == 1).select(
        "lang", F.col("f_r").alias("f_one")
    )
    nxt = fof.select(
        "lang", (F.col("r") - 1).alias("r"), F.col("f_r").alias("f_r1")
    )
    return (
        fof.filter(F.col("r") <= 5)
        .join(nxt, ["lang", "r"], "left")
        .join(F.broadcast(tot), "lang")
        .join(F.broadcast(f1), "lang", "left")
        .select(
            "lang",
            F.col("r").cast("bigint").alias("r"),
            "f_r",
            F.coalesce(F.col("f_r1"), F.lit(0)).cast("bigint").alias("f_r1"),
            F.floor(
                1e6
                * (F.col("r") + 1)
                * F.coalesce(F.col("f_r1"), F.lit(0))
                / F.col("f_r").cast("double")
            )
            .cast("bigint")
            .alias("rstar_x1e6"),
            F.floor(
                1e6
                * F.coalesce(F.col("f_one"), F.lit(0)).cast("double")
                / F.col("n_tokens")
            )
            .cast("bigint")
            .alias("p0_x1e6"),
        )
        .orderBy("lang", "r")
    )


_MAXSIM_DIM = 8
_MAXSIM_QUERIES = {
    0: ("data", "query", "filter", "join"),
    1: ("stream", "window", "batch", "merge"),
    2: ("customer", "order", "table", "scan"),
}
_MAXSIM_TOPK = 10


def _emb_sql(word_expr: str, k: int) -> str:
    return (
        f"(CAST(('0x' || substr(md5({word_expr} || ':e{k}'), 1, 15)) AS BIGINT)"
        f" % 1000 - 500)"
    )


@register(
    "sim_maxsim_late_interaction",
    oracle=f"""
    WITH qt(qid, t) AS (VALUES {", ".join(f"({q}, '{t}')" for q, ts in _MAXSIM_QUERIES.items() for t in ts)}),
    vocab AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    ws AS (  -- word-level dot products: |vocab| x 12 bounded table
      SELECT qt.qid, qt.t, vocab.w,
             {" + ".join(f"{_emb_sql('qt.t', k)} * {_emb_sql('vocab.w', k)}" for k in range(_MAXSIM_DIM))}
               AS dot
      FROM qt CROSS JOIN vocab
    ),
    dw AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    per_qt AS (  -- MaxSim inner max: best doc token per query token
      SELECT dw.doc_id, ws.qid, ws.t, MAX(ws.dot) AS best
      FROM dw JOIN ws ON ws.w = dw.w
      GROUP BY dw.doc_id, ws.qid, ws.t
    ),
    score AS (
      SELECT doc_id, qid, CAST(SUM(best) AS BIGINT) AS maxsim
      FROM per_qt GROUP BY doc_id, qid
    )
    SELECT qid, doc_id, maxsim
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY maxsim DESC, doc_id) AS rn
          FROM score)
    WHERE rn <= {_MAXSIM_TOPK}
    ORDER BY qid, maxsim DESC, doc_id
    """,
)
def sim_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020
    MaxSim): score(q, d) = Σ_{t∈q} max_{w∈d} ⟨e(t), e(w)⟩ with
    deterministic 8-dim integer token embeddings (md5-derived, so dot
    products are EXACT integers on both engines). The scale shape is the
    point: token-pair similarity is materialized once as a
    (vocab × query-tokens) word-level table — bounded by VOCABULARY, not
    corpus — then one equi-join on the word carries it to documents; the
    inner max and outer sum are partial-agg-friendly groupBys, and
    documents never pair with documents. Top-10 per query with a doc-id
    tie-break."""
    docs = table(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        [(q, t) for q, ts in _MAXSIM_QUERIES.items() for t in ts],
        "qid int, t string",
    )
    vocab = docs.select(
        F.explode(F.split("text", " ")).alias("w")
    ).distinct()

    def emb(col, k):
        return (
            F.conv(
                F.substring(F.md5(F.concat(col, F.lit(f":e{k}"))), 1, 15), 16, 10
            ).cast("bigint")
            % 1000
            - 500
        )

    dot = None
    for k in range(_MAXSIM_DIM):
        term = emb(F.col("t"), k) * emb(F.col("w"), k)
        dot = term if dot is None else dot + term
    ws = F.broadcast(qt).crossJoin(vocab).select("qid", "t", "w", dot.alias("dot"))
    dw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).distinct()
    per_qt = (
        dw.join(ws, "w")
        .groupBy("doc_id", "qid", "t")
        .agg(F.max("dot").alias("best"))
    )
    score = per_qt.groupBy("doc_id", "qid").agg(
        F.sum("best").cast("bigint").alias("maxsim")
    )
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.col("maxsim").desc(), "doc_id")
    )
    return (
        score.withColumn("rn", rn)
        .filter(F.col("rn") <= _MAXSIM_TOPK)
        .select("qid", "doc_id", "maxsim")
        .orderBy("qid", F.col("maxsim").desc(), "doc_id")
    )


@register(
    "eval_bleu_pairs",
    oracle="""
    WITH pairs AS (
        SELECT c.doc_id,
               c.text AS cand, r.text AS ref
        FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
        WHERE c.doc_id % 10 = 0
    ),
    grams AS (
        SELECT doc_id, n, g, side, COUNT(*) AS c FROM (
          SELECT doc_id, 1 AS n, unnest(string_split(cand, ' ')) AS g,
                 'c' AS side FROM pairs
          UNION ALL
          SELECT doc_id, 1, unnest(string_split(ref, ' ')), 'r' FROM pairs
          UNION ALL
          SELECT doc_id, 2,
                 unnest(list_transform(
                     generate_series(1, len(string_split(cand, ' ')) - 1),
                     i -> array_to_string(string_split(cand, ' ')[i:i+1], ' '))),
                 'c'
          FROM pairs
          UNION ALL
          SELECT doc_id, 2,
                 unnest(list_transform(
                     generate_series(1, len(string_split(ref, ' ')) - 1),
                     i -> array_to_string(string_split(ref, ' ')[i:i+1], ' '))),
                 'r'
          FROM pairs
        ) GROUP BY doc_id, n, g, side
    ),
    piv AS (
        SELECT doc_id, n, g,
               SUM(CASE WHEN side = 'c' THEN c ELSE 0 END) AS cc,
               SUM(CASE WHEN side = 'r' THEN c ELSE 0 END) AS rc
        FROM grams GROUP BY doc_id, n, g
    ),
    prec AS (
        SELECT doc_id, n,
               CAST(SUM(LEAST(cc, rc)) AS BIGINT) AS clipped,
               CAST(SUM(cc) AS BIGINT) AS total
        FROM piv GROUP BY doc_id, n
    ),
    lens AS (
        SELECT doc_id,
               len(string_split(cand, ' ')) AS clen,
               len(string_split(ref, ' ')) AS rlen
        FROM pairs
    )
    SELECT p1.doc_id,
           p1.clipped AS match1, p1.total AS total1,
           p2.clipped AS match2, p2.total AS total2,
           CAST(FLOOR(1e6 *
             CASE WHEN p1.clipped = 0 OR p2.clipped = 0 THEN 0.0
                  ELSE exp(LEAST(0.0, 1.0 - CAST(l.rlen AS DOUBLE) / l.clen)
                           + 0.5 * (ln(CAST(p1.clipped AS DOUBLE) / p1.total)
                                  + ln(CAST(p2.clipped AS DOUBLE) / p2.total)))
             END) AS BIGINT) AS bleu2_x1e6
    FROM prec p1
    JOIN prec p2 ON p2.doc_id = p1.doc_id AND p2.n = 2
    JOIN lens l ON l.doc_id = p1.doc_id
    WHERE p1.n = 1
    ORDER BY p1.doc_id
    """,
)
def eval_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 between adjacent documents (candidate d, reference d+1;
    every 10th doc as the fixed sample rule) — the n-gram-overlap
    machine-translation/paraphrase metric, built from the engine's
    shingle primitives: per-doc 1/2-gram counts, per-gram CLIPPED match
    = min(cand count, ref count), brevity penalty, geometric mean. All
    counts are exact integers; the one transcendental step (exp of
    ln-precisions + BP) runs on exact integer ratios and surfaces as a
    FLOOR(·10⁶) image. Work shape: in-row gram explode → one
    partial-agg shuffle keyed by (doc, n, gram) → doc-grain rollup; the
    candidate/reference join is a shifted self-join on doc_id (co-
    partitioned, no fan-out)."""
    docs = table(spark, sf_dir, "documents")
    cand = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.col("text").alias("cand")
    )
    ref = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("ref")
    )
    pairs = cand.join(ref, "doc_id").localCheckpoint(eager=False)

    sides = []
    for src_col, side in (("cand", "c"), ("ref", "r")):
        uni = pairs.select(
            "doc_id",
            F.lit(1).alias("n"),
            F.explode(F.split(src_col, " ")).alias("g"),
            F.lit(side).alias("side"),
        )
        bi = pairs.select(
            "doc_id",
            F.lit(2).alias("n"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(split({src_col}, ' ')) - 1),"
                    f" i -> concat_ws(' ', slice(split({src_col}, ' '), i, 2)))"
                )
            ).alias("g"),
            F.lit(side).alias("side"),
        )
        sides.extend([uni, bi])
    grams = sides[0]
    for s in sides[1:]:
        grams = grams.unionAll(s)
    piv = (
        grams.groupBy("doc_id", "n", "g", "side")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n", "g")
        .agg(
            F.sum(F.when(F.col("side") == "c", F.col("c")).otherwise(0)).alias("cc"),
            F.sum(F.when(F.col("side") == "r", F.col("c")).otherwise(0)).alias("rc"),
        )
    )
    prec = piv.groupBy("doc_id", "n").agg(
        F.sum(F.least("cc", "rc")).cast("bigint").alias("clipped"),
        F.sum("cc").cast("bigint").alias("total"),
    )
    lens = pairs.select(
        "doc_id",
        F.size(F.split("cand", " ")).alias("clen"),
        F.size(F.split("ref", " ")).alias("rlen"),
    )
    p1 = prec.filter(F.col("n") == 1).select(
        "doc_id", F.col("clipped").alias("match1"), F.col("total").alias("total1")
    )
    p2 = prec.filter(F.col("n") == 2).select(
        "doc_id", F.col("clipped").alias("match2"), F.col("total").alias("total2")
    )
    bleu = F.floor(
        1e6
        * F.when((F.col("match1") == 0) | (F.col("match2") == 0), F.lit(0.0)).otherwise(
            F.exp(
                F.least(
                    F.lit(0.0), 1.0 - F.col("rlen").cast("double") / F.col("clen")
                )
                + 0.5
                * (
                    F.log(F.col("match1").cast("double") / F.col("total1"))
                    + F.log(F.col("match2").cast("double") / F.col("total2"))
                )
            )
        )
    ).cast("bigint")
    return (
        p1.join(p2, "doc_id")
        .join(lens, "doc_id")
        .select(
            "doc_id", "match1", "total1", "match2", "total2", bleu.alias("bleu2_x1e6")
        )
        .orderBy("doc_id")
    )
