"""Round-10 operator batch 2: batched Elo, vocabulary-richness
estimation, audio decimation, and submodular data selection.

- ``eval_elo_batched`` — batched (epoch-synchronous) Elo ratings from a
  pairwise match log: within an epoch every update uses start-of-epoch
  ratings, so the result is ORDER-FREE — the distributed-safe Elo
  variant (sequential Elo is a per-match fold no engine can
  parallelize). Three unrolled epochs; the leaderboard shape behind
  arena dashboards that refresh in batches.
- ``agg_chao1_richness`` — Chao1 lower-bound estimate of unseen
  vocabulary per language (Chao 1984; the species-richness estimator
  corpus planners use to decide whether more data still buys new
  vocabulary): D + f1·(f1−1)/(2·(f2+1)) from the frequency-of-
  frequencies of the word distribution.
- ``mm_wav_downsample`` — REAL audio transform path: RIFF/WAVE payloads
  are decoded, decimated 2:1, re-encoded at half the sample rate, and
  re-parsed for exact integer stats (the audio analog of mm_resize's
  decode→transform→re-encode). The oracle replays the closed-form
  sample formula with a stride-2 series and never touches the bytes.
- ``curation_submodular_facility`` — greedy facility-location selection
  (Nemhauser greedy, the submodular-coverage workhorse of diverse
  subset selection): from a fixed 16-candidate pool, pick 3 documents
  maximizing total corpus coverage, where coverage(d) = max over chosen
  c of |shared distinct vocabulary(d, c)| — all-integer marginal gains,
  unrolled greedy steps, candidate×corpus work only (never all-pairs).

Determinism: match outcomes are md5-derived; every Elo expected-score
term enters as a FLOOR(·10⁹) integer image multiplied by exact match
counts (association-order-free); facility-location gains are exact
integer set-overlap counts. Reference analog: none direct — SURVEY
§2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_N_MODELS = 6
_N_EPOCHS = 3
_ELO_K = 16
_R0 = 1000.0

# shared match-log derivation (the rank_bradley_terry convention, ':elo'
# salt so the two ops rate DIFFERENT synthetic tournaments)
_ELO_MATCH_SQL = f"""
    m AS (
      SELECT event_id % {_N_MODELS} AS a,
             (event_id // {_N_MODELS}) % {_N_MODELS} AS b,
             (event_id // 36) % {_N_EPOCHS} AS epoch,
             CASE WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                                                || ':elo'), 1, 15))
                       AS BIGINT) % 1000
                       < 500 + 60 * ((event_id % {_N_MODELS})
                                     - (event_id // {_N_MODELS})
                                       % {_N_MODELS})
                  THEN 1 ELSE 0 END AS a_wins
      FROM events
      WHERE event_id % {_N_MODELS} <> (event_id // {_N_MODELS}) % {_N_MODELS}
    ),
    ps AS (
      SELECT epoch, a, b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a_wins) AS BIGINT) AS wa
      FROM m GROUP BY epoch, a, b
    )
"""


def _elo_epoch_sql(e: int, prev: str, nxt: str) -> str:
    """One epoch-synchronous Elo update as SQL: per pair-stat row the
    expected score comes from START-of-epoch ratings; win/loss terms are
    FLOOR(1e9·…) integer images scaled by exact counts."""
    return f"""
    d{e} AS (
      SELECT model, CAST(SUM(t) AS BIGINT) AS delta,
             CAST(SUM(g) AS BIGINT) AS games FROM (
        SELECT ps.a AS model, ps.n AS g,
               ps.wa * FLOOR(1e9 * (1 - 1 / (1 + power(10.0,
                        (rb.r - ra.r) / 400))))
               + (ps.n - ps.wa) * FLOOR(-1e9 * (1 / (1 + power(10.0,
                        (rb.r - ra.r) / 400)))) AS t
        FROM ps JOIN {prev} ra ON ra.model = ps.a
                JOIN {prev} rb ON rb.model = ps.b
        WHERE ps.epoch = {e}
        UNION ALL
        SELECT ps.b AS model, ps.n AS g,
               (ps.n - ps.wa) * FLOOR(1e9 * (1 - 1 / (1 + power(10.0,
                        (ra.r - rb.r) / 400))))
               + ps.wa * FLOOR(-1e9 * (1 / (1 + power(10.0,
                        (ra.r - rb.r) / 400)))) AS t
        FROM ps JOIN {prev} ra ON ra.model = ps.a
                JOIN {prev} rb ON rb.model = ps.b
        WHERE ps.epoch = {e}
      ) GROUP BY model
    ),
    {nxt} AS (
      SELECT p.model,
             p.r + CASE WHEN COALESCE(d{e}.games, 0) > 0
                        THEN {_ELO_K} * d{e}.delta / (1e9 * d{e}.games)
                        ELSE 0 END AS r
      FROM {prev} p LEFT JOIN d{e} ON d{e}.model = p.model
    )
"""


@register(
    "eval_elo_batched",
    oracle=f"""
    WITH {_ELO_MATCH_SQL},
    r0(model, r) AS (VALUES {", ".join(f"({i}, {_R0})" for i in range(_N_MODELS))}),
    {",".join(_elo_epoch_sql(e, f"r{e}", f"r{e + 1}").strip().lstrip() for e in range(_N_EPOCHS))}
    SELECT f.model,
           CAST(FLOOR(1e6 * f.r) AS BIGINT) AS rating_x1e6,
           CAST(1 + (SELECT COUNT(*) FROM r{_N_EPOCHS} o
                     WHERE FLOOR(1e6 * o.r) > FLOOR(1e6 * f.r)
                        OR (FLOOR(1e6 * o.r) = FLOOR(1e6 * f.r)
                            AND o.model < f.model)) AS BIGINT) AS rank
    FROM r{_N_EPOCHS} f ORDER BY f.model
    """,
)
def eval_elo_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-synchronous Elo over an md5-derived match log with a built-in
    skill gradient (the rank_bradley_terry tournament convention). Every
    update inside an epoch reads START-of-epoch ratings, which makes the
    rating a pure function of per-(epoch, a, b) match COUNTS — the one
    corpus-sized scan aggregates to a ≤ epochs·models² stats table and
    the three unrolled epoch folds run on that bounded table (broadcast
    joins against the 6-row rating relation). Win/loss expected-score
    terms enter as FLOOR(1e9·…) integer images multiplied by exact
    counts, and the update is the MEAN per-game surplus (K·Σ/games) —
    the batched form that cannot overshoot when an epoch holds thousands
    of matches — so each epoch's rating is a deterministic function of
    exact integers on both engines. Sequential (per-match) Elo is
    order-dependent and unparallelizable; batched Elo is what a
    distributed leaderboard actually recomputes."""
    ev = table(spark, sf_dir, "events").select("event_id")
    a = (F.col("event_id") % _N_MODELS).alias("a")
    b = (F.expr(f"event_id div {_N_MODELS}") % _N_MODELS).alias("b")
    epoch = (F.expr("event_id div 36") % _N_EPOCHS).alias("epoch")
    a_wins = (
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":elo"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000
            < 500 + 60 * (F.col("a") - F.col("b")),
            1,
        )
        .otherwise(0)
        .alias("a_wins")
    )
    ps = (
        ev.select(a, b, epoch, "event_id")
        .filter(F.col("a") != F.col("b"))
        .select("epoch", "a", "b", a_wins)
        .groupBy("epoch", "a", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("a_wins").cast("bigint").alias("wa"),
        )
        .localCheckpoint(eager=False)  # ≤ epochs·models² rows; reused 3×
    )
    ratings = spark.range(_N_MODELS).select(
        F.col("id").alias("model"), F.lit(_R0).alias("r")
    )

    def _expected(r_self, r_opp):
        return 1 / (1 + F.pow(F.lit(10.0), (r_opp - r_self) / 400))

    for e in range(_N_EPOCHS):
        pe = ps.filter(F.col("epoch") == e)
        ra = ratings.select(F.col("model").alias("a"), F.col("r").alias("r_a"))
        rb = ratings.select(F.col("model").alias("b"), F.col("r").alias("r_b"))
        joined = pe.join(F.broadcast(ra), "a").join(F.broadcast(rb), "b")
        e_a = _expected(F.col("r_a"), F.col("r_b"))
        e_b = _expected(F.col("r_b"), F.col("r_a"))
        term_a = F.col("wa") * F.floor(1e9 * (1 - e_a)) + (
            F.col("n") - F.col("wa")
        ) * F.floor(-1e9 * e_a)
        term_b = (F.col("n") - F.col("wa")) * F.floor(1e9 * (1 - e_b)) + F.col(
            "wa"
        ) * F.floor(-1e9 * e_b)
        deltas = (
            joined.select(
                F.col("a").alias("model"), term_a.alias("t"), F.col("n").alias("g")
            )
            .unionAll(
                joined.select(
                    F.col("b").alias("model"), term_b.alias("t"), F.col("n").alias("g")
                )
            )
            .groupBy("model")
            .agg(
                F.sum("t").cast("bigint").alias("delta"),
                F.sum("g").cast("bigint").alias("games"),
            )
        )
        ratings = ratings.join(F.broadcast(deltas), "model", "left").select(
            "model",
            (
                F.col("r")
                + F.when(
                    F.coalesce(F.col("games"), F.lit(0)) > 0,
                    _ELO_K * F.col("delta") / (1e9 * F.col("games")),
                ).otherwise(F.lit(0.0))
            ).alias("r"),
        ).localCheckpoint()  # 6-row lineage cut per epoch (see rank_plackett_luce)
    final = ratings.select("model", F.floor(1e6 * F.col("r")).cast("bigint").alias("rating_x1e6"))
    o = final.select(
        F.col("model").alias("o_model"), F.col("rating_x1e6").alias("o_rating")
    )
    return (
        final.join(
            F.broadcast(o),
            (F.col("o_rating") > F.col("rating_x1e6"))
            | (
                (F.col("o_rating") == F.col("rating_x1e6"))
                & (F.col("o_model") < F.col("model"))
            ),
            "left",
        )
        .groupBy("model", "rating_x1e6")
        .agg((1 + F.count("o_model")).cast("bigint").alias("rank"))
        .orderBy("model")
    )


@register(
    "agg_chao1_richness",
    oracle="""
    WITH wc AS (
        SELECT lang, w, COUNT(*) AS c
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY lang, w
    ),
    fof AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS d_distinct,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM wc GROUP BY lang
    )
    SELECT lang, d_distinct, f1, f2,
           CAST(FLOOR(1000 * (d_distinct
                + CAST(f1 * (f1 - 1) AS DOUBLE) / (2 * (f2 + 1))))
                AS BIGINT) AS chao1_x1000
    FROM fof ORDER BY lang
    """,
)
def agg_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 vocabulary-richness lower bound per language (Chao 1984,
    bias-corrected form): singletons (f1) and doubletons (f2) of the
    word-frequency distribution estimate how many word types the corpus
    has NOT yet seen — the statistic behind 'will more data still grow
    the vocabulary?' planning (complements text_heaps_law's growth-curve
    fit with a point estimate of the asymptote). Two partial-agg
    shuffles (word counts, then frequency-of-frequencies per lang); the
    estimator itself is exact integer arithmetic plus one FLOOR(·10³)
    image of the f1²/f2 correction."""
    docs = table(spark, sf_dir, "documents")
    wc = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fof = wc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_distinct"),
        F.sum((F.col("c") == 1).cast("bigint")).cast("bigint").alias("f1"),
        F.sum((F.col("c") == 2).cast("bigint")).cast("bigint").alias("f2"),
    )
    chao1 = F.floor(
        1000
        * (
            F.col("d_distinct")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (2 * (F.col("f2") + 1))
        )
    ).cast("bigint")
    return fof.select(
        "lang", "d_distinct", "f1", "f2", chao1.alias("chao1_x1000")
    ).orderBy("lang")


@register(
    "mm_wav_downsample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(COUNT(*) AS INTEGER) AS n_samples,
           CAST(SUM(s * s) AS BIGINT) AS sum_sq,
           CAST(MAX(ABS(s)) AS INTEGER) AS peak_abs
    FROM (
      SELECT doc_id,
             (doc_id * 7
              + unnest(generate_series(0, 64 + doc_id % 64 - 1, 2)) * 13)
             % 251 - 125 AS s
      FROM documents
    )
    GROUP BY doc_id ORDER BY media_id
    """,
)
def mm_wav_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode→transform→re-encode, end-to-end: real WAV payloads
    are decimated 2:1 (operators/multimodal.wav_downsample), re-encoded
    at 8 kHz, and the OUTPUT containers are parsed again for exact
    integer stats. The oracle replays the closed-form PCM formula with a
    stride-2 series — agreement proves the full decode/decimate/encode/
    re-decode chain is sample-exact, the same differential shape
    mm_resize uses for images."""
    from sdg_data_catalog_spark.operators import multimodal as MM

    docs = table(spark, sf_dir, "documents").select("doc_id")
    media = MM.as_wav_media(docs)
    down = MM.wav_downsample(media, factor=2)
    return MM.wav_stats(down).orderBy("media_id")


_N_CAND = 16
_FACILITY_STEPS = 3
# candidate pool: a fixed, scale-stable rule (doc_ids 0..300 step 20 exist
# at every SF — documents always carries doc_id 0..499+)
_CAND_RULE = "doc_id < 320 AND doc_id % 20 = 0"


@register(
    "curation_submodular_facility",
    oracle=f"""
    WITH dw AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    cw AS (
        SELECT doc_id AS cand, w FROM dw WHERE {_CAND_RULE}
    ),
    ov AS (
        SELECT dw.doc_id, cw.cand, CAST(COUNT(*) AS BIGINT) AS ov
        FROM dw JOIN cw USING (w)
        GROUP BY dw.doc_id, cw.cand
    ),
    g1 AS (SELECT cand, SUM(ov) AS gain FROM ov GROUP BY cand),
    c1 AS (SELECT cand, gain FROM g1 ORDER BY gain DESC, cand LIMIT 1),
    cov1 AS (SELECT doc_id, ov AS cov FROM ov
             WHERE cand = (SELECT cand FROM c1)),
    g2 AS (
        SELECT ov.cand,
               SUM(GREATEST(ov.ov - COALESCE(cov1.cov, 0), 0)) AS gain
        FROM ov LEFT JOIN cov1 USING (doc_id)
        WHERE ov.cand <> (SELECT cand FROM c1)
        GROUP BY ov.cand
    ),
    c2 AS (SELECT cand, gain FROM g2 ORDER BY gain DESC, cand LIMIT 1),
    cov2 AS (
        SELECT COALESCE(cov1.doc_id, o2.doc_id) AS doc_id,
               GREATEST(COALESCE(cov1.cov, 0), COALESCE(o2.ov, 0)) AS cov
        FROM cov1 FULL JOIN (SELECT doc_id, ov FROM ov
                             WHERE cand = (SELECT cand FROM c2)) o2
          ON cov1.doc_id = o2.doc_id
    ),
    g3 AS (
        SELECT ov.cand,
               SUM(GREATEST(ov.ov - COALESCE(cov2.cov, 0), 0)) AS gain
        FROM ov LEFT JOIN cov2 USING (doc_id)
        WHERE ov.cand NOT IN ((SELECT cand FROM c1), (SELECT cand FROM c2))
        GROUP BY ov.cand
    ),
    c3 AS (SELECT cand, gain FROM g3 ORDER BY gain DESC, cand LIMIT 1),
    cov3 AS (
        SELECT COALESCE(cov2.doc_id, o3.doc_id) AS doc_id,
               GREATEST(COALESCE(cov2.cov, 0), COALESCE(o3.ov, 0)) AS cov
        FROM cov2 FULL JOIN (SELECT doc_id, ov FROM ov
                             WHERE cand = (SELECT cand FROM c3)) o3
          ON cov2.doc_id = o3.doc_id
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS step, cand AS chosen,
             CAST(gain AS BIGINT) AS gain,
             (SELECT CAST(SUM(cov) AS BIGINT) FROM cov1) AS total_cov
      FROM c1
      UNION ALL
      SELECT CAST(2 AS BIGINT), cand, CAST(gain AS BIGINT),
             (SELECT CAST(SUM(cov) AS BIGINT) FROM cov2) FROM c2
      UNION ALL
      SELECT CAST(3 AS BIGINT), cand, CAST(gain AS BIGINT),
             (SELECT CAST(SUM(cov) AS BIGINT) FROM cov3) FROM c3
    ) ORDER BY step
    """,
)
def curation_submodular_facility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy facility-location data selection (Nemhauser et al. 1978
    greedy, the 1−1/e-approximate submodular maximizer): choose 3 of 16
    fixed candidate documents so the corpus-wide coverage
    Σ_d max_{c∈S} |shared distinct vocab(d, c)| is maximal. Per step the
    marginal gain of every remaining candidate is Σ_d max(ov(d,c) −
    cov(d), 0) — exact integers, so greedy argmax ties break on candidate
    id identically in both engines. Work shape: one distinct-word
    explode, one word-keyed equi-join against the 16-candidate side
    (broadcast at any scale), then 3 unrolled greedy rounds over the
    bounded (docs × 16) overlap relation — the candidate pool caps the
    join fan-out, never all-pairs. Output: the greedy trace
    (step, chosen, gain, running total coverage)."""
    docs = table(spark, sf_dir, "documents")
    dw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).distinct()
    cw = dw.filter(F.expr(_CAND_RULE)).select(
        F.col("doc_id").alias("cand"), "w"
    )
    ov = (
        dw.join(F.broadcast(cw), "w")
        .groupBy("doc_id", "cand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ov"))
        .localCheckpoint(eager=False)  # docs × ≤16 rows; reused every round
    )
    rows = []
    cov = None  # DataFrame(doc_id, cov) of the chosen set so far
    chosen_tables = []  # 1-row DataFrames(cand) — anti-joined, never collected
    for step in range(1, _FACILITY_STEPS + 1):
        base = ov
        for ct in chosen_tables:  # exclude already-chosen candidates
            base = base.join(F.broadcast(ct), "cand", "left_anti")
        if cov is None:
            gains = base.groupBy("cand").agg(F.sum("ov").alias("gain"))
        else:
            gains = (
                base.join(cov, "doc_id", "left")
                .withColumn(
                    "mg",
                    F.greatest(
                        F.col("ov") - F.coalesce(F.col("cov"), F.lit(0)), F.lit(0)
                    ),
                )
                .groupBy("cand")
                .agg(F.sum("mg").alias("gain"))
            )
        top = (
            gains.orderBy(F.col("gain").desc(), "cand")
            .limit(1)
            .select(
                F.col("cand").alias("chosen"),
                F.col("gain").cast("bigint").alias("gain"),
            )
            .localCheckpoint(eager=False)  # 1 row; reused 3× below
        )
        chosen_tables.append(top.select(F.col("chosen").alias("cand")))
        picked = ov.join(F.broadcast(chosen_tables[-1]), "cand").select(
            "doc_id", F.col("ov").alias("new_cov")
        )
        if cov is None:
            cov = picked.select("doc_id", F.col("new_cov").alias("cov"))
        else:
            cov = cov.join(picked, "doc_id", "full").select(
                "doc_id",
                F.greatest(
                    F.coalesce(F.col("cov"), F.lit(0)),
                    F.coalesce(F.col("new_cov"), F.lit(0)),
                ).alias("cov"),
            )
        cov = cov.localCheckpoint(eager=False)
        total = cov.agg(F.sum("cov").cast("bigint").alias("total_cov"))
        rows.append(
            top.crossJoin(F.broadcast(total)).select(
                F.lit(step).cast("bigint").alias("step"),
                "chosen",
                "gain",
                "total_cov",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("step")
