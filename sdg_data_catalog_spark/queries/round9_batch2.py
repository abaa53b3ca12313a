"""Round-9 operator batch 2: model-eval ranking and training-plan ops.

- ``eval_pass_at_k`` — the unbiased pass@k estimator of the Codex paper
  (Chen et al. 2021): per task with n samples and c passes,
  pass@k = 1 − C(n−c,k)/C(n,k), computed as the telescoping product —
  the metric every code-model eval reports.
- ``rank_bradley_terry`` — Bradley-Terry strength scores from pairwise
  match outcomes via 3 unrolled minorization-maximization rounds
  (Hunter 2004) — the arena-/preference-ranking model behind LLM
  leaderboards, run as dataflow over a match log.
- ``dedup_blocking_keys`` — entity-resolution blocking: the sorted
  5-distinct-word prefix signature per document and the oversized
  candidate blocks a fuzzy matcher would actually compare within.
- ``plan_context_length_sweep`` — padding-vs-packing economics at
  context lengths 512/2048/8192: sequences needed with per-doc padding
  vs cross-doc packing and the padding waste ratio — the sweep that
  picks a context length before committing a training run.
- ``agg_vocab_marginal_gain`` — marginal new vocabulary per source in
  source order (each word credited to its MIN source): the
  diminishing-returns curve of adding sources to a corpus.

Determinism: match outcomes and pass verdicts are md5-derived integer
thresholds; every MM denominator sums FLOOR(·10⁹) integer images (the
round-9 batch-1 normalizer convention); ranks compare integer images,
never rounded floats.

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_N_TASKS = 40
_K = 5
_N_MODELS = 6


@register(
    "eval_pass_at_k",
    oracle=f"""
    WITH s AS (
      SELECT doc_id % {_N_TASKS} AS task_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                || ':pass'), 1, 15))
                       AS BIGINT) % 100
                       < 10 + (doc_id % {_N_TASKS}) * 7 % 60
                  THEN 1 ELSE 0 END AS ok
      FROM documents
    ),
    t AS (
      SELECT task_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ok) AS BIGINT) AS c
      FROM s GROUP BY task_id
    )
    SELECT task_id, n, c,
           ROUND(CAST(c AS DOUBLE) / n, 6) AS pass_at_1,
           ROUND(CASE WHEN c = 0 THEN 0.0
                      WHEN n - c < {_K} THEN 1.0
                      ELSE 1.0
                        - (CAST(n - c AS DOUBLE) / n)
                        * (CAST(n - c - 1 AS DOUBLE) / (n - 1))
                        * (CAST(n - c - 2 AS DOUBLE) / (n - 2))
                        * (CAST(n - c - 3 AS DOUBLE) / (n - 3))
                        * (CAST(n - c - 4 AS DOUBLE) / (n - 4))
                      END, 6) + 0.0 AS pass_at_5
    FROM t ORDER BY task_id
    """,
)
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021, arXiv:2107.03374 eq. 1): per
    task, n samples, c passes, pass@k = 1 − C(n−c,k)/C(n,k) computed as
    the telescoping product Π_{{i<k}} (n−c−i)/(n−i) — never the naive
    1−(1−c/n)^k, which is biased high for small n. Sample verdicts are
    md5-derived integer thresholds with per-task difficulty, so (n, c)
    are exact and the product is a single identical double chain both
    engines run on exact integers. One corpus pass; |tasks|-row
    algebra."""
    s = table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % _N_TASKS).alias("task_id"),
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":pass"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 100
            < 10 + (F.col("doc_id") % _N_TASKS) * 7 % 60,
            1,
        )
        .otherwise(0)
        .alias("ok"),
    )
    t = s.groupBy("task_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("c"),
    )
    n, c = F.col("n"), F.col("c")
    prod = F.lit(1.0)
    for i in range(_K):
        prod = prod * ((n - c - i).cast("double") / (n - i))
    return t.select(
        "task_id",
        "n",
        "c",
        F.round(c.cast("double") / n, 6).alias("pass_at_1"),
        (
            F.round(
                F.when(c == 0, 0.0)
                .when(n - c < _K, 1.0)
                .otherwise(1.0 - prod),
                6,
            )
            + 0.0
        ).alias("pass_at_5"),
    ).orderBy("task_id")


_BT_MATCH_SQL = f"""
    m AS (
      SELECT event_id % {_N_MODELS} AS a,
             (event_id // {_N_MODELS}) % {_N_MODELS} AS b,
             CASE WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)
                                                || ':bt'), 1, 15))
                       AS BIGINT) % 1000
                       < 500 + 60 * ((event_id % {_N_MODELS})
                                     - (event_id // {_N_MODELS})
                                       % {_N_MODELS})
                  THEN 1 ELSE 0 END AS a_wins
      FROM events
      WHERE event_id % {_N_MODELS} <> (event_id // {_N_MODELS}) % {_N_MODELS}
    ),
    pairs AS (
      SELECT LEAST(a, b) AS i, GREATEST(a, b) AS j,
             CAST(COUNT(*) AS BIGINT) AS n_ij,
             CAST(SUM(CASE WHEN (a < b AND a_wins = 1)
                             OR (a > b AND a_wins = 0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS w_i
      FROM m GROUP BY 1, 2
    ),
    wins AS (
      SELECT model, CAST(SUM(w) AS BIGINT) AS w_total,
             CAST(SUM(n) AS BIGINT) AS n_total
      FROM (
        SELECT i AS model, w_i AS w, n_ij AS n FROM pairs
        UNION ALL
        SELECT j AS model, n_ij - w_i AS w, n_ij AS n FROM pairs
      ) GROUP BY model
    )
"""


def _bt_iter_sql(it: int) -> str:
    prev = f"g{it - 1}"
    return f"""
d{it} AS (
  SELECT p.model,
         CAST(SUM(CAST(FLOOR(p.n_ij / (ga.g + gb.g) * 1e9) AS BIGINT))
              AS BIGINT) AS denom_img
  FROM (
    SELECT i AS model, j AS opp, n_ij FROM pairs
    UNION ALL
    SELECT j AS model, i AS opp, n_ij FROM pairs
  ) p
  JOIN {prev} ga ON ga.model = p.model
  JOIN {prev} gb ON gb.model = p.opp
  GROUP BY p.model
),
g{it} AS (
  SELECT w.model, CAST(w.w_total AS DOUBLE) * 1e9 / d{it}.denom_img AS g
  FROM wins w JOIN d{it} ON d{it}.model = w.model
)"""


@register(
    "rank_bradley_terry",
    oracle=f"""
    WITH {_BT_MATCH_SQL},
    g0 AS (SELECT model, CAST(1.0 AS DOUBLE) AS g FROM wins),
    {",".join(_bt_iter_sql(i)[1:] for i in (1, 2, 3))},
    img AS (
      SELECT model, CAST(FLOOR(g * 1e9) AS BIGINT) AS g_img FROM g3
    ),
    z AS (SELECT CAST(SUM(g_img) AS BIGINT) AS zsum FROM img)
    SELECT 'm' || CAST(i.model AS VARCHAR) AS model,
           w.n_total AS games, w.w_total AS wins,
           ROUND(CAST(i.g_img AS DOUBLE) / z.zsum, 6) AS bt_score,
           CAST(1 + (SELECT COUNT(*) FROM img o
                     WHERE o.g_img > i.g_img
                        OR (o.g_img = i.g_img AND o.model < i.model))
                AS BIGINT) AS rank
    FROM img i JOIN wins w ON w.model = i.model CROSS JOIN z
    ORDER BY model
    """,
)
def rank_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength ranking from a pairwise match log — the
    model behind LLM arena leaderboards — via 3 unrolled MM rounds
    (Hunter 2004): γ'_i = W_i / Σ_j n_ij/(γ_i+γ_j), started from
    γ=1. Matches are md5-derived with a built-in skill gradient
    (higher model id wins more), so the fitted ordering has ground
    truth to test against. Every MM denominator sums FLOOR(·10⁹)
    integer images of the per-opponent terms (an unordered double SUM
    would be association-order-dependent across engines), so each γ
    iteration is a deterministic function of exact integers; final
    ranks compare the γ integer images with a model-id tie-break —
    never rounded floats. The pair table is |models|²-bounded
    metadata; the only corpus-sized work is the one match-log scan."""
    ev = table(spark, sf_dir, "events").select("event_id")
    a = (F.col("event_id") % _N_MODELS).alias("a")
    b = (F.expr(f"event_id div {_N_MODELS}") % _N_MODELS).alias("b")
    m = (
        ev.select(a, b, "event_id")
        .filter(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.when(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("event_id").cast("string"), F.lit(":bt"))),
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
            .alias("a_wins"),
        )
    )
    pairs = (
        m.select(
            F.least("a", "b").alias("i"),
            F.greatest("a", "b").alias("j"),
            F.when(
                ((F.col("a") < F.col("b")) & (F.col("a_wins") == 1))
                | ((F.col("a") > F.col("b")) & (F.col("a_wins") == 0)),
                1,
            )
            .otherwise(0)
            .alias("iw"),
        )
        .groupBy("i", "j")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ij"),
            F.sum("iw").cast("bigint").alias("w_i"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)  # |models|^2-bounded pair table
    )
    sides = pairs.select(
        F.col("i").alias("model"), F.col("j").alias("opp"), "n_ij", F.col("w_i").alias("w")
    ).unionByName(
        pairs.select(
            F.col("j").alias("model"),
            F.col("i").alias("opp"),
            "n_ij",
            (F.col("n_ij") - F.col("w_i")).alias("w"),
        )
    )
    wins = sides.groupBy("model").agg(
        F.sum("w").cast("bigint").alias("w_total"),
        F.sum("n_ij").cast("bigint").alias("n_total"),
    ).localCheckpoint(eager=True)  # |models| rows
    g = wins.select("model", F.lit(1.0).alias("g"))
    for _ in range(3):
        ga = g.select(F.col("model").alias("model_a"), F.col("g").alias("g_a"))
        gb = g.select(F.col("model").alias("model_b"), F.col("g").alias("g_b"))
        d = (
            sides.join(ga, sides["model"] == ga["model_a"])
            .join(gb, sides["opp"] == gb["model_b"])
            .groupBy("model")
            .agg(
                F.sum(
                    F.floor(F.col("n_ij") / (F.col("g_a") + F.col("g_b")) * 1e9)
                    .cast("bigint")
                )
                .cast("bigint")
                .alias("denom_img")
            )
        )
        g = wins.join(d, "model").select(
            "model",
            (F.col("w_total").cast("double") * 1e9 / F.col("denom_img")).alias("g"),
        )
    img = g.select("model", F.floor(F.col("g") * 1e9).cast("bigint").alias("g_img"))
    z = img.agg(F.sum("g_img").cast("bigint").alias("zsum"))
    other = img.select(
        F.col("model").alias("o_model"), F.col("g_img").alias("o_img")
    )
    ranked = (
        img.join(
            other,
            (F.col("o_img") > F.col("g_img"))
            | ((F.col("o_img") == F.col("g_img")) & (F.col("o_model") < F.col("model"))),
            "left",
        )
        .groupBy("model", "g_img")
        .agg((1 + F.count("o_model")).cast("bigint").alias("rank"))
    )
    return (
        ranked.join(wins, "model")
        .crossJoin(F.broadcast(z))
        .select(
            F.concat(F.lit("m"), F.col("model").cast("string")).alias("model"),
            F.col("n_total").alias("games"),
            F.col("w_total").alias("wins"),
            F.round(F.col("g_img").cast("double") / F.col("zsum"), 6).alias(
                "bt_score"
            ),
            "rank",
        )
        .orderBy("model")
    )


@register(
    "dedup_blocking_keys",
    oracle="""
    WITH keys AS (
      SELECT doc_id,
             array_to_string(list_slice(list_sort(list_distinct(
               string_split(text, ' '))), 1, 5), ' ') AS block_key
      FROM documents
    ),
    blocks AS (
      SELECT block_key, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
      FROM keys GROUP BY block_key HAVING COUNT(*) >= 2
    )
    SELECT block_key, n_docs, min_doc_id,
           CAST(n_docs * (n_docs - 1) / 2 AS BIGINT) AS candidate_pairs
    FROM blocks
    ORDER BY n_docs DESC, block_key
    LIMIT 20
    """,
)
def dedup_blocking_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution blocking audit: the sorted 5-distinct-word
    prefix signature per document, and the blocks (key groups with ≥2
    members) a fuzzy matcher would compare within — with the
    candidate-pair count n·(n−1)/2 each block contributes. At corpus
    scale the pair budget, not the matcher, is what explodes; this is
    the report that catches an oversized block BEFORE the quadratic
    join runs (the standard blocking step of record linkage — Fellegi
    & Sunter lineage). One map-side signature pass, one hash
    aggregate; top-20 via TakeOrdered with a deterministic (count,
    key) order."""
    keys = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ",
            F.slice(F.array_sort(F.array_distinct(F.split("text", " "))), 1, 5),
        ).alias("block_key"),
    )
    return (
        keys.groupBy("block_key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "block_key",
            "n_docs",
            "min_doc_id",
            (F.col("n_docs") * (F.col("n_docs") - 1) / 2)
            .cast("bigint")
            .alias("candidate_pairs"),
        )
        .orderBy(F.col("n_docs").desc(), "block_key")
        .limit(20)
    )


@register(
    "plan_context_length_sweep",
    oracle="""
    WITH tok AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    ctx(context_len) AS (VALUES (512), (2048), (8192))
    SELECT CAST(context_len AS BIGINT) AS context_len,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM((n_tok + context_len - 1) // context_len) AS BIGINT)
             AS seqs_padded,
           CAST((SUM(n_tok) + context_len - 1) // context_len AS BIGINT)
             AS seqs_packed,
           ROUND(1.0 - CAST(SUM(n_tok) AS DOUBLE)
                 / (SUM((n_tok + context_len - 1) // context_len)
                    * context_len), 6) AS padding_waste_ratio
    FROM tok CROSS JOIN ctx
    GROUP BY context_len ORDER BY context_len
    """,
)
def plan_context_length_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length economics sweep: at 512/2048/8192 tokens, the
    sequence count under per-document padding (Σ⌈tok/L⌉) vs cross-doc
    packing (⌈Σtok/L⌉) and the padding waste ratio — longer contexts
    waste MORE compute on padding unless the loader packs, and this is
    the 3-row table that quantifies exactly that before a training run
    commits to a context length. All integer ceilings; one corpus
    pass fanned out 3× map-side."""
    tok = table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    ctx = tok.sparkSession.createDataFrame(
        [(512,), (2048,), (8192,)], "context_len long"
    )
    fan = tok.crossJoin(F.broadcast(ctx))
    padded = F.floor(
        (F.col("n_tok") + F.col("context_len") - 1) / F.col("context_len")
    ).cast("bigint")
    return (
        fan.groupBy("context_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum(padded).cast("bigint").alias("seqs_padded"),
        )
        .select(
            "context_len",
            "n_docs",
            "total_tokens",
            "seqs_padded",
            F.floor(
                (F.col("total_tokens") + F.col("context_len") - 1)
                / F.col("context_len")
            )
            .cast("bigint")
            .alias("seqs_packed"),
            F.round(
                1.0
                - F.col("total_tokens").cast("double")
                / (F.col("seqs_padded") * F.col("context_len")),
                6,
            ).alias("padding_waste_ratio"),
        )
        .orderBy("context_len")
    )


@register(
    "agg_vocab_marginal_gain",
    oracle="""
    WITH w AS (
      SELECT DISTINCT source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    first_src AS (
      SELECT word, MIN(source) AS source FROM w GROUP BY word
    ),
    gain AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS new_types
      FROM first_src GROUP BY source
    ),
    src AS (SELECT DISTINCT source FROM documents)
    SELECT s.source,
           CAST(COALESCE(g.new_types, 0) AS BIGINT) AS new_types,
           CAST(SUM(COALESCE(g.new_types, 0))
                OVER (ORDER BY s.source ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumulative_types
    FROM src s LEFT JOIN gain g ON g.source = s.source
    ORDER BY s.source
    """,
)
def agg_vocab_marginal_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal vocabulary per source, in source order: each word type
    is credited to its MIN source, so new_types(s) is exactly the
    vocabulary source s adds on top of every earlier source — the
    diminishing-returns curve that says when adding more of the same
    kind of data stops buying coverage. Exact distinct counting (one
    word-level distinct + one MIN aggregate); the cumulative sum runs
    over the |sources|-row result, not the corpus, so the window is
    bounded metadata, never a corpus-wide single partition."""
    w = (
        table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    first_src = w.groupBy("word").agg(F.min("source").alias("source"))
    gain = first_src.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_types")
    )
    src = table(spark, sf_dir, "documents").select("source").distinct()
    from pyspark.sql.window import Window

    out = (
        src.join(gain, "source", "left")
        .select(
            "source",
            F.coalesce(F.col("new_types"), F.lit(0)).cast("bigint").alias("new_types"),
        )
        .coalesce(1)  # |sources| rows — bounded window input
    )
    win = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    return out.select(
        "source",
        "new_types",
        F.sum("new_types").over(win).cast("bigint").alias("cumulative_types"),
    ).orderBy("source")
