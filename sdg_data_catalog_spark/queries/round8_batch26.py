"""Round-8 operator batch 26: temporal splitting, reciprocal nearest
neighbors, and epoch planning.

- ``split_temporal`` — time-based train/test split at the 80th
  percentile event timestamp with an explicit LEAKAGE AUDIT row
  (max train ts strictly below min test ts): hash splits
  (split_hash/split_kfold) shuffle time into both sides, which leaks
  the future into training for any temporally-drifting target — the
  temporal split is the standard defense, and the audit is the proof.
- ``sim_reciprocal_nn`` — reciprocal-nearest-neighbor pairs between
  the 32 anchors and the candidate corpus: a pair (a, c) is RNN when
  c is a's nearest candidate AND a is c's nearest anchor — the
  high-precision duplicate-candidate rule (one-directional NN
  over-fires on hubs; reciprocity kills them).
- ``curation_epoch_mix_schedule`` — per-source epoch plan under a
  global token budget with the ≤4-epoch repetition cap (the
  diminishing-returns rule of data-constrained scaling): how many
  passes over each source the training run should take and how many
  effective tokens that yields.

Determinism: the split boundary is an exact integer order statistic
(two-phase cumulative counts, integer cross-multiplication); RNN
argmaxes compare (floor(cos·10¹²), −id) integer structs both ways;
the epoch plan is pure integer arithmetic (ceil by DIV, caps by
LEAST).

Reference analog: none direct — SURVEY §2.11 north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_N_ANCHORS = 32

_UNIT_SQL = """
unit AS (
  SELECT vec_id, label,
         list_transform(embedding,
           x -> CAST(x AS DOUBLE)
                / sqrt(list_sum(list_transform(embedding,
                        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS u
  FROM embeddings
)
"""

_COS_QC = """list_sum(list_transform(range(1, 65),
    i -> q.u[i] * c.u[i]))"""


@register(
    "split_temporal",
    oracle="""
    WITH v AS (SELECT event_id, epoch_us(ts) AS t FROM events),
    cum AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY t
    ),
    walk AS (
      SELECT t,
             CAST(SUM(cnt) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS c,
             CAST(SUM(cnt) OVER () AS BIGINT) AS n
      FROM cum
    ),
    cut AS (SELECT MIN(CASE WHEN c * 5 >= n * 4 THEN t END) AS boundary
            FROM walk),
    tagged AS (
      SELECT CASE WHEN v.t <= cut.boundary THEN 'train' ELSE 'test' END
               AS split, v.t
      FROM v CROSS JOIN cut
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(t) AS BIGINT) AS min_ts_us,
           CAST(MAX(t) AS BIGINT) AS max_ts_us,
           CAST((SELECT CASE WHEN MAX(CASE WHEN split = 'train' THEN t END)
                             < MIN(CASE WHEN split = 'test' THEN t END)
                        THEN 1 ELSE 0 END FROM tagged) AS BIGINT)
             AS no_leakage
    FROM tagged GROUP BY split ORDER BY split
    """,
)
def split_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal 80/20 train/test split of the event stream: the
    boundary is the smallest timestamp covering 80% of rows (exact
    integer order statistic — 5·cum ≥ 4·n over the two-phase cumulative
    walk on the timestamp census), train = everything at-or-before it.
    The output carries per-split row counts, time ranges, AND the
    leakage audit bit (max train ts < min test ts) — the property hash
    splits cannot give and the reason temporally-drifting targets
    overfit under them. Ties at the boundary go to train on BOTH
    engines (≤, not <), so the audit can only fail if a timestamp
    straddles — which the boundary definition makes impossible; the
    emitted bit PROVES it rather than asserting it."""
    from sdg_data_catalog_spark.operators.curation import running_total

    ev = table(spark, sf_dir, "events").select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
    )
    cum = ev.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    walk = running_total(cum, "t", F.col("cnt"), "c")
    n_all = cum.agg(F.sum("cnt").cast("bigint").alias("n"))
    cut = (
        walk.crossJoin(F.broadcast(n_all))
        .agg(
            F.min(
                F.when(F.col("c") * 5 >= F.col("n") * 4, F.col("t"))
            ).alias("boundary")
        )
        .localCheckpoint(eager=True)  # 1 row
    )
    tagged = ev.crossJoin(F.broadcast(cut)).select(
        F.when(F.col("t") <= F.col("boundary"), "train")
        .otherwise("test")
        .alias("split"),
        "t",
    )
    audit = tagged.agg(
        (
            F.max(F.when(F.col("split") == "train", F.col("t")))
            < F.min(F.when(F.col("split") == "test", F.col("t")))
        )
        .cast("bigint")
        .alias("no_leakage")
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("t").cast("bigint").alias("min_ts_us"),
            F.max("t").cast("bigint").alias("max_ts_us"),
        )
        .crossJoin(F.broadcast(audit))
        .select("split", "n_rows", "min_ts_us", "max_ts_us", "no_leakage")
        .orderBy("split")
    )


@register(
    "sim_reciprocal_nn",
    oracle=f"""
    WITH {_UNIT_SQL},
    pairs AS (
      SELECT q.vec_id AS anchor_id, c.vec_id AS cand_id,
             CAST(FLOOR(({_COS_QC}) * 1e12) AS BIGINT) AS k
      FROM unit q JOIN unit c
        ON q.vec_id < {_N_ANCHORS} AND c.vec_id >= {_N_ANCHORS}
    ),
    a_best AS (
      SELECT anchor_id, cand_id AS nn_cand, k AS cos_img
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                                         ORDER BY k DESC, cand_id) AS rn
            FROM pairs) WHERE rn = 1
    ),
    c_best AS (
      SELECT cand_id, anchor_id AS nn_anchor
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cand_id
                                         ORDER BY k DESC, anchor_id) AS rn
            FROM pairs) WHERE rn = 1
    )
    SELECT a.anchor_id, a.nn_cand,
           ROUND(a.cos_img / 1e12, 6) AS cosine,
           CAST(CASE WHEN c.nn_anchor = a.anchor_id THEN 1 ELSE 0 END
                AS BIGINT) AS reciprocal
    FROM a_best a JOIN c_best c ON c.cand_id = a.nn_cand
    ORDER BY a.anchor_id
    """,
)
def sim_reciprocal_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest neighbors between the 32 anchors and the
    candidate corpus: for each anchor its nearest candidate, flagged
    reciprocal when that candidate's nearest ANCHOR is the anchor
    itself — the mutual-NN rule that image/text dedup pipelines use to
    cut one-directional false matches from hub vectors. BOTH argmax
    directions are partially-aggregated lexical max-structs over exact
    (floor(cos·10¹²), −id) integers: the anchor direction groups the
    32×N pair stream by anchor; the candidate direction groups by
    candidate with the 32 anchors broadcast — neither sorts, neither
    windows over corpus-sized groups. One pair-stream pass feeds both
    via a checkpoint."""
    emb = table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda y: y.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    unit = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double") / nrm).alias("u"),
    )
    q = unit.filter(F.col("vec_id") < _N_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"), F.col("u").alias("q_u")
    )
    c = unit.filter(F.col("vec_id") >= _N_ANCHORS).select(
        F.col("vec_id").alias("cand_id"), F.col("u").alias("c_u")
    )
    cos = F.aggregate(
        F.zip_with("q_u", "c_u", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .select(
            "anchor_id",
            "cand_id",
            F.floor(cos * 1e12).cast("long").alias("k"),
        )
        .persist()
        # 32×N pair stream; both argmax directions consume it
    )
    a_pick = F.struct(F.col("k"), (-F.col("cand_id")).alias("nc"))
    a_best = (
        pairs.groupBy("anchor_id")
        .agg(F.max(a_pick).alias("b"))
        .select(
            "anchor_id",
            (-F.col("b.nc")).cast("bigint").alias("nn_cand"),
            F.col("b.k").alias("cos_img"),
        )
    )
    c_pick = F.struct(F.col("k"), (-F.col("anchor_id")).alias("na"))
    c_best = (
        pairs.groupBy("cand_id")
        .agg(F.max(c_pick).alias("b"))
        .select(
            F.col("cand_id").alias("cb_cand"),
            (-F.col("b.na")).cast("bigint").alias("nn_anchor"),
        )
    )
    return (
        a_best.join(c_best, a_best.nn_cand == F.col("cb_cand"))
        .select(
            "anchor_id",
            "nn_cand",
            F.round(F.col("cos_img") / 1e12, 6).alias("cosine"),
            (F.col("nn_anchor") == F.col("anchor_id"))
            .cast("bigint")
            .alias("reciprocal"),
        )
        .orderBy("anchor_id")
    )


_EPOCH_CAP = 4
_TOKEN_BUDGET = 200_000  # global training-token budget for the plan


@register(
    "curation_epoch_mix_schedule",
    oracle=f"""
    WITH src AS (
      SELECT source,
             CAST(SUM(len(list_filter(string_split(text, ' '),
                                      w -> w <> ''))) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS t,
                   CAST(COUNT(*) AS BIGINT) AS k FROM src),
    quota AS (
      SELECT s.source, s.tokens,
             CAST({_TOKEN_BUDGET} // t.k AS BIGINT) AS share
      FROM src s CROSS JOIN tot t
    )
    SELECT source, tokens AS available_tokens, share AS token_quota,
           CAST(LEAST((share + tokens - 1) // tokens, {_EPOCH_CAP})
                AS BIGINT) AS epochs,
           CAST(LEAST(share, {_EPOCH_CAP} * tokens) AS BIGINT)
             AS effective_tokens,
           CAST(CASE WHEN share > {_EPOCH_CAP} * tokens
                     THEN share - {_EPOCH_CAP} * tokens ELSE 0 END
                AS BIGINT) AS unfilled_tokens
    FROM quota ORDER BY source
    """,
)
def curation_epoch_mix_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch plan under a uniform {_TOKEN_BUDGET}-token
    training budget with the ≤{_EPOCH_CAP}-epoch repetition cap (the
    data-constrained-scaling rule of thumb: past ~4 passes, repeated
    tokens stop paying): each source's equal share of the budget turns
    into epochs = ceil(share / available) capped at {_EPOCH_CAP}, the
    effective tokens that actually reach the model, and the UNFILLED
    remainder the cap leaves on the table — the gap a data-buying or
    synthesis effort has to close. Token counts are one map-side pass
    (array length, no explode); the plan itself is |sources|-row pure
    integer arithmetic (ceil via DIV, caps via LEAST) — the planning
    companion of plan_token_budget's temperature quotas."""
    docs = table(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    src = docs.groupBy("source").agg(
        F.sum(F.size(ws)).cast("bigint").alias("tokens")
    )
    tot = src.agg(
        F.sum("tokens").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    quota = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        F.expr(f"{_TOKEN_BUDGET} DIV k").cast("bigint").alias("share"),
    )
    epochs = F.least(
        F.expr("(share + tokens - 1) DIV tokens"), F.lit(_EPOCH_CAP)
    )
    return quota.select(
        "source",
        F.col("tokens").alias("available_tokens"),
        F.col("share").alias("token_quota"),
        epochs.cast("bigint").alias("epochs"),
        F.least(F.col("share"), _EPOCH_CAP * F.col("tokens"))
        .cast("bigint")
        .alias("effective_tokens"),
        F.when(
            F.col("share") > _EPOCH_CAP * F.col("tokens"),
            F.col("share") - _EPOCH_CAP * F.col("tokens"),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("unfilled_tokens"),
    ).orderBy("source")
