"""Round-8 operator batch 1: embedding diversity, interpolated LM
scoring, and integer-exact weighted sampling.

Three operators a 100-TB curation pipeline runs that the registry did
not yet carry:

- `emb_diversity_by_label`: per-group embedding dispersion E||x-mu||^2 —
  SemDeDup's companion readout (how much semantic variety a group
  retains after dedup). Computed from exact integer moments of the
  quantized vectors so the statistic hash-matches across engines.
- `lm_jm_interpolated_score`: Jelinek-Mercer interpolated bigram LM,
  the smoothing rung between the raw add-k bigram (`lm_bigram_score`)
  and Kneser-Ney (`lm_kneser_ney_score`) — the classic CCNet-style
  quality ladder is now complete (unigram / add-k bigram / JM / KN).
- `sample_pps_systematic`: probability-proportional-to-size systematic
  sampling by cumulative weight — the deterministic, integer-exact
  weighted sampler (every float-free comparison; rand()-based PPS
  destroys run-to-run comparability). Uses the two-phase distributed
  running total (operators/curation.py::running_total), never a
  single-partition window.

Reference analog: none direct (the reference samples with pandas
`.sample()` and scores with a torch LM); these are the engine-added
scale-correct forms. All three carry full DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdg_data_catalog_spark.catalog import table
from sdg_data_catalog_spark.queries.registry import register

_DIM = 64
_Q = 1000  # fixed-point quantization scale for exact moments

# per-dimension quantized sums, generated from the same constant on both
# sides so the two cannot drift (the _SIG_SQL convention)
_QD_SQL = (
    "q AS (SELECT label, "
    + ", ".join(
        f"CAST(ROUND(CAST(embedding[{d + 1}] AS DOUBLE) * {_Q}) AS BIGINT) AS q{d}"
        for d in range(_DIM)
    )
    + " FROM embeddings)"
)


@register(
    "emb_diversity_by_label",
    oracle=f"""
    WITH {_QD_SQL},
    m AS (
      SELECT label,
             CAST(COUNT(*) AS BIGINT) AS n,
             {", ".join(f"SUM(q{d}) AS s{d}" for d in range(_DIM))},
             SUM({" + ".join(f"q{d} * q{d}" for d in range(_DIM))}) AS ssq
      FROM q GROUP BY label
    )
    SELECT label, n,
           FLOOR(CAST(CAST(ssq AS HUGEINT) * n
                      - ({" + ".join(f"CAST(s{d} AS HUGEINT) * s{d}" for d in range(_DIM))})
                      AS DOUBLE)
                 / (CAST(n AS DOUBLE) * n) / {_Q}.0 / {_Q}.0 * 1e6) / 1e6
             AS diversity
    FROM m
    """,
)
def emb_diversity_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding diversity: mean squared distance to the label
    centroid, E||x-mu||^2 = S2/n - sum_d (S1_d/n)^2 — the dispersion
    readout curators pair with SemDeDup (a label whose diversity
    collapses after dedup lost real variety, not just duplicates).

    Exactness: vectors are quantized to fixed-point integers
    (round(x*1000) — float multiplication and half-up rounding agree
    across engines, the ts_resample_locf precedent), so S1_d and S2 are
    exact integer moments; the numerator S2*n - sum(S1_d^2) is computed
    in decimal(38,0)/HUGEINT (S1_d^2 overflows int64 past ~3e9 rows per
    label — the agg_welch_ttest convention), and one double division +
    1e-6 floor lands both engines on the same bits.

    Scale shape: ONE corpus pass, 64 per-dimension SUM slots + one
    in-row sum-of-squares fold in a single map-side-combinable groupBy —
    no explode (the posexplode form shuffles 64x the rows), no second
    pass for the centroid. Output is |labels| rows."""
    emb = table(spark, sf_dir, "embeddings")
    # r15 (guide §2.3/§4.2, operators/moments.py): quantization AND the
    # per-label partial aggregation now run inside one numpy mapInPandas
    # pass — the r14 expression form (64 unrolled round columns into a
    # 65-state hash aggregate) was value-identical but paid a per-query
    # codegen-compile constant that tripled the sf0.1 time (0.71 → 1.95 s,
    # the disclosed r14 regression). All partial sums are exact int64
    # (associative — the split into per-batch partials cannot change
    # them), and the half-away quantization is bit-pinned against
    # F.round in tests/test_r15_moments_kernel.py; everything from the
    # decimal numerator on is unchanged.
    from sdg_data_catalog_spark.operators.moments import label_moment_partials

    parts = label_moment_partials(emb, _Q, _DIM)
    m = parts.groupBy("label").agg(
        F.sum("n").alias("n"),
        *[F.sum(f"s{d}").alias(f"s{d}") for d in range(_DIM)],
        F.sum("ssq").alias("ssq"),
    )
    sum_sq = F.aggregate(
        F.array(*[F.col(f"s{d}") for d in range(_DIM)]),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: acc + x.cast("decimal(19,0)") * x.cast("decimal(19,0)"),
    )
    num = F.col("ssq").cast("decimal(38,0)") * F.col("n") - sum_sq
    diversity = (
        num.cast("double")
        / (F.col("n").cast("double") * F.col("n"))
        / float(_Q)
        / float(_Q)
    )
    return m.select(
        "label",
        "n",
        (F.floor(diversity * 1e6) / 1e6).alias("diversity"),
    )


_JM_LAMBDA = 0.7


@register(
    "lm_jm_interpolated_score",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    big AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM tok, UNNEST(range(1, len(t))) AS u(i)
    ),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c2
           FROM big GROUP BY w1, w2),
    c1 AS (
      SELECT w, CAST(COUNT(*) AS DOUBLE) AS c1
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    tot AS (SELECT SUM(c1) AS nn FROM c1)
    SELECT big.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(ln({_JM_LAMBDA} * c2.c2 / ca.c1
                        + {1 - _JM_LAMBDA} * cb.c1 / tot.nn)), 4) AS avg_logp
    FROM big
    JOIN c2 ON c2.w1 = big.w1 AND c2.w2 = big.w2
    JOIN c1 ca ON ca.w = big.w1
    JOIN c1 cb ON cb.w = big.w2
    , tot
    GROUP BY big.doc_id
    """,
)
def lm_jm_interpolated_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer interpolated bigram LM score per document:
    avg ln[ lambda * c(w1,w2)/c(w1) + (1-lambda) * c(w2)/N ] with
    lambda=0.7 — linear interpolation between the ML bigram estimate and
    the unigram background, the smoothing the add-k form
    (`lm_bigram_score`) approximates and Kneser-Ney
    (`lm_kneser_ney_score`) refines; with this the registry carries the
    full CCNet-style LM-quality ladder. A seen bigram implies c2>=1 and
    c1(w1)>=1, and every token has c1>=1, so the interpolated mass is
    strictly positive — ln never sees 0.

    Plan shape (lm_bigram_score template): both model tables train in
    one pass each and are checkpointed (vocabulary-sized — the corpus
    scan would otherwise re-expand per join reference), then broadcast
    onto the probe explode; the only data-proportional shuffle is the
    final per-doc rollup. The score expression is ONE identical double
    formula from exact integer counts on both engines."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    left = F.slice("t", 1, F.size("t") - 1)
    right = F.slice(F.col("t"), F.lit(2), F.size("t") - 1)
    big = docs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                left, right, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    c2 = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
        .localCheckpoint(eager=True)
    )
    uni = docs.select(F.explode("t").alias("w"))
    c1 = (
        uni.groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
        .localCheckpoint(eager=True)
    )
    tot = c1.agg(F.sum("c1").alias("nn"))
    ca = c1.select(F.col("w").alias("w1"), F.col("c1").alias("ca"))
    cb = c1.select(F.col("w").alias("w2"), F.col("c1").alias("cb"))
    p = (
        F.lit(_JM_LAMBDA) * F.col("c2") / F.col("ca")
        + F.lit(1 - _JM_LAMBDA) * F.col("cb") / F.col("nn")
    )
    return (
        big.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(ca), "w1")
        .join(F.broadcast(cb), "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 4).alias("avg_logp"),
        )
    )


_PPS_K = 100


@register(
    "sample_pps_systematic",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w
      FROM documents
    ),
    tot AS (SELECT (MAX(cum_w) + {_PPS_K} - 1) // {_PPS_K} AS step FROM w)
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
           CAST(cum_w AS BIGINT) AS cum_w
    FROM w, tot
    WHERE cum_w // step > (cum_w - n_chars) // step
    """,
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sampling: walk the
    cumulative weight line (weight = n_chars) in strides of
    step = ceil(W/k) and keep every document whose weight interval spans
    a stride boundary — each doc's inclusion probability is
    min(1, k*w/W), the exact PPS target, with zero randomness (the
    hash-deterministic sampling convention: identical samples on every
    engine, run, and cluster size — and unlike Poisson/priority PPS the
    sample size is exactly k for k <= n). Comparisons are pure integer
    arithmetic (cum // step), so no float can ulp-flip membership
    between engines.

    Scale shape: the cumulative weight comes from the two-phase
    distributed running total (range repartition + per-partition window
    + broadcast prefix offsets — never a single-partition global
    window), the stride constant derives from the checkpointed total
    (no second corpus pass), and the boundary test is map-side. ONE
    corpus scan end to end."""
    from sdg_data_catalog_spark.operators.curation import running_total

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    cum = running_total(docs, "doc_id", F.col("n_chars"), "cum_w")
    # total weight reads the running total's own checkpoint, not the corpus
    tot = cum.agg(
        F.expr(f"(MAX(cum_w) + {_PPS_K - 1}) DIV {_PPS_K}").alias("step")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(
            F.expr("cum_w DIV step") > F.expr("(cum_w - n_chars) DIV step")
        )
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.col("cum_w").cast("bigint").alias("cum_w"),
        )
    )
